"""Scan-surface parity tests (SURVEY.md §2.2): CSV w/ header inference,
gzipped CSV, JSONL, globbed .jsonl.gz — the formats the reference reads
(test/sql/faiss.test:11, examples/ai.py:7, go/benches_c.go:41,:82)."""

import gzip
import json
import os

from duckdb_faiss_ext_spark.sources.loaders import load_tables, read_csv, read_jsonl


def test_csv_header_inference(spark, tmp_path):
    p = str(tmp_path / "training.csv")
    with open(p, "w") as f:
        f.write("id,d0,d1\n1,0.5,1.5\n2,2.5,3.5\n")
    df = read_csv(spark, p)
    assert df.columns == ["id", "d0", "d1"]
    rows = {r["id"]: (r["d0"], r["d1"]) for r in df.collect()}
    assert rows[1] == (0.5, 1.5)
    assert dict(df.dtypes)["d0"] == "double"  # schema inferred


def test_gzipped_csv(spark, tmp_path):
    p = str(tmp_path / "tweets.csv.gz")
    with gzip.open(p, "wt") as f:
        f.write("tweet_id,text\n7,hello world\n")
    df = read_csv(spark, p)
    assert df.count() == 1 and df.first()["text"] == "hello world"


def test_jsonl_and_glob_gz(spark, tmp_path):
    d = tmp_path / "jsonl"
    os.makedirs(d)
    for i in range(2):
        with gzip.open(str(d / f"part{i}.jsonl.gz"), "wt") as f:
            for j in range(3):
                f.write(json.dumps({"qid": i * 3 + j, "vector": [0.1 * j, 1.0]}) + "\n")
    df = read_jsonl(spark, str(d / "*.jsonl.gz"))
    assert df.count() == 6
    assert set(df.columns) == {"qid", "vector"}
    assert df.filter("qid = 4").first()["vector"] == [0.1, 1.0]


def test_load_tables_registers_views(spark, sf_dir):
    tables = load_tables(spark, sf_dir)
    assert {"lineitem", "orders", "embeddings", "documents"} <= set(tables)
    assert spark.sql("SELECT COUNT(*) c FROM lineitem").first()["c"] > 0
    assert spark.table("embeddings").columns == ["vec_id", "embedding", "label"]


def test_values_inline_table_matches_duckdb(spark):
    """The retired q13_values contract row (faiss7.test:19-22), pinned here
    after its CORRECTNESS slot rotated to curation_signals (VERDICT r11
    task 3): an inline VALUES relation — Spark's createDataFrame / SQL
    VALUES — must match DuckDB's VALUES rows and types exactly."""
    import duckdb

    want = duckdb.connect().execute(
        "SELECT * FROM (VALUES (231, 1, 'x'), (232, 2, 'y')) v(id, doc, txt)"
    ).fetchall()
    got = [
        tuple(r)
        for r in spark.createDataFrame(
            [(231, 1, "x"), (232, 2, "y")], "id int, doc int, txt string"
        ).collect()
    ]
    got_sql = [
        tuple(r)
        for r in spark.sql(
            "SELECT * FROM VALUES (231, 1, 'x'), (232, 2, 'y') AS v(id, doc, txt)"
        ).collect()
    ]
    assert sorted(got) == sorted(want) == sorted(got_sql)


def test_unnest_explode_matches_duckdb(spark, sf_dir):
    """The retired q15_unnest contract row (faiss3.test:23 UNNEST), pinned
    here after its CORRECTNESS slot rotated to corpus_mix_exact (VERDICT
    r12 task 5): Spark explode over an inline array must produce exactly
    DuckDB's UNNEST rows on the same parquet."""
    import duckdb
    import pyspark.sql.functions as F

    want = sorted(
        duckdb.connect().execute(
            f"SELECT l_orderkey, l_linenumber, UNNEST([l_quantity, l_tax]) "
            f"AS v FROM read_parquet('{sf_dir}/lineitem.parquet') "
            f"WHERE l_orderkey < 50"
        ).fetchall()
    )
    got = sorted(
        tuple(r)
        for r in spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .filter(F.col("l_orderkey") < 50)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.explode(F.array("l_quantity", "l_tax")).alias("v"),
        )
        .collect()
    )
    assert got == want and len(got) > 0


def test_except_matches_duckdb(spark, sf_dir):
    """The retired q09_except contract row (ai.py:10 subtract), pinned here
    after its CORRECTNESS slot rotated to curation_union (VERDICT r13
    task 8): Spark subtract() == DuckDB EXCEPT (distinct set difference) on
    the same parquet.  A NON-empty difference is asserted via the reverse
    direction (orders customers minus a restricted customer set) so the pin
    cannot pass vacuously the way the old all-customers-have-orders slot
    did."""
    import duckdb
    import pyspark.sql.functions as F

    con = duckdb.connect()
    want = sorted(
        r[0]
        for r in con.execute(
            f"SELECT c_custkey FROM read_parquet('{sf_dir}/customer.parquet') "
            f"EXCEPT SELECT o_custkey FROM "
            f"read_parquet('{sf_dir}/orders.parquet')"
        ).fetchall()
    )
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").select("c_custkey")
    o = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    got = sorted(r[0] for r in c.subtract(o).collect())
    assert got == want
    # reverse, restricted direction: provably non-empty set difference
    want2 = sorted(
        r[0]
        for r in con.execute(
            f"SELECT o_custkey FROM read_parquet('{sf_dir}/orders.parquet') "
            f"EXCEPT SELECT c_custkey FROM "
            f"read_parquet('{sf_dir}/customer.parquet') WHERE c_custkey < 100"
        ).fetchall()
    )
    got2 = sorted(
        r[0]
        for r in o.subtract(c.filter(F.col("c_custkey") < 100)).collect()
    )
    assert got2 == want2 and len(got2) > 0
