"""SQL DDL/DML surface (SURVEY.md §2.2 scans/sinks): CREATE TABLE AS,
INSERT INTO, temp views, plus the skew-salted join equivalence."""

import pyspark.sql.functions as F

from duckdb_faiss_ext_spark.operators.skew import salted_join


def test_ctas_and_insert_into(spark, tmp_path):
    loc = str(tmp_path / "tbl")
    spark.sql("DROP TABLE IF EXISTS t_demo")
    # CREATE TABLE AS (faiss2.test:11 'create table vectors as SELECT ...')
    spark.sql(
        f"CREATE TABLE t_demo USING parquet LOCATION '{loc}' AS "
        "SELECT id, id * 2 AS v FROM range(0, 10)"
    )
    assert spark.sql("SELECT COUNT(*) c FROM t_demo").first()["c"] == 10
    # INSERT INTO (faiss7.test:19)
    spark.sql("INSERT INTO t_demo VALUES (100, 200), (101, 202)")
    assert spark.sql("SELECT COUNT(*) c FROM t_demo").first()["c"] == 12
    assert spark.sql("SELECT v FROM t_demo WHERE id = 100").first()["v"] == 200
    spark.sql("DROP TABLE t_demo")


def test_temp_view_sql_round_trip(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/orders.parquet")
    df.createOrReplaceTempView("v_orders")
    n_sql = spark.sql("SELECT COUNT(*) c FROM v_orders").first()["c"]
    assert n_sql == df.count()


def test_salted_join_equivalence(spark):
    """Salted join must produce exactly the plain join's rows — including a
    pathological 90%-hot key."""
    big = spark.createDataFrame(
        [(1 if i < 900 else i % 10, i) for i in range(1000)], "k int, payload int"
    )
    small = spark.createDataFrame([(i, f"dim{i}") for i in range(10)], "k int, name string")
    plain = big.join(small, "k").select("k", "payload", "name")
    salted = salted_join(big, small, "k", salt=8).select("k", "payload", "name")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_ivf_save_load_roundtrip(spark, tmp_path):
    """IVF centroids survive persistence; loaded index searches identically."""
    import numpy as np

    from duckdb_faiss_ext_spark import FaissSparkEngine

    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((200, 8)).astype(np.float32)
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    eng = FaissSparkEngine(spark)
    eng.create("ivf_rt", 8, "IDMap,IVF4,Flat", metric_type="L2")
    eng.add("ivf_rt", spark.createDataFrame(rows, "label bigint, vector array<float>"))
    q = spark.createDataFrame(rows[:5], "qid bigint, vector array<float>")
    before = [tuple(r) for r in eng.search_flat("ivf_rt", 3, q, params={"nprobe": 4}).orderBy("qid", "rank").collect()]
    path = str(tmp_path / "ivf_idx")
    eng.save("ivf_rt", path)
    eng.destroy("ivf_rt")
    eng.load("ivf_rt", path)
    idx = eng.registry.get("ivf_rt")
    assert idx.centroids is not None and idx.centroids.shape == (4, 8)
    after = [tuple(r) for r in eng.search_flat("ivf_rt", 3, q, params={"nprobe": 4}).orderBy("qid", "rank").collect()]
    assert before == after
