import pytest
import pyspark.sql.functions as F

from duckdb_faiss_ext_spark.functions import text as T


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "The cat and the dog, together!"),
        (2, "el perro y la casa de los gatos"),
        (3, "der Hund und die Katze ist ein Tier"),
        (4, "le chat et les chiens est des animaux"),
        (5, "这是中文文本 with some latin"),
        (6, "zzz qqq xxx"),
        (7, "  spaced   out  text  "),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _one(docs, col, doc_id):
    return docs.filter(F.col("doc_id") == doc_id).select(col.alias("v")).first()["v"]


def test_token_counts(docs):
    assert _one(docs, T.token_count("text"), 1) == 6
    assert _one(docs, T.token_count("text"), 7) == 3  # trim + collapse
    assert _one(docs, T.regex_token_count("text"), 1) == 6
    assert _one(docs, T.char_count("text"), 6) == 11


def test_punct_count(docs):
    assert _one(docs, T.punct_count("text"), 1) == 2  # comma + bang


def test_lang_id(docs):
    got = {r["doc_id"]: r["v"] for r in docs.select("doc_id", T.lang_id("text").alias("v")).collect()}
    assert got[1] == "en"
    assert got[2] == "es"
    assert got[3] == "de"
    assert got[4] == "fr"
    assert got[5] == "zh"
    assert got[6] == "und"


def test_quality_score_bounds(docs):
    vals = [r["v"] for r in docs.select(T.quality_score("text").alias("v")).collect()]
    assert all(0.0 <= v <= 1.0 for v in vals)
    # natural English text should beat consonant noise
    q = {r["doc_id"]: r["v"] for r in docs.select("doc_id", T.quality_score("text").alias("v")).collect()}
    assert q[1] > q[6]


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [(1, "Hello   World"), (2, "hello world"), (3, " HELLO  WORLD ")],
        "doc_id bigint, text string",
    )
    fps = [r["v"] for r in df.select(T.fingerprint("text").alias("v")).collect()]
    assert len(set(fps)) == 1  # case/whitespace-insensitive


def test_min_shingle_fingerprint_stability(spark):
    base = "a b c d e f g h i j k l m n o p"
    edited = base + " q"  # local edit far from the minimizing shingle usually
    df = spark.createDataFrame(
        [(1, base), (2, base), (3, "totally different words here ok")],
        "doc_id bigint, text string",
    )
    fps = {r["doc_id"]: r["v"] for r in df.select("doc_id", T.min_shingle_fingerprint("text").alias("v")).collect()}
    assert fps[1] == fps[2]
    assert fps[1] != fps[3]
