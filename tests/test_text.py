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


# --------------------------------------------------- chunking / scrubbing (r10)


def test_chunk_text_coverage_and_overlap(spark):
    """Reassembling chunks (dropping each chunk's overlap prefix after the
    first) reproduces the document EXACTLY, for lengths around every
    boundary case."""
    import pyspark.sql.functions as F

    from duckdb_faiss_ext_spark.functions.text import chunk_text

    chunk_chars, overlap = 100, 20
    stride = chunk_chars - overlap
    docs = []
    for i, n in enumerate([1, 79, 80, 81, 100, 101, 179, 180, 181, 500, 1000]):
        docs.append((i, "".join(chr(97 + (j % 26)) for j in range(n))))
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    out = chunk_text(df, chunk_chars=chunk_chars, overlap=overlap).collect()
    by_doc: dict = {}
    for r in sorted(out, key=lambda r: (r["doc_id"], r["chunk_id"])):
        assert r["char_start"] == r["chunk_id"] * stride
        assert 1 <= len(r["chunk"]) <= chunk_chars
        cur = by_doc.setdefault(r["doc_id"], "")
        piece = r["chunk"] if r["chunk_id"] == 0 else r["chunk"][overlap:]
        assert cur[-overlap:] == r["chunk"][:overlap] or r["chunk_id"] == 0
        by_doc[r["doc_id"]] = cur + piece
    for i, text in docs:
        assert by_doc[i] == text, (i, len(text))


def test_chunk_spans_validation():
    import pytest as _pytest

    from duckdb_faiss_ext_spark.functions.text import chunk_spans

    with _pytest.raises(ValueError, match="overlap"):
        chunk_spans("text", chunk_chars=100, overlap=100)


def test_scrub_pii_and_count(spark):
    import pyspark.sql.functions as F

    from duckdb_faiss_ext_spark.functions.text import pii_count, scrub_pii

    rows = [
        (0, "contact bob.smith+spam@example.co.uk or call +1 (555) 123-4567"),
        (1, "server at 192.168.1.100 leaked ssn 123-45-6789"),
        (2, "card 4111 1111 1111 1111 expires soon"),
        (3, "no pii here, just the number 42 and v1.2.3"),
        # bare US shapes with NO country code (ADVICE r10: the mandatory
        # leading digit group silently skipped exactly these)
        (4, "call 555-123-4567 today"),
        (5, "office (555) 123-4567 x12"),
    ]
    df = spark.createDataFrame(rows, "i bigint, text string")
    got = {
        r["i"]: (r["s"], r["n"])
        for r in df.select(
            "i", scrub_pii("text").alias("s"), pii_count("text").alias("n")
        ).collect()
    }
    assert got[0][0] == "contact [EMAIL] or call [PHONE]"
    assert got[0][1] == 2
    assert got[1][0] == "server at [IP] leaked ssn [SSN]"
    assert got[1][1] == 2
    assert got[2][0] == "card [CARD] expires soon"
    assert got[2][1] == 1
    assert got[3][0] == rows[3][1] and got[3][1] == 0  # untouched
    assert got[4][0] == "call [PHONE] today"
    assert got[4][1] == 1
    assert got[5][0] == "office [PHONE] x12"
    assert got[5][1] == 1


def test_chunk_text_null_text_keeps_doc_id(spark):
    from duckdb_faiss_ext_spark.functions.text import chunk_text

    df = spark.createDataFrame(
        [(0, "hello world"), (1, None), (2, "")],
        "doc_id bigint, text string",
    )
    out = chunk_text(df, chunk_chars=8, overlap=2).collect()
    ids = sorted({r["doc_id"] for r in out})
    assert ids == [0, 1, 2]  # null-text doc survives (explode_outer)
    null_rows = [r for r in out if r["doc_id"] == 1]
    assert len(null_rows) == 1 and null_rows[0]["chunk"] is None
    empty_rows = [r for r in out if r["doc_id"] == 2]
    assert len(empty_rows) == 1 and empty_rows[0]["chunk"] == ""


def test_chunk_text_matches_duckdb_oracle(spark, sf_dir):
    """Cross-engine check (VERDICT r10 task 8): chunk_text's window
    arithmetic has an exact ANSI-SQL twin (substr arithmetic + a series
    join).  Run both over the real documents table and compare the full
    row multisets.  NULL-text behavior is pinned separately
    (test_chunk_text_null_text_keeps_doc_id) — DuckDB's lateral join
    drops NULL-length docs, so the oracle covers non-null texts."""
    import duckdb

    from duckdb_faiss_ext_spark.functions.text import chunk_text

    chunk_chars, overlap = 64, 16
    stride = chunk_chars - overlap
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter("text IS NOT NULL")
        .select("doc_id", "text")
    )
    got = sorted(
        (r["doc_id"], r["chunk_id"], r["char_start"], r["chunk"])
        for r in chunk_text(
            docs, chunk_chars=chunk_chars, overlap=overlap
        ).collect()
    )
    con = duckdb.connect()
    # this DuckDB build rejects lateral column params in generate_series,
    # so the series is static (0..max chunks over the corpus) and each doc
    # keeps the prefix its length implies — same rows, join-then-filter
    max_i = con.execute(
        f"""
        SELECT max(greatest(1, CAST(ceil((length(text) - {overlap})
                                         / {stride}.0) AS INT))) - 1
        FROM read_parquet('{sf_dir}/documents.parquet')
        WHERE text IS NOT NULL
        """
    ).fetchone()[0]
    want = sorted(
        tuple(t)
        for t in con.execute(
            f"""
            SELECT d.doc_id,
                   CAST(g.i AS INT) AS chunk_id,
                   CAST(g.i * {stride} AS INT) AS char_start,
                   substr(d.text, CAST(g.i * {stride} AS INT) + 1,
                          {chunk_chars}) AS chunk
            FROM read_parquet('{sf_dir}/documents.parquet') d
            JOIN generate_series(0, {max_i}) AS g(i)
              ON g.i < greatest(1, CAST(ceil((length(d.text) - {overlap})
                                             / {stride}.0) AS INT))
            WHERE d.text IS NOT NULL
            """
        ).fetchall()
    )
    assert got == want, (len(got), len(want), got[:2], want[:2])


def test_scrub_pii_matches_python_re(spark, sf_dir):
    """Cross-engine check: the five PII patterns produce the same
    redactions under java.util.regex (Spark codegen) and Python re —
    guards against engine-specific regex semantics (lookbehind, class
    ranges) silently diverging.  Corpus = real document texts with PII
    shapes injected at deterministic offsets."""
    import re

    from duckdb_faiss_ext_spark.functions.text import PII_PATTERNS, scrub_pii

    texts = [
        r["text"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter("text IS NOT NULL")
        .limit(40)
        .collect()
    ]
    inject = [
        "mail me at jo.doe+x@corp.io",
        "call 555-123-4567",
        "or +44 20 7946 0958",
        "host 10.0.42.7",
        "ssn 987-65-4320",
        "card 4111-1111-1111-1111",
    ]
    rows = [
        (i, f"{t[: (7 * i) % 40]} {inject[i % len(inject)]} {t[:60]}")
        for i, t in enumerate(texts)
    ]
    df = spark.createDataFrame(rows, "i bigint, text string")
    got = {
        r["i"]: r["s"]
        for r in df.select("i", scrub_pii("text").alias("s")).collect()
    }

    def py_scrub(s: str) -> str:
        for name, pat in PII_PATTERNS:
            s = re.sub(pat, f"[{name}]", s)
        return s

    for i, t in rows:
        assert got[i] == py_scrub(t), (i, t, got[i], py_scrub(t))


def test_vocab_stats_matches_duckdb_oracle(spark, sf_dir):
    """Cross-engine check: vocab_stats (term_freq + doc_freq over
    lowercased alnum tokens) vs the identical DuckDB formulation on the
    real documents table."""
    import duckdb

    from duckdb_faiss_ext_spark.functions.text import vocab_stats

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    got = sorted(
        (r["token"], r["term_freq"], r["doc_freq"])
        for r in vocab_stats(docs, min_count=2).collect()
    )
    con = duckdb.connect()
    want = sorted(
        tuple(t)
        for t in con.execute(
            f"""
            WITH toks AS (
              SELECT d.doc_id, t.token
              FROM read_parquet('{sf_dir}/documents.parquet') d,
                   unnest(regexp_extract_all(lower(d.text), '[a-z0-9]+'))
                     AS t(token)
            )
            SELECT token,
                   count(*) AS term_freq,
                   count(DISTINCT doc_id) AS doc_freq
            FROM toks GROUP BY token HAVING count(*) >= 2
            """
        ).fetchall()
    )
    assert got == want, (len(got), len(want), got[:3], want[:3])
    # sanity: doc_freq never exceeds term_freq, and a known-common token
    # (driver synth text is english-ish) appears
    assert all(d <= t for _, t, d in got)


def test_phone_pattern_r11_regressions(spark):
    """r11 review: the international alternative must not redact short
    '+N NN NN' non-phones (diffs, scores, coordinates) and must not fire
    mid-expression; real international shapes with >= 3 separated groups
    still redact."""
    from duckdb_faiss_ext_spark.functions.text import scrub_pii

    rows = [
        (0, "diff +1 23 45 applied"),          # 2 groups: NOT a phone
        (1, "offset +20 30 40 in the grid"),   # 2 groups: NOT a phone
        (2, "x = 5+1 23 45 67"),               # mid-expression +: untouched
        (3, "call +44 20 7946 0958 now"),      # 3 groups: phone
        (4, "ou +33 1 42 68 53 01 merci"),     # 5 groups: phone
        (5, "compact date 20260815 stays"),    # 8 digits: untouched
    ]
    df = spark.createDataFrame(rows, "i bigint, text string")
    got = {
        r["i"]: r["s"]
        for r in df.select("i", scrub_pii("text").alias("s")).collect()
    }
    assert got[0] == rows[0][1]
    assert got[1] == rows[1][1]
    assert got[2] == rows[2][1]
    assert got[3] == "call [PHONE] now"
    assert got[4] == "ou [PHONE] merci"
    assert got[5] == rows[5][1]


def test_phone_min_total_digits_r12(spark):
    """ADVICE r12: the international alternative's {1,4} groups allowed
    4-total-digit strings like '+1 2 3 4' to redact; a >=8-total-digit
    lookahead restores the floor without losing real phones."""
    from duckdb_faiss_ext_spark.functions.text import scrub_pii

    rows = [
        (0, "sum +1 2 3 4 done"),            # 4 digits: NOT a phone
        (1, "vec +1 2 3 4 5 6 here"),        # 6 digits: NOT a phone
        (2, "call +44 20 7946 0958 now"),    # 12 digits: phone
        (3, "ou +33 1 42 68 53 01 merci"),   # 11 digits: phone
        (4, "tel +7 495 123 4567 ok"),       # 11 digits: phone
    ]
    df = spark.createDataFrame(rows, "i bigint, text string")
    got = {
        r["i"]: r["s"]
        for r in df.select("i", scrub_pii("text").alias("s")).collect()
    }
    assert got[0] == rows[0][1]
    assert got[1] == rows[1][1]
    assert got[2] == "call [PHONE] now"
    assert got[3] == "ou [PHONE] merci"
    assert got[4] == "tel [PHONE] ok"
