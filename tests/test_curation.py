"""Curation-op tests (r11): Gopher repetition signals, n-gram
contamination, and the one-pass curate_text policy operator — handcrafted
pins plus full cross-engine DuckDB oracles on the real documents table
(the contract pattern of test_text.py's vocab/chunk checks)."""

import duckdb
import pytest
import pyspark.sql.functions as F

from duckdb_faiss_ext_spark.functions.curation import (
    TextPolicy,
    curate_text,
    ngram_contamination,
    repetition_signals,
)


@pytest.fixture(scope="module")
def rep_docs(spark):
    rows = [
        (0, "a b a b a b"),
        (1, "x\ny\nx\nzz zz"),
        (2, "the quick brown fox jumps over the lazy dog near the river bank today"),
        (3, None),
        (4, "w1 w2 w3 w4 w5 w1 w2 w3 w4 w5 w1 w2 w3 w4 w5 tail"),
        (5, ""),
        (6, "short"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


@pytest.mark.parametrize("impl", ["arrow", "sql"])
def test_repetition_signals_handcrafted(rep_docs, impl):
    got = {
        r["doc_id"]: r.asDict()
        for r in repetition_signals(
            rep_docs, top_ns=(2,), dup_ns=(5,), impl=impl
        ).collect()
    }
    # doc 0: "a b" occurs 3x, 3 chars each -> 9/11
    assert got[0]["top_2gram_char_frac"] == pytest.approx(9 / 11)
    assert got[0]["dup_5gram_char_frac"] == 0.0  # both 5-grams unique
    # doc 1: 4 non-empty lines, 'x' repeated once -> 1/4; chars 8, dup 1
    assert got[1]["n_lines"] == 4
    assert got[1]["dup_line_frac"] == pytest.approx(0.25)
    assert got[1]["dup_line_char_frac"] == pytest.approx(1 / 8)
    # all-count-1 2-grams tie-break toward larger coverage: "zz zz" (5)
    assert got[1]["top_2gram_char_frac"] == pytest.approx(5 / 11)
    # doc 4: heavy 5-gram repetition -> coverage above 1 (documented)
    assert got[4]["dup_5gram_char_frac"] > 1.0
    # NULL / empty / sub-n docs survive with zeroed signals
    for d in (3, 5, 6):
        assert got[d]["top_2gram_char_frac"] == 0.0
        assert got[d]["dup_5gram_char_frac"] == 0.0
    assert got[3]["n_chars"] == 0 and got[3]["n_lines"] == 0
    # blank-only lines are not lines
    assert got[5]["n_lines"] == 0


def test_repetition_signals_validation(rep_docs):
    with pytest.raises(ValueError, match="n must be"):
        repetition_signals(rep_docs, top_ns=(0,))


def _max_toks(con, parquet: str) -> int:
    """generate_series only accepts CONSTANT bounds in this DuckDB build
    (no lateral params, no subqueries), so the series length is computed
    up front and inlined — join-then-filter keeps the row sets exact."""
    return con.execute(
        f"""
        SELECT coalesce(max(len(regexp_extract_all(
                   lower(coalesce(text, '')), '[a-z0-9]+'))), 1)
        FROM read_parquet('{parquet}')
        """
    ).fetchone()[0]


def _rep_oracle_sql(parquet: str, top_ns, dup_ns, max_toks: int):
    """The exact DuckDB twin of repetition_signals (series join instead of
    lateral generate_series params — this build rejects those)."""
    all_ns = sorted(set(top_ns) | set(dup_ns))
    n_values = ", ".join(f"({n})" for n in all_ns)
    top_cols = ", ".join(
        f"coalesce(max(CASE WHEN c.n = {n} THEN {{'cnt': c.cnt, 'cov': c.cov}} END).cov"
        f" / greatest(b.n_chars, 1), 0.0) AS top_{n}gram_char_frac"
        for n in top_ns
    )
    dup_cols = ", ".join(
        f"coalesce(sum(CASE WHEN c.n = {n} AND c.cnt > 1 THEN c.cov END)"
        f" / greatest(b.n_chars, 1), 0.0) AS dup_{n}gram_char_frac"
        for n in dup_ns
    )
    return f"""
    WITH base AS (
      SELECT doc_id,
             coalesce(length(text), 0) AS n_chars,
             list_filter(string_split(coalesce(text, ''), chr(10)),
                         l -> length(trim(l)) > 0) AS lines,
             regexp_extract_all(lower(coalesce(text, '')), '[a-z0-9]+') AS t
      FROM read_parquet('{parquet}')
    ),
    linesig AS (
      SELECT doc_id, n_chars,
             len(lines) AS n_lines,
             (len(lines) - len(list_distinct(lines)))
               / greatest(len(lines), 1)::DOUBLE AS dup_line_frac,
             (coalesce(list_sum(list_transform(lines, l -> length(l))), 0)
              - coalesce(list_sum(list_transform(list_distinct(lines),
                                                 l -> length(l))), 0))
               / greatest(coalesce(list_sum(list_transform(lines,
                                            l -> length(l))), 0), 1)::DOUBLE
               AS dup_line_char_frac,
             t
      FROM base
    ),
    grams AS (
      SELECT b.doc_id, nv.n,
             array_to_string(b.t[g.i : g.i + nv.n - 1], ' ') AS gram
      FROM linesig b
      JOIN (VALUES {n_values}) nv(n) ON len(b.t) >= nv.n
      JOIN generate_series(1, {max_toks}) g(i)
        ON g.i <= len(b.t) - nv.n + 1
    ),
    counted AS (
      SELECT doc_id, n, gram, count(*) AS cnt,
             count(*) * length(gram) AS cov
      FROM grams GROUP BY doc_id, n, gram
    )
    SELECT b.doc_id, b.n_chars, b.n_lines, b.dup_line_frac,
           b.dup_line_char_frac, {top_cols}, {dup_cols}
    FROM linesig b LEFT JOIN counted c USING (doc_id)
    GROUP BY b.doc_id, b.n_chars, b.n_lines, b.dup_line_frac,
             b.dup_line_char_frac
    """


@pytest.mark.parametrize("impl", ["arrow", "sql"])
def test_repetition_signals_matches_duckdb_oracle(spark, sf_dir, impl):
    """Full cross-engine check on the real documents table: every signal
    column, every row, exact to 1e-12 — BOTH implementations (the Arrow
    kernel and the pure-SQL fold) against the same DuckDB formulation,
    which also pins them equal to each other."""
    top_ns, dup_ns = (2, 3), (5, 8)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    cols = (
        ["doc_id", "n_chars", "n_lines", "dup_line_frac", "dup_line_char_frac"]
        + [f"top_{n}gram_char_frac" for n in top_ns]
        + [f"dup_{n}gram_char_frac" for n in dup_ns]
    )
    got = sorted(
        tuple(r[c] for c in cols)
        for r in repetition_signals(
            docs, top_ns=top_ns, dup_ns=dup_ns, impl=impl
        ).collect()
    )
    con = duckdb.connect()
    parquet = f"{sf_dir}/documents.parquet"
    want = sorted(
        tuple(t)
        for t in con.execute(
            _rep_oracle_sql(parquet, top_ns, dup_ns, _max_toks(con, parquet))
        ).fetchall()
    )
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g[:3] == w[:3], (g, w)
        for gv, wv in zip(g[3:], w[3:]):
            assert gv == pytest.approx(wv, abs=1e-12), (g, w)


@pytest.mark.parametrize("impl", ["arrow", "join"])
def test_ngram_contamination_handcrafted(spark, impl):
    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon zeta"),   # 2 distinct 5-grams
            (1, "alpha beta gamma delta epsilon"),        # the eval text itself
            (2, "unrelated words entirely here now ok"),
            (3, "too short"),
            (4, None),
        ],
        "doc_id bigint, text string",
    )
    ev = spark.createDataFrame(
        [(0, "ALPHA beta gamma, delta epsilon!")], "i bigint, text string"
    )  # normalization: case/punct-insensitive
    got = {
        r["doc_id"]: r.asDict()
        for r in ngram_contamination(docs, ev, n=5, impl=impl).collect()
    }
    assert got[0]["n_grams"] == 2 and got[0]["n_contaminated"] == 1
    assert got[0]["contam_frac"] == pytest.approx(0.5)
    assert got[0]["is_contaminated"] is True
    assert got[1]["n_contaminated"] == 1 and got[1]["is_contaminated"] is True
    assert got[2]["n_contaminated"] == 0 and got[2]["is_contaminated"] is False
    assert got[3]["n_grams"] == 0 and got[3]["is_contaminated"] is False
    assert got[4]["n_grams"] == 0 and got[4]["is_contaminated"] is False


@pytest.mark.parametrize("impl", ["arrow", "join"])
def test_ngram_contamination_matches_duckdb_oracle(spark, sf_dir, impl):
    """Eval set = 40 real document texts (so collisions actually occur);
    corpus = the full documents table.  n=8 keeps gram counts meaningful
    on the synthetic corpus' doc lengths."""
    n = 8
    parquet = f"{sf_dir}/documents.parquet"
    docs = spark.read.parquet(parquet).select("doc_id", "text")
    ev = spark.read.parquet(parquet).filter("doc_id % 13 = 0").select("text")
    got = sorted(
        (
            r["doc_id"],
            r["n_grams"],
            r["n_contaminated"],
            r["is_contaminated"],
        )
        for r in ngram_contamination(docs, ev, n=n, impl=impl).collect()
    )
    con = duckdb.connect()
    max_toks = _max_toks(con, parquet)
    want = sorted(
        tuple(t)
        for t in con.execute(
            f"""
        WITH base AS (
          SELECT doc_id,
                 regexp_extract_all(lower(coalesce(text, '')),
                                    '[a-z0-9]+') AS t
          FROM read_parquet('{parquet}')
        ),
        doc_grams AS (
          SELECT b.doc_id,
                 array_to_string(b.t[g.i : g.i + {n} - 1], ' ') AS gram
          FROM base b
          JOIN generate_series(1, {max_toks}) g(i)
            ON g.i <= len(b.t) - {n} + 1
          GROUP BY b.doc_id, gram
        ),
        eval_grams AS (
          SELECT DISTINCT gram FROM doc_grams
          WHERE doc_id % 13 = 0
        ),
        counts AS (
          SELECT d.doc_id,
                 count(*) AS n_grams,
                 count(e.gram) AS n_contaminated
          FROM doc_grams d LEFT JOIN eval_grams e USING (gram)
          GROUP BY d.doc_id
        )
        SELECT b.doc_id,
               coalesce(c.n_grams, 0) AS n_grams,
               coalesce(c.n_contaminated, 0) AS n_contaminated,
               coalesce(c.n_contaminated, 0) > 0 AS is_contaminated
        FROM base b LEFT JOIN counts c USING (doc_id)
        """
        ).fetchall()
    )
    assert got == want, (len(got), len(want), got[:3], want[:3])
    assert any(r[3] for r in got)  # the eval subset collides with itself


def test_curate_text_statuses(spark):
    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog and runs on"),
            (1, "tiny"),
            (2, None),
            (3, "spam spam spam spam spam spam spam spam spam spam"),
            (4, "reach me at bob@example.com or bob2@example.com or b3@ex.io"),
        ],
        "doc_id bigint, text string",
    )
    pol = TextPolicy(
        min_tokens=3,
        max_pii_count=2,
        max_top_ngram_frac={2: 0.20},
        max_dup_ngram_frac={5: 0.15},
    )
    got = {r["doc_id"]: r["status"] for r in curate_text(docs, pol).collect()}
    assert got[0] == "kept"
    assert got[1] == "filtered:min_tokens"
    assert got[2] == "filtered:null_text"
    # first-failing-rule order: top-2-gram fires before dup-5-gram
    assert got[3] == "filtered:max_top_2gram_frac"
    assert got[4] == "filtered:max_pii_count"
    # every input row is present exactly once
    assert sorted(got) == [0, 1, 2, 3, 4]


def test_curate_text_disabled_policy_keeps_everything(spark):
    docs = spark.createDataFrame(
        [(0, "x"), (1, "y y y y y y y y")], "doc_id bigint, text string"
    )
    pol = TextPolicy(
        min_tokens=None,
        max_dup_line_frac=None,
        max_dup_line_char_frac=None,
        max_top_ngram_frac={},
        max_dup_ngram_frac={},
    )
    out = curate_text(docs, pol)
    assert [r["status"] for r in out.collect()] == ["kept", "kept"]
    # n-gram columns are not computed when nothing caps them
    assert not any("gram_char_frac" in c for c in out.columns)


def test_curate_text_matches_duckdb_oracle(spark, sf_dir):
    """End-to-end policy disposition cross-check on the real documents
    table: the DuckDB twin recomputes the same signals (token/char counts,
    lang-id, quality, PII count, repetition) and the same first-failing
    CASE chain; statuses must match row-for-row.  Thresholds are set so
    the corpus splits into several disposition classes (asserted), not
    one degenerate bucket."""
    parquet = f"{sf_dir}/documents.parquet"
    pol = TextPolicy(
        min_tokens=15,
        allowed_langs=("en", "und"),
        min_quality=0.35,
        max_pii_count=0,
        max_dup_line_frac=0.30,
        max_dup_line_char_frac=0.20,
        max_top_ngram_frac={2: 0.08},
        max_dup_ngram_frac={5: 0.30},
    )
    docs = spark.read.parquet(parquet).select("doc_id", "text")
    got = sorted(
        (r["doc_id"], r["status"]) for r in curate_text(docs, pol).collect()
    )

    stop = {
        "en": ["the", "a", "and", "of", "to", "is"],
        "es": ["el", "la", "y", "de", "que", "los"],
        "de": ["der", "die", "das", "und", "ist", "ein"],
        "fr": ["le", "la", "et", "les", "des", "est"],
    }

    def stop_expr(lang):
        lst = ", ".join(f"'{w}'" for w in stop[lang])
        return (
            "len(list_filter(string_split_regex(trim(lower(coalesce(text,''))),"
            f" '\\s+'), w -> w IN ({lst})))"
        )

    langs = ["en", "es", "de", "fr"]
    lang_case = "CASE WHEN length(regexp_replace(coalesce(text,''), '[^一-鿿]', '', 'g')) > 0 THEN 'zh' "
    for lang in langs:
        conds = [f"{stop_expr(lang)} > 0"]
        for other in langs:
            if other == lang:
                continue
            op = "<" if langs.index(other) < langs.index(lang) else "<="
            conds.append(f"{stop_expr(other)} {op} {stop_expr(lang)}")
        lang_case += f"WHEN {' AND '.join(conds)} THEN '{lang}' "
    lang_case += "ELSE 'und' END"

    con = duckdb.connect()
    rep = _rep_oracle_sql(parquet, (2,), (5,), _max_toks(con, parquet))
    # The PHONE pattern's lookbehind is java.util.regex / Python re syntax
    # that DuckDB's RE2 rejects, so n_pii comes from a THIRD engine:
    # Python re replicating pii_count's exact semantics (pattern i counted
    # on text already scrubbed by patterns < i).  Python re ≡ Spark regex
    # for these patterns is pinned separately by
    # test_scrub_pii_matches_python_re.
    import re as _re

    import pandas as _pd

    from duckdb_faiss_ext_spark.functions.text import PII_PATTERNS

    def py_pii_count(s):
        if s is None:
            return None
        total = 0
        for name, pat in PII_PATTERNS:
            total += len(_re.findall(pat, s))
            s = _re.sub(pat, f"[{name}]", s)
        return total

    raw = con.execute(
        f"SELECT doc_id, text FROM read_parquet('{parquet}')"
    ).fetchall()
    pii_pdf = _pd.DataFrame(
        {"doc_id": [r[0] for r in raw],
         "n_pii": [py_pii_count(r[1]) for r in raw]}
    )
    con.register("pii", pii_pdf)
    want = sorted(
        tuple(t)
        for t in con.execute(
            f"""
        WITH rep AS ({rep}),
        sig AS (
          SELECT d.doc_id,
                 CASE WHEN trim(coalesce(d.text,'')) = '' THEN 1
                      ELSE len(string_split_regex(trim(d.text), '\\s+'))
                 END AS n_tokens,
                 length(d.text) AS n_chars,
                 {lang_case} AS lang,
                 0.5 * least(length(coalesce(d.text,'')) / 500.0, 1.0)
                 + 0.3 * (1.0 - least(
                     length(regexp_replace(coalesce(d.text,''),
                                           '[A-Za-z0-9\\s]', '', 'g'))
                     / greatest(CASE WHEN trim(coalesce(d.text,'')) = ''
                                     THEN 1
                                     ELSE len(string_split_regex(
                                              trim(d.text), '\\s+')) END,
                                1)::DOUBLE, 1.0))
                 + 0.2 * least({stop_expr('en')}
                     / greatest(CASE WHEN trim(coalesce(d.text,'')) = ''
                                     THEN 1
                                     ELSE len(string_split_regex(
                                              trim(d.text), '\\s+')) END,
                                1)::DOUBLE * 5.0, 1.0) AS quality,
                 p.n_pii AS n_pii,
                 d.text IS NULL AS null_text
          FROM read_parquet('{parquet}') d JOIN pii p USING (doc_id)
        )
        SELECT s.doc_id,
               CASE
                 WHEN s.null_text THEN 'filtered:null_text'
                 WHEN s.n_tokens < 15 THEN 'filtered:min_tokens'
                 WHEN s.lang NOT IN ('en', 'und') THEN 'filtered:allowed_langs'
                 WHEN s.quality < 0.35 THEN 'filtered:min_quality'
                 WHEN s.n_pii > 0 THEN 'filtered:max_pii_count'
                 WHEN r.dup_line_frac > 0.30 THEN 'filtered:max_dup_line_frac'
                 WHEN r.dup_line_char_frac > 0.20
                   THEN 'filtered:max_dup_line_char_frac'
                 WHEN r.top_2gram_char_frac > 0.08
                   THEN 'filtered:max_top_2gram_frac'
                 WHEN r.dup_5gram_char_frac > 0.30
                   THEN 'filtered:max_dup_5gram_frac'
                 ELSE 'kept'
               END AS status
        FROM sig s JOIN rep r USING (doc_id)
        """
        ).fetchall()
    )
    assert got == want, (
        len(got),
        len(want),
        [p for p in zip(got, want) if p[0] != p[1]][:4],
    )
    classes = {s for _, s in got}
    assert "kept" in classes and len(classes) >= 3, classes


@pytest.mark.parametrize("impl", ["arrow", "sql"])
def test_curate_text_plan_is_a_zero_shuffle_narrow_map(spark, rep_docs, impl):
    """The whole signal vector — including every repetition signal — is
    per-row: no Exchange and no Join anywhere in the plan, under BOTH
    impls.  The repetition statistics are per-document facts; the r11
    rewrite keeps them inside the row (Arrow kernel or sort_array +
    run-length fold), so curate_text pipelines into whatever consumes it
    with zero data movement.  The sql impl additionally has no Python
    anywhere; the arrow impl's single Python node is the Arrow-batched
    mapInPandas kernel, never row-at-a-time BatchEvalPython."""
    out = curate_text(rep_docs, TextPolicy(), impl=impl)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan
    if impl == "sql":
        assert "Python" not in plan and "Arrow" not in plan
    else:
        assert plan.count("MapInPandas") == 1


def test_text_curation_example_pipeline(spark, sf_dir):
    """examples/text_curation.py end-to-end: curate -> decontaminate ->
    scrub -> vocab -> chunk over the real documents table.  The demo eval
    set is a corpus slice, so the decontamination stage must fire."""
    from examples.text_curation import run_pipeline

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    ev = docs.filter("doc_id % 97 = 0").select("text")
    full = spark.read.parquet(f"{sf_dir}/documents.parquet")
    stats = run_pipeline(
        docs, ev, source_df=full.select("doc_id", "source"), token_budget=2000
    )
    assert stats["docs_in"] == 500
    assert 0 < stats["docs_kept"] <= 500
    assert sum(stats["statuses"].values()) == 500
    # every eval doc that SURVIVED the policy stage must self-collide;
    # eval docs the policy already filtered can't (they never reach
    # decontamination)
    assert stats["contam_dropped"] > 0
    assert stats["contam_dropped"] <= stats["statuses"].get("kept", 0)
    assert stats["docs_kept"] == (
        stats["statuses"].get("kept", 0) - stats["contam_dropped"]
    )
    assert stats["vocab_size"] > 0
    # the mix stage subsamples before chunking, so compare against the
    # mixed doc count implied by the chunk rows themselves
    assert stats["chunks"] > 0 and stats["packs"] and stats["packs"] > 0
    assert stats["mix_rates"] and all(0 <= v <= 1 for v in stats["mix_rates"].values())


def test_ngram_contamination_eval_cap_is_loud(spark):
    docs = spark.createDataFrame(
        [(0, "a b c d e f g h")], "doc_id bigint, text string"
    )
    ev = spark.createDataFrame(
        [(i, f"w{i} x{i} y{i} z{i}") for i in range(8)],
        "i bigint, text string",
    )
    with pytest.raises(ValueError, match="max_eval_grams"):
        ngram_contamination(docs, ev, n=2, max_eval_grams=5)


def test_mix_rates_budget_math(spark, sf_dir):
    from duckdb_faiss_ext_spark.functions.curation import mix_rates

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rates = mix_rates(
        docs,
        {"src0": 10, "src1": 10_000, "nosuch": 5},
        size_col="n_chars",
    )
    con = duckdb.connect()
    cur = dict(
        con.execute(
            f"""SELECT source, sum(n_chars)
                FROM read_parquet('{sf_dir}/documents.parquet')
                GROUP BY source"""
        ).fetchall()
    )
    assert rates["src0"] == pytest.approx(min(1.0, 10 / cur["src0"]))
    assert rates["src1"] == pytest.approx(min(1.0, 10_000 / cur["src1"]))
    assert rates["nosuch"] == 1.0       # target names an absent source
    assert rates["src2"] == 0.0         # source missing from the mix


def test_sample_corpus_mix_matches_duckdb_and_is_reproducible(spark, sf_dir):
    """The sampling decision is a pure function of (seed, id, rate):
    exact row-set equality with the ANSI-SQL twin, superset property
    under a raised rate, and seed independence."""
    from duckdb_faiss_ext_spark.functions.curation import sample_corpus_mix

    parquet = f"{sf_dir}/documents.parquet"
    docs = spark.read.parquet(parquet)
    rates = {"src0": 1.0, "src1": 0.5, "src2": 0.25, "src3": 0.0}
    got = sorted(
        r["doc_id"] for r in sample_corpus_mix(docs, rates, seed=7).collect()
    )
    con = duckdb.connect()
    case = "CASE source " + " ".join(
        f"WHEN '{s}' THEN {r}" for s, r in rates.items()
    ) + " ELSE 0.0 END"
    want = sorted(
        t[0]
        for t in con.execute(
            f"""
            SELECT doc_id FROM read_parquet('{parquet}')
            WHERE ('0x' || substr(md5('7:' || CAST(doc_id AS VARCHAR)), 1, 8)
                  )::BIGINT / 4294967296.0 < {case}
            """
        ).fetchall()
    )
    assert got == want and len(got) > 0
    # src0 fully kept, src3 fully dropped
    by_src = {
        r["source"]: r["count"]
        for r in sample_corpus_mix(docs, rates, seed=7)
        .groupBy("source").count().collect()
    }
    n_src = {
        r["source"]: r["count"]
        for r in docs.groupBy("source").count().collect()
    }
    assert by_src["src0"] == n_src["src0"]
    assert "src3" not in by_src
    # a HALF rate lands near half on this corpus (loose band, deterministic)
    assert 0.2 <= by_src["src1"] / n_src["src1"] <= 0.8
    # raising a rate keeps every previously sampled row (cache-reuse
    # property), and a different seed is an independent redraw
    grown = sorted(
        r["doc_id"]
        for r in sample_corpus_mix(
            docs, {**rates, "src1": 0.9}, seed=7
        ).collect()
    )
    assert set(got) <= set(grown)
    reseeded = sorted(
        r["doc_id"] for r in sample_corpus_mix(docs, rates, seed=8).collect()
    )
    assert reseeded != got


def test_sample_corpus_mix_validates_rates(spark, sf_dir):
    from duckdb_faiss_ext_spark.functions.curation import sample_corpus_mix

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    with pytest.raises(ValueError, match="rate"):
        sample_corpus_mix(docs, {"src0": 1.5})


def test_repetition_impls_agree_on_adversarial_corpus(spark):
    """arrow == sql on a seeded 300-doc corpus built to stress every edge
    at once: newlines (incl. blank/whitespace-only lines), unicode, digit
    runs, heavy repetition, empty/NULL texts, single tokens, texts
    shorter than every n, and punctuation-only lines.  One job pair
    instead of a hypothesis loop — same coverage, 100x fewer Spark
    round-trips."""
    import random

    rng = random.Random(11)
    vocab = ["a", "bb", "ccc", "w1", "42", "émile", "スパム", "x-y", "z"]
    rows = []
    for i in range(300):
        kind = i % 6
        if kind == 0:  # random tokens, random newlines
            toks = [rng.choice(vocab) for _ in range(rng.randint(0, 30))]
            s = ""
            for t in toks:
                s += t + (rng.random() < 0.2 and "\n" or " ")
            rows.append((i, s))
        elif kind == 1:  # degenerate repetition
            t = rng.choice(vocab)
            rows.append((i, " ".join([t] * rng.randint(1, 40))))
        elif kind == 2:  # repeated lines with blanks
            ln = " ".join(rng.choice(vocab) for _ in range(3))
            rows.append((i, "\n".join([ln, "", "  ", ln, "other words here"])))
        elif kind == 3:
            rows.append((i, None))
        elif kind == 4:
            rows.append((i, ""))
        else:  # punctuation soup + short
            rows.append((i, rng.choice(["!!!", "a", "?? ?? !!", ". . ."])))
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    cols = None
    outs = {}
    for impl in ("arrow", "sql"):
        out = repetition_signals(df, top_ns=(1, 2, 3), dup_ns=(2, 5), impl=impl)
        cols = cols or out.columns
        outs[impl] = sorted(tuple(r[c] for c in cols) for r in out.collect())
    for a, s in zip(outs["arrow"], outs["sql"]):
        assert a[:3] == s[:3], (a, s)
        for x, y in zip(a[3:], s[3:]):
            assert x == pytest.approx(y, abs=1e-12), (a, s)


def test_pack_chunks_handcrafted(spark):
    from duckdb_faiss_ext_spark.functions.curation import pack_chunks

    rows = [
        # (doc, chunk, tokens) in one source: budget 10
        ("s1", 0, 0, 4), ("s1", 0, 1, 4), ("s1", 1, 0, 4),  # starts 0,4,8
        ("s1", 2, 0, 9),                                     # start 12 -> pack 1
        ("s1", 3, 0, 10),                                    # start 21 -> pack 2
        ("s2", 0, 0, 10), ("s2", 1, 0, 1),                   # own group
    ]
    df = spark.createDataFrame(
        rows, "source string, doc_id bigint, chunk_id int, n_tokens bigint"
    )
    got = {
        (r["source"], r["doc_id"], r["chunk_id"]): (r["pack_id"], r["pack_pos"])
        for r in pack_chunks(df, budget=10).collect()
    }
    assert got[("s1", 0, 0)] == (0, 0)
    assert got[("s1", 0, 1)] == (0, 1)
    assert got[("s1", 1, 0)] == (0, 2)   # starts at 8 < 10: overflow tail
    assert got[("s1", 2, 0)] == (1, 0)
    assert got[("s1", 3, 0)] == (2, 0)
    assert got[("s2", 0, 0)] == (0, 0)   # groups pack independently
    assert got[("s2", 1, 0)] == (1, 0)


def test_pack_chunks_rejects_oversized_and_bad_args(spark):
    from duckdb_faiss_ext_spark.functions.curation import pack_chunks

    df = spark.createDataFrame(
        [("s", 0, 0, 99)],
        "source string, doc_id bigint, chunk_id int, n_tokens bigint",
    )
    with pytest.raises(Exception, match="over budget"):
        pack_chunks(df, budget=10).collect()
    dfn = spark.createDataFrame(
        [("s", 0, 0, None)],
        "source string, doc_id bigint, chunk_id int, n_tokens bigint",
    )
    with pytest.raises(Exception, match="NULL"):
        pack_chunks(dfn, budget=10).collect()
    with pytest.raises(ValueError, match="group_cols"):
        pack_chunks(df, budget=10, group_cols=())


def test_pack_chunks_matches_duckdb_oracle(spark, sf_dir):
    """chunk_text over the real documents table -> pack 512-token-budget
    sequences per source; the DuckDB twin is the same window arithmetic.
    Also asserts the packing invariants: within every pack, positions are
    dense and the pre-overflow prefix fits the budget."""
    from duckdb_faiss_ext_spark.functions.curation import pack_chunks
    from duckdb_faiss_ext_spark.functions.text import chunk_text, regex_token_count

    parquet = f"{sf_dir}/documents.parquet"
    docs = spark.read.parquet(parquet).filter("text IS NOT NULL")
    chunks = chunk_text(
        docs.select("doc_id", "text"), chunk_chars=200, overlap=20
    ).join(docs.select("doc_id", "source"), on="doc_id")
    chunks = chunks.withColumn("n_tokens", regex_token_count("chunk"))
    budget = 64
    got = sorted(
        (r["source"], r["doc_id"], r["chunk_id"], r["pack_id"], r["pack_pos"])
        for r in pack_chunks(chunks, budget=budget).collect()
    )
    con = duckdb.connect()
    want = sorted(
        tuple(t)
        for t in con.execute(
            f"""
        WITH chunks AS (
          SELECT d.source, d.doc_id, CAST(g.i AS INT) AS chunk_id,
                 len(regexp_extract_all(
                     substr(d.text, CAST(g.i * 180 AS INT) + 1, 200),
                     '[A-Za-z0-9]+')) AS n_tokens
          FROM read_parquet('{parquet}') d
          JOIN generate_series(0, 10000) g(i)
            ON g.i < greatest(1, CAST(ceil((length(d.text) - 20)
                                           / 180.0) AS INT))
          WHERE d.text IS NOT NULL
        )
        , packed AS (
          SELECT source, doc_id, chunk_id,
                 CAST(floor((sum(n_tokens) OVER w - n_tokens)
                            / {budget}.0) AS BIGINT) AS pack_id
          FROM chunks
          WINDOW w AS (PARTITION BY source ORDER BY doc_id, chunk_id
                       ROWS UNBOUNDED PRECEDING)
        )
        SELECT source, doc_id, chunk_id, pack_id,
               CAST(row_number() OVER (
                 PARTITION BY source, pack_id
                 ORDER BY doc_id, chunk_id) - 1 AS INT) AS pack_pos
        FROM packed
        """
        ).fetchall()
    )
    assert got == want, (len(got), len(want), got[:3], want[:3])
    # invariants per (source, pack): dense positions; budget respected up
    # to one chunk's overflow tail
    from collections import defaultdict

    packs = defaultdict(list)
    toks = {
        (r["source"], r["doc_id"], r["chunk_id"]): r["n_tokens"]
        for r in chunks.collect()
    }
    for src, did, cid, pid, pos in got:
        packs[(src, pid)].append((pos, toks[(src, did, cid)]))
    for (src, pid), members in packs.items():
        members.sort()
        assert [p for p, _ in members] == list(range(len(members)))
        total = sum(t for _, t in members)
        last = members[-1][1]
        assert total - last < budget  # start of last chunk inside budget


@pytest.mark.parametrize("impl", ["arrow", "sql"])
def test_curate_text_on_a_stream(spark, tmp_path, impl):
    """Streaming curation: curate_text applies unchanged to a streaming
    DataFrame under BOTH impls (the sql impl is pure column expressions;
    the arrow impl's mapInPandas is a supported streaming narrow map) —
    the shape a continuously-ingesting training pipeline needs.  The
    memory sink collects per-doc dispositions; results must equal the
    batch run on the same rows."""
    import os
    import time

    src = str(tmp_path / f"cur_stream_{impl}")
    os.makedirs(src, exist_ok=True)
    rows = [
        (0, "the quick brown fox jumps over the lazy dog and runs on"),
        (1, "tiny"),
        (2, "spam spam spam spam spam spam spam spam spam spam"),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    df.coalesce(1).write.mode("overwrite").parquet(src)

    pol = TextPolicy(min_tokens=3, max_top_ngram_frac={2: 0.2},
                     max_dup_ngram_frac={5: 0.15})
    batch = {
        r["doc_id"]: r["status"]
        for r in curate_text(df, pol, impl=impl).collect()
    }

    stream = spark.readStream.schema("doc_id bigint, text string").parquet(src)
    out = curate_text(stream, pol, impl=impl).select("doc_id", "status")
    name = f"cur_stream_sink_{impl}"
    q = (
        out.writeStream.format("memory").queryName(name)
        .option("checkpointLocation", str(tmp_path / f"ckpt_{impl}"))
        .start()
    )
    try:
        deadline = time.time() + 60
        got = {}
        while time.time() < deadline:
            q.processAllAvailable()
            got = {
                r["doc_id"]: r["status"]
                for r in spark.sql(f"SELECT * FROM {name}").collect()
            }
            if len(got) == len(rows):
                break
            time.sleep(0.5)
    finally:
        q.stop()
    assert got == batch
    assert got[0] == "kept" and got[2] == "filtered:max_top_2gram_frac"


def test_mix_rates_null_source_survives(spark):
    """r11 review: a NULL source must not crash the rate computation —
    it gets rate 0.0 (not in the mix) like any non-target source."""
    from duckdb_faiss_ext_spark.functions.curation import (
        mix_rates,
        sample_corpus_mix,
    )

    df = spark.createDataFrame(
        [(0, "a", 10), (1, None, 10), (2, "b", 10)],
        "doc_id bigint, source string, n_chars bigint",
    )
    rates = mix_rates(df, {"a": 5}, size_col="n_chars")
    assert rates["a"] == 0.5 and rates[None] == 0.0 and rates["b"] == 0.0
    kept = sample_corpus_mix(df, {k: v for k, v in rates.items() if k}).collect()
    assert all(r["source"] == "a" for r in kept)


@pytest.mark.parametrize("impl", ["arrow", "sql"])
def test_repetition_whitespace_only_lines_match_sql_semantics(spark, impl):
    """r11 review: Spark/DuckDB trim() removes only SPACES, so a tab-only
    separator line IS a line; Python's bare strip() silently dropped it
    in the arrow kernel.  Both impls must count 4 lines here (the '\\t'
    separator counts, the space-only one does not)."""
    df = spark.createDataFrame(
        [(0, "x\n\t\nx\n   \nyy zz")], "doc_id bigint, text string"
    )
    r = repetition_signals(df, top_ns=(2,), dup_ns=(5,), impl=impl).first()
    assert r["n_lines"] == 4          # x, \t, x, 'yy zz' — not the spaces
    assert r["dup_line_frac"] == pytest.approx(0.25)


def test_sample_corpus_mix_join_path_equals_case_path(spark):
    """Above 256 sources the rate lookup ships as a broadcast join; the
    selected row set must be IDENTICAL to the literal-CASE path (forced
    by splitting the same mix across the threshold)."""
    from duckdb_faiss_ext_spark.functions.curation import sample_corpus_mix

    n_src = 300
    df = spark.range(0, 6000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), (F.col("id") % n_src).cast("string")).alias(
            "source"
        ),
    )
    rates = {f"s{i}": (i % 4) / 4.0 for i in range(n_src)}  # 0, .25, .5, .75
    got_join = sorted(
        r["doc_id"] for r in sample_corpus_mix(df, rates, seed=3).collect()
    )
    # CASE path, forced: same rates in <= 256-source slices, unioned
    items = sorted(rates.items())
    a, b = dict(items[:150]), dict(items[150:])
    got_case = sorted(
        [r["doc_id"] for r in sample_corpus_mix(df, a, seed=3).collect()]
        + [r["doc_id"] for r in sample_corpus_mix(df, b, seed=3).collect()]
    )
    assert got_join == got_case and len(got_join) > 0
    assert sample_corpus_mix(df, rates, seed=3).columns == df.columns


def test_pack_chunks_rows_frame_on_tied_order_keys(spark):
    """ADVICE r12: under the default RANGE frame, order-key ties are window
    peers — every tied row got the SAME cumulative start (peers' tokens
    lumped together) while pack_pos stayed per-row, silently mispacking.
    The ROWS frame gives each row its own running sum: two identical rows
    of 6 tokens at budget 6 must land in DIFFERENT packs (starts 0 and 6),
    where RANGE put both at start 6 -> both pack 1 and an empty pack 0."""
    from duckdb_faiss_ext_spark.functions.curation import pack_chunks

    df = spark.createDataFrame(
        [("s", 0, 0, 6), ("s", 0, 0, 6)],  # identical order keys: tied
        "source string, doc_id bigint, chunk_id int, n_tokens bigint",
    )
    got = sorted(
        (r["pack_id"], r["pack_pos"])
        for r in pack_chunks(df, budget=6).collect()
    )
    assert got == [(0, 0), (1, 0)]


def test_curate_text_validates_impl_even_without_repetition(spark):
    """ADVICE r12: a policy with all repetition constraints disabled skips
    repetition_signals entirely, so curate_text must validate impl itself
    instead of silently accepting (and ignoring) garbage."""
    from duckdb_faiss_ext_spark.functions.curation import TextPolicy, curate_text

    df = spark.createDataFrame([(0, "hello world")], "doc_id bigint, text string")
    pol = TextPolicy(
        max_dup_line_frac=None,
        max_dup_line_char_frac=None,
        max_top_ngram_frac={},
        max_dup_ngram_frac={},
    )
    with pytest.raises(ValueError, match="impl must be"):
        curate_text(df, pol, impl="sq1")
    # and the valid impls still work with the stripped policy
    assert curate_text(df, pol, impl="arrow").count() == 1


def test_sample_corpus_mix_exact_matches_duckdb_and_is_superset(spark, sf_dir):
    """exact=True (VERDICT r11 task 4): per-source counts are EXACT (not
    Bernoulli-approximate), the row set equals the DuckDB row_number twin
    on the same md5 draw, budget growth keeps every previously selected
    row, and both prefilter paths select identical rows."""
    from duckdb_faiss_ext_spark.functions.curation import sample_corpus_mix

    parquet = f"{sf_dir}/documents.parquet"
    docs = spark.read.parquet(parquet)
    n_src = {
        r["source"]: r["count"]
        for r in docs.groupBy("source").count().collect()
    }
    targets = {"src0": 10, "src1": 7, "src2": n_src["src2"] + 50, "src3": 0}
    sel = sample_corpus_mix(docs, targets, seed=7, exact=True)
    by_src = {
        r["source"]: r["count"] for r in sel.groupBy("source").count().collect()
    }
    # exact counts: k when k <= n, all n when the target exceeds the source
    assert by_src.get("src0", 0) == 10
    assert by_src.get("src1", 0) == 7
    assert by_src.get("src2", 0) == n_src["src2"]
    assert "src3" not in by_src
    got = sorted(r["doc_id"] for r in sel.collect())
    con = duckdb.connect()
    case = "CASE source " + " ".join(
        f"WHEN '{s}' THEN {k}" for s, k in targets.items()
    ) + " ELSE 0 END"
    want = sorted(
        t[0]
        for t in con.execute(
            f"""
            WITH d AS (
              SELECT doc_id, source,
                     ('0x' || substr(md5('7:' || CAST(doc_id AS VARCHAR)),
                                     1, 8))::BIGINT / 4294967296.0 AS draw
              FROM read_parquet('{parquet}')
            ),
            r AS (
              SELECT doc_id, source,
                     row_number() OVER (PARTITION BY source
                                        ORDER BY draw, doc_id) AS rn
              FROM d
            )
            SELECT doc_id FROM r WHERE rn <= {case}
            """
        ).fetchall()
    )
    assert got == want and len(got) > 0
    # superset under budget growth: same fixed order, longer prefix
    grown = sorted(
        r["doc_id"]
        for r in sample_corpus_mix(
            docs, {**targets, "src0": 20, "src1": 15}, seed=7, exact=True
        ).collect()
    )
    assert set(got) <= set(grown)
    # prefilter=None (pure window, no verification pass): identical rows
    lazy = sorted(
        r["doc_id"]
        for r in sample_corpus_mix(
            docs, targets, seed=7, exact=True, prefilter=None
        ).collect()
    )
    assert lazy == got
    assert sel.columns == docs.columns


def test_sample_corpus_mix_exact_validates_counts(spark, sf_dir):
    from duckdb_faiss_ext_spark.functions.curation import sample_corpus_mix

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    with pytest.raises(ValueError, match="non-negative integer"):
        sample_corpus_mix(docs, {"src0": 0.5}, exact=True)
    with pytest.raises(ValueError, match="non-negative integer"):
        sample_corpus_mix(docs, {"src0": -3}, exact=True)
    with pytest.raises(ValueError, match="prefilter"):
        sample_corpus_mix(docs, {"src0": 3}, exact=True, prefilter="yes")


def test_sample_corpus_mix_exact_returns_cached_selection(spark, sf_dir):
    """ADVICE r12: exact+prefilter='auto' persists the verified sample so
    the caller's first action reuses it (two aggregation jobs total, not a
    third full recompute of the windowed selection)."""
    from pyspark import StorageLevel
    from duckdb_faiss_ext_spark.functions.curation import sample_corpus_mix

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sel = sample_corpus_mix(docs, {"src0": 5, "src1": 3}, seed=1, exact=True)
    try:
        assert sel.storageLevel != StorageLevel.NONE  # cached, per docstring
        assert sel.count() == 8
    finally:
        sel.unpersist(blocking=False)
    # prefilter=None stays fully lazy — no cache imposed on the caller
    lazy = sample_corpus_mix(
        docs, {"src0": 5, "src1": 3}, seed=1, exact=True, prefilter=None
    )
    assert lazy.storageLevel == StorageLevel.NONE


def test_repetition_union_coverage_handcrafted(spark):
    """coverage='union' (VERDICT r12 task 7): overlapping occurrences count
    each covered token position once; adjacency keeps in-run separators;
    non-overlapping text agrees exactly with the multiset default."""
    from duckdb_faiss_ext_spark.functions.curation import repetition_signals

    docs = spark.createDataFrame(
        [(0, "a a a a"), (1, "x y z x y w"), (2, "a b a b")],
        "doc_id bigint, text string",
    )
    un = {
        r["doc_id"]: r
        for r in repetition_signals(
            docs, top_ns=(2,), dup_ns=(2,), coverage="union"
        ).collect()
    }
    # "a a a a": 'a a' occurs at 0,1,2 (overlapping) -> union covers all 4
    # tokens + 3 separators = 7 of 7 chars
    assert un[0]["top_2gram_char_frac"] == pytest.approx(1.0)
    assert un[0]["dup_2gram_char_frac"] == pytest.approx(1.0)
    # "x y z x y w": 'x y' at 0 and 3 — disjoint runs, no cross-run
    # separator: (1+1+1) + (1+1+1) = 6 of 11
    assert un[1]["top_2gram_char_frac"] == pytest.approx(6 / 11)
    assert un[1]["dup_2gram_char_frac"] == pytest.approx(6 / 11)
    # "a b a b": 'a b' at 0 and 2 — char intervals [0,3) and [4,7) touch
    # only across a separator NO occurrence contains: 6 of 7, never 7
    # (union counts covered CHARS once; it cannot exceed multiset)
    assert un[2]["top_2gram_char_frac"] == pytest.approx(6 / 7)
    assert un[2]["dup_2gram_char_frac"] == pytest.approx(6 / 7)
    ms = {
        r["doc_id"]: r
        for r in repetition_signals(
            docs, top_ns=(2,), dup_ns=(2,), coverage="multiset"
        ).collect()
    }
    assert ms[0]["top_2gram_char_frac"] == pytest.approx(9 / 7)  # 3 x 'a a'
    assert ms[2]["top_2gram_char_frac"] == pytest.approx(6 / 7)  # no overlap
    # no overlap anywhere in doc 1 -> the two conventions coincide
    assert ms[1]["top_2gram_char_frac"] == pytest.approx(
        un[1]["top_2gram_char_frac"]
    )
    # union can never exceed multiset
    for d in (0, 1, 2):
        assert un[d]["dup_2gram_char_frac"] <= ms[d]["dup_2gram_char_frac"] + 1e-12


def test_repetition_union_coverage_validation(spark):
    from duckdb_faiss_ext_spark.functions.curation import repetition_signals

    docs = spark.createDataFrame([(0, "a b")], "doc_id bigint, text string")
    with pytest.raises(ValueError, match="coverage must be"):
        repetition_signals(docs, coverage="overlap")
    with pytest.raises(ValueError, match="Arrow-only"):
        repetition_signals(docs, impl="sql", coverage="union")


def _rep_union_oracle_sql(parquet: str, top_ns, dup_ns):
    """DuckDB twin of coverage='union': each occurrence covers its char
    interval [cs, cs+len(gram)) in the space-joined token stream; islands
    (classic running-max gaps-and-islands) merge overlapping intervals,
    coverage = sum over islands of (max(ce) - min(cs)).  Top gram per
    (doc, n) by (count DESC, union coverage DESC, first occurrence ASC) —
    the same deterministic tie-break as the Arrow kernel."""
    all_ns = sorted(set(top_ns) | set(dup_ns))
    n_values = ", ".join(f"({n})" for n in all_ns)
    top_cols = ", ".join(
        f"coalesce(max(CASE WHEN tg.n = {n} THEN tg.ucov END)"
        f" / greatest(b.n_chars, 1), 0.0) AS top_{n}gram_char_frac"
        for n in top_ns
    )
    dup_cols = ", ".join(
        f"coalesce(max(CASE WHEN dc.n = {n} THEN dc.ucov END)"
        f" / greatest(b.n_chars, 1), 0.0) AS dup_{n}gram_char_frac"
        for n in dup_ns
    )
    return f"""
    WITH base AS (
      SELECT doc_id, coalesce(length(text), 0) AS n_chars,
             regexp_extract_all(lower(coalesce(text, '')), '[a-z0-9]+') AS t
      FROM read_parquet('{parquet}')
    ),
    occ AS (
      SELECT doc_id, n, i, t, gram FROM (
        SELECT b.doc_id, nv.n, b.t,
               unnest(generate_series(1, len(b.t) - nv.n + 1)) AS i
        FROM base b JOIN (VALUES {n_values}) nv(n) ON len(b.t) >= nv.n
      ) p, LATERAL (SELECT array_to_string(p.t[p.i : p.i + p.n - 1], ' ')
                    AS gram) g
    ),
    iv AS (  -- char interval of each occurrence in the joined stream
      SELECT doc_id, n, gram, i, cs, cs + length(gram) AS ce FROM (
        SELECT doc_id, n, gram, i,
               coalesce(length(array_to_string(t[1 : i - 1], ' ')), 0)
                 + CASE WHEN i > 1 THEN 1 ELSE 0 END AS cs
        FROM occ
      )
    ),
    gisl AS (  -- per-gram islands of overlapping intervals
      SELECT doc_id, n, gram, cs, ce,
             sum(new_isl) OVER (PARTITION BY doc_id, n, gram
                                ORDER BY cs, ce
                                ROWS UNBOUNDED PRECEDING) AS isl
      FROM (
        SELECT *, CASE WHEN cs > coalesce(max(ce) OVER (
                     PARTITION BY doc_id, n, gram ORDER BY cs, ce
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                     -1) THEN 1 ELSE 0 END AS new_isl
        FROM iv
      )
    ),
    gcov AS (
      SELECT doc_id, n, gram, sum(mx - mn) AS ucov FROM (
        SELECT doc_id, n, gram, isl, max(ce) AS mx, min(cs) AS mn
        FROM gisl GROUP BY doc_id, n, gram, isl
      ) GROUP BY doc_id, n, gram
    ),
    gstats AS (
      SELECT o.doc_id, o.n, o.gram, count(*) AS cnt, min(o.i) AS first_i,
             any_value(c.ucov) AS ucov
      FROM occ o JOIN gcov c USING (doc_id, n, gram)
      GROUP BY o.doc_id, o.n, o.gram
    ),
    topg AS (
      SELECT doc_id, n, ucov FROM (
        SELECT doc_id, n, ucov,
               row_number() OVER (PARTITION BY doc_id, n
                                  ORDER BY cnt DESC, ucov DESC,
                                           first_i ASC) AS rk
        FROM gstats
      ) WHERE rk = 1
    ),
    disl AS (  -- islands over ALL duplicated grams' intervals per (doc, n)
      SELECT doc_id, n, cs, ce,
             sum(new_isl) OVER (PARTITION BY doc_id, n ORDER BY cs, ce
                                ROWS UNBOUNDED PRECEDING) AS isl
      FROM (
        SELECT v.doc_id, v.n, v.cs, v.ce,
               CASE WHEN v.cs > coalesce(max(v.ce) OVER (
                    PARTITION BY v.doc_id, v.n ORDER BY v.cs, v.ce
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    -1) THEN 1 ELSE 0 END AS new_isl
        FROM iv v JOIN gstats s USING (doc_id, n, gram)
        WHERE s.cnt > 1
      )
    ),
    dcov AS (
      SELECT doc_id, n, sum(mx - mn) AS ucov FROM (
        SELECT doc_id, n, isl, max(ce) AS mx, min(cs) AS mn
        FROM disl GROUP BY doc_id, n, isl
      ) GROUP BY doc_id, n
    )
    SELECT b.doc_id, {top_cols}, {dup_cols}
    FROM base b
    LEFT JOIN topg tg USING (doc_id)
    LEFT JOIN dcov dc USING (doc_id)
    GROUP BY b.doc_id, b.n_chars
    """


def test_repetition_union_matches_duckdb_oracle(spark, sf_dir):
    """coverage='union' against an independent DuckDB interval-merge
    formulation over the real documents table — every gram column, every
    row, exact to 1e-12 (VERDICT r12 task 7 done-criterion: both coverage
    modes oracled; the multiset mode keeps its original oracle above)."""
    top_ns, dup_ns = (2, 3), (2, 5)
    parquet = f"{sf_dir}/documents.parquet"
    docs = spark.read.parquet(parquet).select("doc_id", "text")
    from duckdb_faiss_ext_spark.functions.curation import repetition_signals

    cols = (
        ["doc_id"]
        + [f"top_{n}gram_char_frac" for n in top_ns]
        + [f"dup_{n}gram_char_frac" for n in dup_ns]
    )
    got = {
        r["doc_id"]: [r[c] for c in cols[1:]]
        for r in repetition_signals(
            docs, top_ns=top_ns, dup_ns=dup_ns, coverage="union"
        )
        .select(*cols)
        .collect()
    }
    con = duckdb.connect()
    want = {
        row[0]: list(row[1:])
        for row in con.execute(
            _rep_union_oracle_sql(parquet, top_ns, dup_ns)
        ).fetchall()
    }
    assert set(got) == set(want)
    for did in want:
        for g, w in zip(got[did], want[did]):
            assert g == pytest.approx(w, abs=1e-12), (did, got[did], want[did])
