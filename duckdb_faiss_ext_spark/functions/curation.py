"""Corpus-curation operators for training-data pipelines (r11).

Three published, deterministic curation stages the reference engine's
users run in front of every large-scale LLM training job, each expressed
as declarative Spark plans with exact ANSI-SQL twins (cross-checked
against DuckDB in tests/test_curation.py):

- ``repetition_signals`` — the Gopher repetition statistics (Rae et al.
  2021, "Scaling Language Models", Table A1): duplicate line / line-char
  fractions per document, plus the top-n-gram and duplicate-n-gram
  character-coverage fractions that catch boilerplate and degenerate
  machine-generated text.
- ``ngram_contamination`` — benchmark decontamination by n-gram
  collision (the GPT-3 appendix-C method, Brown et al. 2020): a training
  document is flagged when any normalized 13-gram also appears in an
  evaluation set.
- ``curate_text`` / ``TextPolicy`` — the one-pass policy operator that
  composes every text signal the engine computes (length, language,
  quality, PII, repetition) into a per-document disposition, mirroring
  ``operators/curate.py``'s media surface: every input row comes back
  with its full signal vector and a ``status`` of ``kept`` or
  ``filtered:<first-failing-constraint>`` — the filter log IS the audit
  trail.

Scale shape (100 TB): the line-level signals are pure per-row column
expressions (codegen, zero shuffle).  The n-gram signals explode to
``(doc, n, gram)`` rows once for ALL requested n and aggregate
immediately — the wide shuffle has to carry the gram string (it is the
grouping key), but map-side partial combine collapses exactly the
repeated grams the signals measure, and the gram text is projected away
before the second, per-document reduce, which carries only
``(doc_id, n, cnt, cov)``.
Contamination broadcasts the (small) eval-gram set so the corpus side is
one scan with a broadcast hash semi-join; only colliding grams reach the
per-document count shuffle.  No UDFs anywhere — every expression is
whole-stage-codegen SQL.

The reference engine (duckdb-faiss-ext) has no text-curation surface;
these extend the engine for the pipelines the 100 TB target serves, the
same way operators/dedup.py extends it for deduplication.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Mapping, Optional, Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from duckdb_faiss_ext_spark.functions import text as T

__all__ = [
    "line_stats",
    "repetition_signals",
    "ngram_contamination",
    "TextPolicy",
    "curate_text",
]


# --------------------------------------------------------------- line signals


def _nonempty_lines(col) -> Column:
    """Lines = newline-split segments with any non-whitespace content.
    Blank separator lines are not 'duplicates' of each other — counting
    them would flag every multi-paragraph document."""
    return F.filter(
        F.split(T._c(col), "\n"),
        lambda ln: F.length(F.trim(ln)) > 0,
    )


def line_stats(col) -> Column:
    """STRUCT<n_lines INT, dup_line_frac DOUBLE, dup_line_char_frac DOUBLE>
    — the Gopher duplicate-line signals as one pure column expression
    (no shuffle; NULL text -> NULL struct).

    ``dup_line_frac``      = repeated line occurrences (beyond each line's
                             first) / total lines.
    ``dup_line_char_frac`` = characters inside those repeated occurrences
                             / total line characters.
    """
    lines = _nonempty_lines(col)
    distinct = F.array_distinct(lines)
    n = F.size(lines)
    chars = F.aggregate(lines, F.lit(0), lambda acc, ln: acc + F.length(ln))
    dchars = F.aggregate(distinct, F.lit(0), lambda acc, ln: acc + F.length(ln))
    safe_n = F.greatest(n, F.lit(1)).cast("double")
    safe_c = F.greatest(chars, F.lit(1)).cast("double")
    return F.struct(
        n.cast("int").alias("n_lines"),
        ((n - F.size(distinct)) / safe_n).alias("dup_line_frac"),
        ((chars - dchars) / safe_c).alias("dup_line_char_frac"),
    )


# ------------------------------------------------------------ n-gram signals

DEFAULT_TOP_NS = (2, 3, 4)
DEFAULT_DUP_NS = (5, 6, 7, 8, 9, 10)


def _gram_rows(toks: Column, n: int) -> Column:
    """ARRAY<STRUCT<n INT, gram STRING>> of the word n-grams of ``toks``
    (space-joined).  Documents shorter than n yield an empty array — the
    guard matters because sequence(1, 0) would produce a DESCENDING
    sequence, not an empty one."""
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - n + 1),
            lambda i: F.struct(
                F.lit(n).alias("n"),
                F.concat_ws(" ", F.slice(toks, i, n)).alias("gram"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<n:int,gram:string>>"))


def repetition_signals(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_ns: Sequence[int] = DEFAULT_TOP_NS,
    dup_ns: Sequence[int] = DEFAULT_DUP_NS,
) -> DataFrame:
    """Per-document repetition statistics (Gopher Table A1): one row per
    input document with

    - ``n_chars``, ``n_lines``, ``dup_line_frac``, ``dup_line_char_frac``
    - ``top_{n}gram_char_frac`` for n in ``top_ns``: characters covered by
      all occurrences of the single most frequent word n-gram / document
      characters (ties broken toward the larger coverage, then it does
      not matter — equal counts and equal coverage are interchangeable);
    - ``dup_{n}gram_char_frac`` for n in ``dup_ns``: characters covered by
      all occurrences of n-grams that appear more than once / document
      characters.

    Coverage counts every occurrence's characters independently, so
    overlapping occurrences can push a fraction above 1.0 on degenerate
    text ("a b a b a b ...") — exactly the documents the thresholds
    exist to reject; the published filters compare against caps well
    below 1, so the fractions are deliberately NOT clamped.

    Tokenization matches vocab_stats: lowercase alnum runs, so the op has
    an exact DuckDB oracle (tests/test_curation.py).  Grams are joined
    with single spaces; gram character length therefore counts the n-1
    separators — a documented, engine-independent convention.

    Plan shape: per-row line/char signals (codegen, no shuffle) LEFT-join
    the n-gram aggregate, which explodes (doc, n, gram) once for all n,
    counts with map-side partial aggregation, drops the gram string, and
    reduces to one row per document.  Documents with no grams (short or
    NULL text) still appear, with zero fractions."""
    top_ns = tuple(dict.fromkeys(int(n) for n in top_ns))
    dup_ns = tuple(dict.fromkeys(int(n) for n in dup_ns))
    if any(n < 1 for n in top_ns + dup_ns):
        raise ValueError(f"repetition_signals: n must be >= 1, got {top_ns + dup_ns}")
    all_ns = tuple(dict.fromkeys(top_ns + dup_ns))

    text = F.col(text_col)
    toks = F.regexp_extract_all(F.lower(text), F.lit("[a-z0-9]+"), F.lit(0))
    ls = line_stats(text)
    base = df.select(
        F.col(id_col),
        F.coalesce(F.length(text), F.lit(0)).cast("bigint").alias("n_chars"),
        F.coalesce(ls["n_lines"], F.lit(0)).alias("n_lines"),
        F.coalesce(ls["dup_line_frac"], F.lit(0.0)).alias("dup_line_frac"),
        F.coalesce(ls["dup_line_char_frac"], F.lit(0.0)).alias(
            "dup_line_char_frac"
        ),
        toks.alias("__toks"),
    )

    grams = base.select(
        F.col(id_col),
        F.explode(
            F.flatten(F.array(*[_gram_rows(F.col("__toks"), n) for n in all_ns]))
        ).alias("g"),
    ).select(id_col, "g.n", "g.gram")
    counted = grams.groupBy(id_col, "n", "gram").agg(
        F.count("*").alias("cnt")
    )
    # the gram string has done its job (grouping); shuffle only its length
    slim = counted.select(
        id_col,
        "n",
        F.col("cnt"),
        (F.col("cnt") * F.length("gram")).cast("bigint").alias("cov"),
    )
    aggs = []
    for n in top_ns:
        # max(struct(cnt, cov)) = most frequent gram, coverage tie-break —
        # identical field-order semantics in Spark and DuckDB
        aggs.append(
            F.max(
                F.when(F.col("n") == n, F.struct(F.col("cnt"), F.col("cov")))
            )["cov"].alias(f"__top{n}_cov")
        )
    for n in dup_ns:
        aggs.append(
            F.sum(
                F.when((F.col("n") == n) & (F.col("cnt") > 1), F.col("cov"))
            ).alias(f"__dup{n}_cov")
        )
    per_doc = slim.groupBy(id_col).agg(*aggs)

    out = base.drop("__toks").join(per_doc, on=id_col, how="left")
    safe_chars = F.greatest(F.col("n_chars"), F.lit(1)).cast("double")
    for n in top_ns:
        out = out.withColumn(
            f"top_{n}gram_char_frac",
            F.coalesce(F.col(f"__top{n}_cov") / safe_chars, F.lit(0.0)),
        )
    for n in dup_ns:
        out = out.withColumn(
            f"dup_{n}gram_char_frac",
            F.coalesce(F.col(f"__dup{n}_cov") / safe_chars, F.lit(0.0)),
        )
    return out.drop(
        *[f"__top{n}_cov" for n in top_ns], *[f"__dup{n}_cov" for n in dup_ns]
    )


# ------------------------------------------------------------- contamination


def ngram_contamination(
    docs: DataFrame,
    eval_df: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    eval_text_col: str = "text",
) -> DataFrame:
    """Benchmark-decontamination check (GPT-3 appendix C): flag training
    documents sharing any normalized word ``n``-gram with an evaluation
    set.  Returns one row per input document:

    ``(id_col, n_grams, n_contaminated, contam_frac, is_contaminated)``

    where ``n_grams`` counts the document's DISTINCT n-grams and
    ``n_contaminated`` how many of those also occur anywhere in
    ``eval_df``.  Normalization = lowercase alnum tokenization (the
    repo-wide convention), so paraphrase-level contamination is out of
    scope by design — this is the published exact-overlap method.

    Texts shorter than ``n`` tokens have no n-grams: ``n_grams = 0`` and
    the document cannot be flagged.  Use a smaller ``n`` for short-form
    eval sets (the GPT-3 paper itself scales N with example length).

    Scale shape: the eval side is grams-distinct and **broadcast** (an
    eval benchmark is KBs-to-MBs against a 100 TB corpus); the corpus
    side is one scan + explode of per-document distinct grams, a
    broadcast hash join that keeps only collisions, and a per-document
    count of the (rare) survivors.  The full gram population never
    shuffles."""
    if n < 1:
        raise ValueError(f"ngram_contamination: n must be >= 1, got {n}")

    def doc_grams(col) -> Column:
        toks = F.regexp_extract_all(
            F.lower(T._c(col)), F.lit("[a-z0-9]+"), F.lit(0)
        )
        return F.array_distinct(
            F.when(
                F.size(toks) >= n,
                F.transform(
                    F.sequence(F.lit(1), F.size(toks) - n + 1),
                    lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
                ),
            ).otherwise(F.array().cast("array<string>"))
        )

    eval_grams = (
        eval_df.select(F.explode(doc_grams(eval_text_col)).alias("gram"))
        .distinct()
    )
    base = docs.select(
        F.col(id_col), doc_grams(text_col).alias("__grams")
    ).select(
        id_col, F.size("__grams").cast("bigint").alias("n_grams"), "__grams"
    )
    hits = (
        base.select(id_col, F.explode("__grams").alias("gram"))
        .join(F.broadcast(eval_grams), on="gram", how="inner")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_contaminated"))
    )
    out = (
        base.drop("__grams")
        .join(hits, on=id_col, how="left")
        .withColumn(
            "n_contaminated", F.coalesce(F.col("n_contaminated"), F.lit(0))
        )
    )
    return out.select(
        id_col,
        "n_grams",
        "n_contaminated",
        (
            F.col("n_contaminated")
            / F.greatest(F.col("n_grams"), F.lit(1)).cast("double")
        ).alias("contam_frac"),
        (F.col("n_contaminated") > 0).alias("is_contaminated"),
    )


# ------------------------------------------------------------ one-pass policy


@dataclass(frozen=True)
class TextPolicy:
    """Declarative document-quality policy (Gopher's rule set, Rae et al.
    2021 A.1.1, parameterized).  ``None`` disables a constraint.  Order of
    evaluation = field order below; ``status`` names the FIRST failing
    constraint, so tightening one rule never re-labels rows it already
    passed.

    ``max_top_ngram_frac`` / ``max_dup_ngram_frac`` map n -> cap; their
    keys select which repetition columns are computed, so an empty map
    skips that signal's cost entirely."""

    min_tokens: Optional[int] = 5
    max_tokens: Optional[int] = None
    min_mean_word_chars: Optional[float] = None  # Gopher uses 3
    max_mean_word_chars: Optional[float] = None  # Gopher uses 10
    allowed_langs: Optional[tuple] = None
    min_quality: Optional[float] = None
    max_pii_count: Optional[int] = None
    max_dup_line_frac: Optional[float] = 0.30
    max_dup_line_char_frac: Optional[float] = 0.20
    max_top_ngram_frac: Mapping[int, float] = field(
        default_factory=lambda: {2: 0.20, 3: 0.18, 4: 0.16}
    )
    max_dup_ngram_frac: Mapping[int, float] = field(
        default_factory=lambda: {
            5: 0.15, 6: 0.14, 7: 0.13, 8: 0.12, 9: 0.11, 10: 0.10,
        }
    )


def curate_text(
    df: DataFrame,
    policy: TextPolicy | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """One-pass text curation: compute every signal the policy consults,
    evaluate constraints in declaration order, and return EVERY input row
    with its signal vector plus ``status`` — ``kept``, ``filtered:<rule>``
    or ``filtered:null_text``.  ``out.filter("status = 'kept'")`` is the
    training corpus; the rest is the per-rule audit trail a curation run
    has to report anyway (mirrors operators/curate.py for media).

    All signals are SQL expressions over one corpus scan; the repetition
    signals add the one exploded aggregation documented in
    ``repetition_signals``.  Signals whose constraints are disabled are
    still emitted (they are nearly free on the same scan) EXCEPT the
    n-gram fractions, which are computed only for the n values the policy
    actually caps."""
    policy = policy or TextPolicy()
    top_ns = tuple(sorted(policy.max_top_ngram_frac or {}))
    dup_ns = tuple(sorted(policy.max_dup_ngram_frac or {}))

    text = F.col(text_col)
    sig = df.select(
        F.col(id_col),
        text,
        T.token_count(text).alias("n_tokens"),
        T.char_count(text).alias("n_chars"),
        T.lang_id(text).alias("lang"),
        T.quality_score(text).alias("quality"),
        T.pii_count(text).alias("n_pii"),
    )
    if top_ns or dup_ns or policy.max_dup_line_frac is not None or (
        policy.max_dup_line_char_frac is not None
    ):
        rep = repetition_signals(
            df.select(id_col, text_col),
            text_col=text_col,
            id_col=id_col,
            top_ns=top_ns,
            dup_ns=dup_ns,
        ).drop("n_chars")
        sig = sig.join(rep, on=id_col, how="left")
    mean_word = (F.col("n_chars") - (F.col("n_tokens") - 1)) / F.greatest(
        F.col("n_tokens"), F.lit(1)
    ).cast("double")
    sig = sig.withColumn("mean_word_chars", mean_word)

    checks: list[tuple[str, Column]] = [
        ("null_text", text.isNull()),
    ]
    if policy.min_tokens is not None:
        checks.append(("min_tokens", F.col("n_tokens") < policy.min_tokens))
    if policy.max_tokens is not None:
        checks.append(("max_tokens", F.col("n_tokens") > policy.max_tokens))
    if policy.min_mean_word_chars is not None:
        checks.append(
            (
                "min_mean_word_chars",
                F.col("mean_word_chars") < policy.min_mean_word_chars,
            )
        )
    if policy.max_mean_word_chars is not None:
        checks.append(
            (
                "max_mean_word_chars",
                F.col("mean_word_chars") > policy.max_mean_word_chars,
            )
        )
    if policy.allowed_langs is not None:
        checks.append(
            ("allowed_langs", ~F.col("lang").isin(*policy.allowed_langs))
        )
    if policy.min_quality is not None:
        checks.append(("min_quality", F.col("quality") < policy.min_quality))
    if policy.max_pii_count is not None:
        checks.append(("max_pii_count", F.col("n_pii") > policy.max_pii_count))
    if policy.max_dup_line_frac is not None:
        checks.append(
            ("max_dup_line_frac", F.col("dup_line_frac") > policy.max_dup_line_frac)
        )
    if policy.max_dup_line_char_frac is not None:
        checks.append(
            (
                "max_dup_line_char_frac",
                F.col("dup_line_char_frac") > policy.max_dup_line_char_frac,
            )
        )
    for n in top_ns:
        checks.append(
            (
                f"max_top_{n}gram_frac",
                F.col(f"top_{n}gram_char_frac") > policy.max_top_ngram_frac[n],
            )
        )
    for n in dup_ns:
        checks.append(
            (
                f"max_dup_{n}gram_frac",
                F.col(f"dup_{n}gram_char_frac") > policy.max_dup_ngram_frac[n],
            )
        )

    status = F.lit("kept")
    for name, failed in reversed(checks):
        status = F.when(failed, F.lit(f"filtered:{name}")).otherwise(status)
    return sig.withColumn("status", status).drop(text_col)
