"""Text-analysis column functions for training-data pipelines.

All pure Spark SQL expressions (JVM codegen, no UDFs) chosen so an identical
DuckDB SQL formulation exists — every function here has an oracle twin in
`__spark_entry__.oracle_sql()`.  Heuristics are deliberately simple and
deterministic; they are pipeline plumbing, not models.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

TOKEN_RE = "[A-Za-z0-9]+"  # same meaning in Java regex and RE2

# tiny per-language stopword lists for the n-gram/stopword language heuristic
LANG_STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "is"],
    "es": ["el", "la", "y", "de", "que", "los"],
    "de": ["der", "die", "das", "und", "ist", "ein"],
    "fr": ["le", "la", "et", "les", "des", "est"],
    "zh": [],  # CJK detected by codepoint range instead
}
LANG_ORDER = ["en", "es", "de", "fr"]  # deterministic tie-break order


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def words(col) -> Column:
    return F.split(F.trim(_c(col)), r"\s+")


def token_count(col) -> Column:
    """Whitespace token count."""
    return F.size(words(col)).cast("bigint")


def regex_token_count(col) -> Column:
    """BPE-ish tokenization proxy: alnum runs ([A-Za-z0-9]+)."""
    return F.size(F.regexp_extract_all(_c(col), F.lit(TOKEN_RE), F.lit(0))).cast(
        "bigint"
    )


def char_count(col) -> Column:
    return F.length(_c(col)).cast("bigint")


def punct_count(col) -> Column:
    """Characters that are not alnum/whitespace."""
    return F.length(F.regexp_replace(_c(col), r"[A-Za-z0-9\s]", "")).cast("bigint")


def stopword_count(col, lang: str = "en") -> Column:
    stop = LANG_STOPWORDS[lang]
    return F.size(
        F.filter(words(F.lower(_c(col))), lambda w: w.isin(*stop))
    ).cast("bigint")


def cjk_count(col) -> Column:
    """CJK codepoint count (text_stats surface).

    NOTE: the regexp_replace formulation runs a per-char replace loop
    (the class matches nearly every char on latin text) and measurably
    degrades OTHER regex expressions sharing its projection (~5x on the
    full signal set — java.util.regex JIT profile pollution, SCALE.md
    r11).  Use ``has_cjk`` when only the boolean gate is needed."""
    return F.length(F.regexp_replace(_c(col), r"[^一-鿿]", "")).cast("bigint")


def has_cjk(col) -> Column:
    """Any CJK codepoint present — one lazy scan (rlike), no replace
    loop; the fast zh gate for lang_id and curate_text."""
    return _c(col).rlike("[一-鿿]")


def quality_from_parts(chars, toks, punct, stop) -> Column:
    """quality_score's arithmetic over ALREADY-COMPUTED component columns
    (chars / tokens-clamped-to-1 / punct / en-stopword counts).  Callers
    that need several text signals in one projection compute the counts
    once behind a projection boundary and combine here — inlining the
    full trees into one giant projection repeats the count subtrees and
    can push the generated code past JIT limits (curate_text, r11)."""
    chars = chars.cast("double")
    toks = toks.cast("double")
    punct = punct.cast("double")
    stop = stop.cast("double")
    return (
        F.lit(0.5) * F.least(chars / F.lit(500.0), F.lit(1.0))
        + F.lit(0.3) * (F.lit(1.0) - F.least(punct / toks, F.lit(1.0)))
        + F.lit(0.2) * F.least(stop / toks * F.lit(5.0), F.lit(1.0))
    )


def quality_score(col) -> Column:
    """Deterministic quality heuristic in [0,1]:
    0.5 * min(chars/500, 1)  (length)
    + 0.3 * (1 - min(punct/tokens, 1))  (punctuation burden)
    + 0.2 * min(stopwords_en/tokens * 5, 1)  (natural-language-ness)."""
    return quality_from_parts(
        char_count(col),
        F.greatest(token_count(col), F.lit(1)),
        punct_count(col),
        stopword_count(col, "en"),
    )


def lang_from_scores(scores: dict, cjk_any: Column) -> Column:
    """lang_id's CASE chain over ALREADY-COMPUTED per-language stopword
    scores + a BOOLEAN any-CJK gate (see quality_from_parts for why the
    split exists).  ``scores`` maps each LANG_ORDER language to its
    count."""
    # build CASE from the last tie-break backwards so earlier langs win ties
    best = None
    for lang in LANG_ORDER:
        s = scores[lang]
        cond = s > F.lit(0)
        for other in LANG_ORDER:
            if other == lang:
                continue
            prior = LANG_ORDER.index(other) < LANG_ORDER.index(lang)
            cond = cond & (
                (scores[other] < s) if prior else (scores[other] <= s)
            )
        best = F.when(cond, F.lit(lang)) if best is None else best.when(cond, F.lit(lang))
    best = best.otherwise(F.lit("und"))
    return F.when(cjk_any, F.lit("zh")).otherwise(best)


def lang_id(col) -> Column:
    """Stopword/codepoint language heuristic: zh if any CJK; otherwise the
    max stopword-hit language in LANG_ORDER (ties -> earlier); 'und' if no
    hits at all."""
    scores = {lang: stopword_count(col, lang) for lang in LANG_ORDER}
    return lang_from_scores(scores, has_cjk(col))


def fingerprint(col) -> Column:
    """Document fingerprint: md5 of casefolded, whitespace-collapsed text."""
    return F.md5(F.regexp_replace(F.lower(F.trim(_c(col))), r"\s+", " "))


def min_shingle_fingerprint(col, n: int = 5) -> Column:
    """Winnowing-style content fingerprint: min md5 over word n-gram shingles
    (stable under local edits away from the minimizing shingle)."""
    w = words(col)
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(w) - n, F.lit(0))),
        lambda i: F.md5(F.concat_ws(" ", F.slice(w, i + 1, n))),
    )
    return F.array_min(grams)


# --------------------------------------------------- chunking / scrubbing (r10)

def chunk_spans(col, chunk_chars: int = 2048, overlap: int = 256) -> Column:
    """ARRAY<STRUCT<chunk_id INT, char_start INT, chunk STRING>> — fixed
    character windows with ``overlap`` chars of left context, the standard
    long-document -> training-sample shaping op.  Stride is
    ``chunk_chars - overlap``; the last window is the remainder (never
    empty, never past the end).  Pure codegen: sequence + transform +
    substring — at 100 TB this is a narrow map, no shuffle, no Python."""
    if not 0 <= overlap < chunk_chars:
        raise ValueError(
            f"chunk_spans: need 0 <= overlap < chunk_chars, got "
            f"{overlap} / {chunk_chars}"
        )
    text = _c(col)
    stride = chunk_chars - overlap
    n_chunks = F.greatest(
        F.lit(1),
        F.ceil((F.length(text) - F.lit(overlap)) / F.lit(stride)).cast("int"),
    )
    return F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.cast("int").alias("chunk_id"),
            (i * stride).cast("int").alias("char_start"),
            F.substring(text, i * stride + 1, chunk_chars).alias("chunk"),
        ),
    )


def chunk_text(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_chars: int = 2048,
    overlap: int = 256,
):
    """(id_col, chunk_id, char_start, chunk) — one row per window.  The
    explode multiplies rows by ~len/stride; everything else is codegen.
    NULL-text documents keep one row with NULL chunk columns
    (explode_outer) so the id space survives for downstream joins/audits —
    silently vanishing ids would be indistinguishable from a dropped
    partition (r10 review finding)."""
    spans = chunk_spans(F.col(text_col), chunk_chars, overlap)
    return df.select(
        F.col(id_col), F.explode_outer(spans).alias("s")
    ).select(id_col, "s.chunk_id", "s.char_start", "s.chunk")


def vocab_stats(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 1,
):
    """Corpus vocabulary statistics — the pass a training pipeline runs to
    build/size a tokenizer vocabulary and spot contamination (boilerplate
    tokens with huge doc_freq): ``(token, term_freq, doc_freq)``, one row
    per distinct lowercased alnum token.

    Scale shape (100 TB): ONE corpus scan + tokenize, ONE aggregation —
    count(*) partially aggregates map-side to O(vocab) rows per partition
    (Zipf's heaviest tokens are exactly the ones partial aggregation
    compresses best), and count(DISTINCT doc) rides the same groupBy via
    Spark's expand/two-phase distinct-aggregate rewrite.  The first cut
    ran tf and doc-freq as two independent consumers of the uncached
    explode — two full scans and three shuffles for the same output (r11
    review finding).  No UDFs, no driver data.

    Tokenization = lowercase, split on non-alnum runs ([^a-z0-9]+) —
    identical semantics in Java regex and RE2/DuckDB, so the op has an
    exact cross-engine oracle (tests/test_text.py)."""
    toks = df.select(
        F.col(id_col).alias("__doc"),
        F.explode(
            F.regexp_extract_all(F.lower(_c(text_col)), F.lit("[a-z0-9]+"), F.lit(0))
        ).alias("token"),
    )
    out = toks.groupBy("token").agg(
        F.count("*").alias("term_freq"),
        F.count_distinct(F.col("__doc")).alias("doc_freq"),
    )
    if min_count > 1:
        out = out.filter(F.col("term_freq") >= min_count)
    return out


# Redaction patterns (java.util.regex — Spark's engine; the phone pattern
# uses a lookbehind, fine there).  Anchored on word-ish boundaries so
# replacements never chain into each other's placeholders.  Order matters:
# emails before phone-ish digit runs (an email's digits must not be
# half-eaten by the phone pattern first).
PII_PATTERNS = (
    ("EMAIL", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("IP", r"\b(?:\d{1,3}\.){3}\d{1,3}\b"),
    ("SSN", r"\b\d{3}-\d{2}-\d{4}\b"),
    # no trailing separator: the run ends on a digit, not on "[ -]?"
    ("CARD", r"\b\d(?:[ -]?\d){12,15}\b"),
    # country code OPTIONAL (ADVICE r10): the mandatory leading \d{1,3}
    # group meant the most common bare US shapes '555-123-4567' and
    # '(555) 123-4567' never matched while '+1 (555) 123-4567' did.
    # Three alternatives so the optional group can't shrink the minimum
    # to 8 bare digits (which would redact compact dates like 20260815 —
    # r11 review finding): explicit-+ international with >= 3 separated
    # digit groups ('+44 20 7946 0958', '+33 1 42 68 53 01' — the first
    # cut's {2,4} groups of \d{2,4} matched 5-digit non-phones like
    # 'diff +1 23 45', second r11 review finding; the lookbehind also
    # keeps '5+1 23 45 67' arithmetic untouched; the {1,4} groups then
    # need a >= 8-total-digit lookahead or 4-digit strings like
    # '+1 2 3 4' redact — ADVICE r12); NANP-ish shapes that
    # REQUIRE a separator after the area code; bare runs keep the
    # original >= 9-digit minimum.
    ("PHONE",
     r"(?<![\w.])\+(?=(?:\d[-. ]?){8,})\d{1,3}(?:[-. ]\d{1,4}){3,5}\b"
     r"|(?<![\w.])(?:\+?\d{1,3}[-. (]{0,2})?\(?\d{3}[-. )]{1,2}\d{3}[-. ]?\d{2,4}\b"
     r"|(?<![\w.])\+?\d{9,13}\b"),
)


def scrub_pii(col) -> Column:
    """Redact common PII shapes (emails, IPv4s, SSNs, card-like digit runs,
    phone numbers) to ``[TYPE]`` placeholders — the scrubbing pass every
    training-data pipeline runs before tokenization.  Heuristic by design
    (pipeline plumbing, not a compliance system) and fully codegen: five
    chained regexp_replace expressions, no Python in the hot path."""
    out = _c(col)
    for name, pat in PII_PATTERNS:
        out = F.regexp_replace(out, pat, f"[{name}]")
    return out


def pii_count(col) -> Column:
    """How many PII placeholders a scrub WOULD insert — the audit/filter
    column (e.g. drop documents with > N hits instead of scrubbing)."""
    out = _c(col)
    total = F.lit(0)
    for name, pat in PII_PATTERNS:
        total = total + F.size(F.split(out, pat)) - 1
        out = F.regexp_replace(out, pat, f"[{name}]")
    return total.cast("bigint")
