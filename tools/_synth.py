"""Shared deterministic vector generator for the scale probes.

One definition of the hash-fraction corpus (fract(sin(id*1000+j)*43758.5453),
the classic GLSL hash) so every probe series synthesizes the IDENTICAL
vectors — three previously copy-pasted generators could drift independently
and silently break cross-probe SCALE.md comparability (r4 review)."""

from __future__ import annotations

import pyspark.sql.functions as F


def synth_vectors(
    spark,
    n: int,
    dim: int,
    lo: int = 0,
    parts: int = 32,
    id_col: str = "label",
    vec_col: str = "vector",
):
    """(id_col BIGINT, vec_col ARRAY<FLOAT>) — rows lo..lo+n, fully codegen."""
    return spark.range(lo, lo + n, 1, parts).select(
        F.col("id").alias(id_col),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda j: (
                F.sin(F.col("id") * 1000 + j) * 43758.5453
                - F.floor(F.sin(F.col("id") * 1000 + j) * 43758.5453)
            ).cast("float"),
        ).alias(vec_col),
    )


def synth_clusterable(
    spark,
    n: int,
    dim: int,
    n_clusters: int = 256,
    spread: float = 0.05,
    lo: int = 0,
    parts: int = 32,
    id_col: str = "label",
    vec_col: str = "vector",
):
    """Mixture-of-Gaussians-like CLUSTERABLE corpus (VERDICT r8 task 3).

    The hash corpus above is uniform on [0,1)^dim — the coarse-quantizer
    oracle study (tools/recall_structure_study.py) proved it CAPS IVF
    recall at small nprobe (~0.48 @ np16/2048), so every recall number it
    produces is a floor, not a typical value.  This generator places
    ``n_clusters`` deterministic centers (hash of (cid, j)) in [0,1)^dim
    and spreads each point uniformly ±spread around its center
    (cid = id % n_clusters): center separation ~sqrt(dim/6) dwarfs the
    noise norm ~spread*sqrt(dim/3), the regime real trained embeddings
    live in (the reference's conformance corpus is REAL embeddings,
    go/cmd/create_trec/main.go:32).  Fully codegen — no UDF, no driver
    data."""
    cid = F.col("id") % n_clusters

    def h(expr):
        s = F.sin(expr) * 43758.5453
        return s - F.floor(s)

    return spark.range(lo, lo + n, 1, parts).select(
        F.col("id").alias(id_col),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda j: (
                h(cid * 7919 + j * 104729)                 # center coord
                + (h(F.col("id") * 1000 + j + 0.5) - 0.5)  # point noise
                * (2.0 * spread)
            ).cast("float"),
        ).alias(vec_col),
    )


def synth_docs(
    spark,
    n: int,
    words_per_doc: int = 120,
    vocab_n: int = 20_000,
    degenerate_every: int = 0,
    partitions: int = 64,
):
    """Deterministic synthetic document corpus, fully codegen (no driver
    data, no UDFs): each doc = ``words_per_doc`` tokens from a synthetic
    vocabulary with a cubic power-law bias (Zipf-ish: a few tokens appear
    in nearly every doc).  ``degenerate_every`` > 0 makes every k-th doc
    a two-token repetition ("spam ham spam ham ...") so repetition/
    curation ops have known-degenerate rows to catch — the shared corpus
    of tools/{text,curation}_scale_probe.py and bench.py's curation leg."""
    import pyspark.sql.functions as F

    def h(expr):
        s = F.sin(expr) * 43758.5453
        return s - F.floor(s)

    def word(j):
        return F.concat(
            F.lit("w"),
            F.floor(
                F.pow(h(F.col("id") * 131 + j * 7919), 3.0) * vocab_n
            ).cast("int").cast("string"),
        )

    normal = F.concat_ws(
        " ", F.transform(F.sequence(F.lit(0), F.lit(words_per_doc - 1)), word)
    )
    text = normal
    if degenerate_every > 0:
        degenerate = F.concat_ws(
            " ", F.array_repeat(F.lit("spam ham"), words_per_doc // 2)
        )
        text = F.when(
            F.col("id") % degenerate_every == 0, degenerate
        ).otherwise(normal)
    return spark.range(0, n, 1, partitions).select(
        F.col("id").alias("doc_id"), text.alias("text")
    )
