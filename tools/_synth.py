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
