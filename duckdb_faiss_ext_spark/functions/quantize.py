"""Scalar quantization (SQ8) for embedding columns — the storage lever a
100 TB corpus pulls before anything else: float32 embeddings at dim 1536
are 6 KB/row; SQ8 codes are 1.5 KB with ~0.2% reconstruction error, and
parquet/cache both store them byte-packed.

FAISS parity (Codec8bit, ScalarQuantizer QT_8bit — public FAISS source):
train learns per-dim [vmin, vmax] over a corpus/sample; encode clamps
x_norm = (x_j - vmin_j)/vdiff_j to [0, 1] then TRUNCATES
code_j = floor(255 * x_norm); decode reconstructs at the BIN CENTER
x̂_j = vmin_j + (code_j + 0.5)/255 * vdiff_j.  These are FAISS's exact
encode/decode formulas, so codes are interchangeable with FAISS-encoded
data; max per-dim error is half a bin, vdiff/510 (ADVICE r9: the previous
round-encode/edge-decode pair was self-consistent with the same bound but
not bit-compatible).  Spark-first: encode/decode are pure ``zip_with``
column expressions against literal parameter arrays — whole-stage codegen,
no Python in the hot path; train is ONE map-side-combinable aggregation.

This is storage-layer tooling (beyond the reference, which has no SQ
factories in its test surface): compress an embeddings table at rest,
decode lazily in front of any search operator — brute-force, simjoin, or
an engine index fed by the decoded column.
"""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

__all__ = [
    "sq8_train",
    "sq8_encode",
    "sq8_decode",
    "sq8_encode_np",
    "sq8_decode_np",
    "sq8_reconstruction_error",
    "sq8_affine",
    "sq8_rownorm",
    "sq8_l2_pairwise",
]


def sq8_encode_np(x: np.ndarray, vmin: np.ndarray, vdiff: np.ndarray) -> np.ndarray:
    """Kernel/driver-side encode mirroring the JVM ``sq8_encode``
    expression term-for-term: clamp x_norm to [0,1], truncating
    code = floor(255 * x_norm), STORED as int8 (code - 128); degenerate
    (vdiff <= 0) dims store -128 (decode = vmin, exact).  The single
    numpy encode every non-JVM path shares, so codes are bit-identical
    across paths (the decode twin is ``sq8_decode_np``)."""
    vmin = vmin.astype(np.float64)
    vdiff = vdiff.astype(np.float64)
    codes = np.clip(
        np.floor(
            (x.astype(np.float64) - vmin)
            / np.where(vdiff > 0, vdiff, 1.0)
            * 255.0
        ),
        0,
        255,
    )
    codes = np.where(vdiff > 0, codes, 0.0)
    return (codes - 128).astype(np.int8)


def sq8_decode_np(
    raw: np.ndarray, vmin: np.ndarray, vdiff: np.ndarray, dtype=np.float32
) -> np.ndarray:
    """Kernel-side decode of STORED codes (int8, offset -128): the single
    numpy implementation every Arrow kernel shares (operators/topk.py,
    operators/simjoin.py) — f64 math mirroring the JVM ``sq8_decode``
    expression term-for-term, then ONE round to ``dtype``, so all decode
    paths are bit-identical.  ``raw`` is (n, dim), any integer or float
    dtype holding the stored code values."""
    return (
        (raw.astype(np.float64) + 128.5) / 255.0 * vdiff.astype(np.float64)
        + vmin.astype(np.float64)
    ).astype(dtype)


def sq8_train(df: DataFrame, vec_col: str = "embedding") -> tuple:
    """Per-dimension (vmin, vdiff) float32 arrays learned from ``df`` —
    one narrow mapInArrow scan emitting O(dim) partial min/max rows per
    Arrow batch (collected and combined driver-side; bounded by
    batches x dim rows).  r14 (guide §4.2): the previous posexplode +
    groupBy(pos) plan pushed n x dim ROWS through Generate + two
    HashAggregates — at 1M x 64 that is a 64M-row explode for 64 numbers;
    the batched kernel computes the same per-dim min/max/counts/NaN flags
    with three vectorized reductions per batch.  Detection semantics are
    identical (same error messages, pinned by tests/test_quantize.py):
    null ROWS contribute nothing, null COMPONENTS count into n_all but
    not n, ragged rows surface as per-dim count gaps, NaN flags per dim."""
    import pyarrow as pa

    def partials(batches):
        for rb in batches:
            vcol = rb.column(0)
            nrows = rb.num_rows
            if nrows == 0:
                continue
            n_null_rows = vcol.null_count
            lens = vcol.value_lengths().to_numpy(zero_copy_only=False)
            if n_null_rows:
                lens = lens[~np.isnan(lens.astype(np.float64))]
            lens = lens.astype(np.int64, copy=False)
            if len(lens) == 0:
                continue
            flat = vcol.flatten()
            uniform = len(np.unique(lens)) == 1
            if uniform and flat.null_count == 0:
                d = int(lens[0])
                if d == 0:
                    continue
                x = flat.to_numpy(zero_copy_only=False).reshape(-1, d)
                lo = np.minimum.reduce(x, axis=0).astype(np.float64)
                hi = np.maximum.reduce(x, axis=0).astype(np.float64)
                has_nan = np.isnan(x).any(axis=0)
                cnt = np.full(d, x.shape[0], dtype=np.int64)
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(np.arange(d, dtype=np.int64)),
                        pa.array(lo),
                        pa.array(hi),
                        pa.array(cnt),
                        pa.array(cnt),
                        pa.array(has_nan),
                    ],
                    names=["j", "lo", "hi", "n", "n_all", "has_nan"],
                )
                continue
            # slow path (ragged rows or null components): per-row combine,
            # faithful to the posexplode semantics
            dmax = int(lens.max())
            if dmax == 0:
                continue
            lo = np.full(dmax, np.inf)
            hi = np.full(dmax, -np.inf)
            n = np.zeros(dmax, dtype=np.int64)
            n_all = np.zeros(dmax, dtype=np.int64)
            has_nan = np.zeros(dmax, dtype=bool)
            for row in vcol.to_pylist():
                if row is None:
                    continue
                for j, v in enumerate(row):
                    n_all[j] += 1
                    if v is None:
                        continue
                    n[j] += 1
                    if v != v:  # NaN
                        has_nan[j] = True
                        continue
                    if v < lo[j]:
                        lo[j] = v
                    if v > hi[j]:
                        hi[j] = v
            seen = n_all > 0
            js = np.flatnonzero(seen)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(js.astype(np.int64)),
                    pa.array(lo[js]),
                    pa.array(hi[js]),
                    pa.array(n[js]),
                    pa.array(n_all[js]),
                    pa.array(has_nan[js]),
                ],
                names=["j", "lo", "hi", "n", "n_all", "has_nan"],
            )

    part_rows = (
        df.select(F.col(vec_col).cast("array<float>").alias(vec_col))
        .mapInArrow(
            partials,
            schema=(
                "j bigint, lo double, hi double, n bigint, n_all bigint, "
                "has_nan boolean"
            ),
        )
        .collect()
    )
    comb: dict = {}
    for r in part_rows:
        j = r["j"]
        c = comb.get(j)
        if c is None:
            comb[j] = [r["lo"], r["hi"], r["n"], r["n_all"], r["has_nan"]]
        else:
            c[0] = min(c[0], r["lo"])
            c[1] = max(c[1], r["hi"])
            c[2] += r["n"]
            c[3] += r["n_all"]
            c[4] = c[4] or r["has_nan"]
    rows = [
        {"j": j, "lo": c[0], "hi": c[1], "n": c[2], "n_all": c[3],
         "has_nan": c[4]}
        for j, c in comb.items()
    ]
    if not rows:
        # explicit instead of max()-of-empty (ADVICE r9): empty frame,
        # all-null column, or a non-array column all land here
        raise ValueError(
            f"sq8_train: no vector values found in column {vec_col!r} "
            "(empty DataFrame or all-null column)"
        )
    # NaN poisons the range silently otherwise (ADVICE r10): Spark's
    # NaN-is-largest ordering makes F.max return NaN, so one NaN component
    # would corrupt that dim's vdiff and every later encode/decode
    nan_dims = sorted(r["j"] for r in rows if r["has_nan"])
    if nan_dims:
        raise ValueError(
            f"sq8_train: NaN vector components in column {vec_col!r} at "
            f"dims {nan_dims[:8]}{'...' if len(nan_dims) > 8 else ''}; "
            "filter or impute them before training"
        )
    # null elements inside fixed-length vectors are a DIFFERENT defect
    # than ragged lengths (ADVICE r10): count(v) skips nulls, count(*)
    # doesn't — a gap between them names the real problem
    null_dims = sorted(r["j"] for r in rows if r["n"] != r["n_all"])
    if null_dims:
        raise ValueError(
            f"sq8_train: null vector components in column {vec_col!r} at "
            f"dims {null_dims[:8]}{'...' if len(null_dims) > 8 else ''}; "
            "SQ8 needs fully-populated vectors"
        )
    dim = max(r["j"] for r in rows) + 1
    n_per_dim = {r["j"]: r["n_all"] for r in rows}
    if len(set(n_per_dim.values())) > 1 or len(n_per_dim) != dim:
        raise ValueError(
            f"sq8_train: ragged vectors in column {vec_col!r} — per-dim "
            f"value counts differ ({min(n_per_dim.values())}.."
            f"{max(n_per_dim.values())} across {len(n_per_dim)} of {dim} "
            "dims); SQ8 needs a fixed dimension"
        )
    vmin = np.zeros(dim, dtype=np.float32)
    vdiff = np.zeros(dim, dtype=np.float32)
    for r in rows:
        vmin[r["j"]] = r["lo"]
        # degenerate (constant) dims keep vdiff 0 -> every code 0, exact
        vdiff[r["j"]] = r["hi"] - r["lo"]
    return vmin, vdiff


def _lit_arr(a: np.ndarray):
    return F.array(*[F.lit(float(v)) for v in a])


def sq8_encode(
    df: DataFrame,
    vmin: np.ndarray,
    vdiff: np.ndarray,
    vec_col: str = "embedding",
    out_col: str = "codes",
) -> DataFrame:
    """float32 vector -> array<tinyint> codes (stored code - 128 so the
    unsigned 0..255 range fits Spark's signed byte).  FAISS Codec8bit
    encode: clamp x_norm to [0, 1], code = floor(255 * x_norm) (truncating,
    255 only at x_norm = 1).  Pure codegen."""
    enc = F.zip_with(
        F.col(vec_col),
        F.arrays_zip(_lit_arr(vmin), _lit_arr(vdiff)),
        lambda v, p: F.when(p["1"] <= 0.0, F.lit(-128)).otherwise(
            F.least(
                F.lit(255),
                F.greatest(F.lit(0), F.floor((v - p["0"]) / p["1"] * 255.0)),
            ).cast("int")
            - 128
        ).cast("tinyint"),
    )
    return df.withColumn(out_col, enc).drop(vec_col)


def sq8_decode(
    df: DataFrame,
    vmin: np.ndarray,
    vdiff: np.ndarray,
    codes_col: str = "codes",
    out_col: str = "embedding",
    drop_codes: bool = True,
) -> DataFrame:
    """array<tinyint> codes -> reconstructed float32 vector at the BIN
    CENTER, FAISS Codec8bit decode: x̂ = vmin + (code + 0.5)/255 * vdiff.
    Lazy codegen: put this in front of any search operator and only
    scanned rows pay the decode."""
    dec = F.zip_with(
        F.col(codes_col),
        F.arrays_zip(_lit_arr(vmin), _lit_arr(vdiff)),
        lambda c, p: (
            p["0"] + (c.cast("int") + 128 + F.lit(0.5)) / 255.0 * p["1"]
        ).cast("float"),
    )
    out = df.withColumn(out_col, dec)
    return out.drop(codes_col) if drop_codes else out


def sq8_reconstruction_error(vmin: np.ndarray, vdiff: np.ndarray) -> float:
    """Worst-case per-dimension absolute error: half a quantization step."""
    return float((vdiff / 255.0 / 2.0).max())


def sq8_affine(vmin: np.ndarray, vdiff: np.ndarray) -> tuple:
    """(a, b) float64 such that the decoded value x̂ = a + b * code for
    STORED codes (int8, offset -128): b = vdiff/255, a = vmin + 128.5*b —
    exactly ``sq8_decode_np``'s f64 expression regrouped."""
    b = vdiff.astype(np.float64) / 255.0
    a = vmin.astype(np.float64) + 128.5 * b
    return a, b


def sq8_rownorm(codes: np.ndarray, vmin: np.ndarray, vdiff: np.ndarray) -> np.ndarray:
    """||x̂||² per code row in exact float64 (no decode materialization):
    (b²)·c² + 2(ab)·c + a·a.  One squaring pass + two matvecs — the
    query-independent half of the decode-free L2 expansion; precompute it
    once per batch/block and reuse across every query."""
    a, b = sq8_affine(vmin, vdiff)
    cf = np.ascontiguousarray(codes, dtype=np.float64)
    return (cf * cf) @ (b * b) + cf @ (2.0 * a * b) + float(np.dot(a, a))


def sq8_l2_pairwise(
    q: np.ndarray,
    codes: np.ndarray,
    vmin: np.ndarray,
    vdiff: np.ndarray,
    rownorm: "np.ndarray | None" = None,
    dtype: type = np.float32,
) -> np.ndarray:
    """Decode-free squared L2 between float queries (nq, d) and SQ8 codes
    (n, d stored int8 values): with x̂ = a + b∘c,

        L2²(q, x̂) = ||q||² − 2 q·a + ||x̂||² − 2 (q∘b)·c

    — one f64 gemm over the cast codes plus broadcast adds; no (n, d)
    float decode materialization, no per-batch norm pass when ``rownorm``
    (``sq8_rownorm``) is supplied.  Measured 10.3x the decode path in the
    sparse-probing regime and 4.6x dense at 1M x 1536 (SCALE.md r12,
    tools/sq8_decodefree_probe.py).

    Numeric contract: distances are the exact-f64 expansion of the EXACT
    decoded values, NOT of their float32 rounding — they differ from the
    decode path in low-order bits (more accurate; the probe measured
    512/512 k=10 rank agreement on a near-tie mog corpus).  ALL SQ8 L2
    scan paths must route through this one function so driver and bulk
    plans stay result-identical."""
    a, b = sq8_affine(vmin, vdiff)
    qd = np.ascontiguousarray(q, dtype=np.float64)
    cf = np.ascontiguousarray(codes, dtype=np.float64)
    if rownorm is None:
        rownorm = sq8_rownorm(cf, vmin, vdiff)
    qq = np.einsum("ij,ij->i", qd, qd)
    qa = qd @ a
    cross = (qd * b) @ cf.T
    d = (qq - 2.0 * qa)[:, None] + rownorm[None, :] - 2.0 * cross
    return np.maximum(d, 0.0).astype(dtype, copy=False)
