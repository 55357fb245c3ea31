"""SQ8 decode-free scan A/B at 1M x 1536 (VERDICT r11 task 8).

The r11 wide-dim probe showed SQ8 np16 search at 3.3x the raw-float scan
(vs 1.6x at dim 64) — decode-bound: in the sparse-probing regime each
corpus row is scored against ~nq*nprobe/nlist ~ 2 queries, so the
per-batch decode (3-4 full f64 passes over n x d) dwarfs the useful MACs.

Decode-free expansion with x̂ = a + b∘c (a = vmin + 128.5*b, b = vdiff/255):

    L2²(q, x̂) = Σα²  −  2 (α∘b) @ cᵀ  +  (b²)ᵀ c²       with α = q − a

- Σα²: per query, O(nq·d).
- (b²)ᵀc²: per CORPUS ROW and query-independent — precomputable at
  build/warm time and shipped as one extra f64 column (8 B/row, 0.5% of
  the 1.5 KB codes at dim 1536).
- the cross term is ONE gemm over the f64-cast codes — no decoded
  (n x d) float materialization, no per-batch norm pass.

This probe measures the per-batch kernel cost of both plans on identical
codes, in the two regimes the engine actually runs:
- dense/bulk: nq = 256 scored against every row (gemm-dominated);
- sparse-probing: nq_eff = 2 per row (the np16/nlist=2048 regime —
  decode-dominated).

Numeric note: the decode path rounds x̂ to float32 (FAISS parity) before
the f64 distance expansion; the decode-free path uses the exact f64 x̂
implicitly, so low-order distance bits differ — promotion therefore
changes SQ8 scan tie-breaks and needs its own recall re-measurement
(recorded by the A/B below as a rank-agreement check).

Run: python tools/sq8_decodefree_probe.py [n_rows] [dim]
Appends the receipt to SCALE.md.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from duckdb_faiss_ext_spark.functions.quantize import (  # noqa: E402
    sq8_decode_np,
    sq8_encode_np,
)


def l2_decode_path(q, codes, vmin, vdiff):
    """The shipped kernel: decode to float32, then the f64 expansion
    (operators/topk.py + metrics._l2)."""
    x = sq8_decode_np(codes, vmin, vdiff, np.float32)
    qd = q.astype(np.float64)
    xd = x.astype(np.float64)
    qq = np.einsum("ij,ij->i", qd, qd)[:, None]
    xx = np.einsum("ij,ij->i", xd, xd)[None, :]
    d = qq + xx - 2.0 * (qd @ xd.T)
    return np.maximum(d, 0.0)


def precompute_rownorm(codes, vmin, vdiff):
    """(b²)ᵀc² + 2(a∘b)·c + Σa² per corpus row == ||x̂||² in exact f64 —
    the build/warm-time pass promotion would run once per index."""
    b = (vdiff.astype(np.float64) / 255.0)
    a = vmin.astype(np.float64) + 128.5 * b
    cf = codes.astype(np.float64)
    return (
        (cf * cf) @ (b * b)
        + cf @ (2.0 * a * b)
        + np.dot(a, a)
    )


def l2_decodefree(q, codes, vmin, vdiff, rownorm):
    """Decode-free scan: one f64 cast + one gemm + broadcast adds."""
    b = (vdiff.astype(np.float64) / 255.0)
    a = vmin.astype(np.float64) + 128.5 * b
    qd = q.astype(np.float64)
    qq = np.einsum("ij,ij->i", qd, qd)[:, None]
    qa = qd @ a  # (nq,)
    cf = codes.astype(np.float64)
    cross = (qd * b) @ cf.T  # (nq, n)
    d = qq - 2.0 * qa[:, None] + rownorm[None, :] - 2.0 * cross
    return np.maximum(d, 0.0)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 1536
    batch = 65_536
    rng = np.random.default_rng(5)
    results: dict = {"n": n, "dim": dim, "batch": batch}
    results["host_load_start"] = round(os.getloadavg()[0], 2)

    # clusterable-ish corpus: mog so near-ties exist (the regime where the
    # f32-decode vs exact-f64 numeric difference could flip ranks)
    centers = rng.standard_normal((64, dim)).astype(np.float32)
    vmin_t = None
    q256 = rng.standard_normal((256, dim)).astype(np.float32)

    # train on one batch (matches sq8_train semantics: per-dim min/max)
    first = (
        centers[rng.integers(0, 64, batch)]
        + 0.1 * rng.standard_normal((batch, dim)).astype(np.float32)
    )
    vmin = first.min(axis=0)
    vmax = first.max(axis=0)
    vdiff = vmax - vmin
    vmin_t = vmin

    t_dec = t_free = t_pre = 0.0
    agree = total = 0
    n_batches = max(n // batch, 1)
    for i in range(n_batches):
        xb = (
            centers[rng.integers(0, 64, batch)]
            + 0.1 * rng.standard_normal((batch, dim)).astype(np.float32)
        )
        codes = sq8_encode_np(xb, vmin_t, vdiff)

        t0 = time.perf_counter()
        rownorm = precompute_rownorm(codes, vmin_t, vdiff)
        t_pre += time.perf_counter() - t0

        # dense regime A/B on the first 2 batches only (gemm-bound — the
        # point is the sparse regime; keep the probe short)
        if i < 2:
            t0 = time.perf_counter()
            d_a = l2_decode_path(q256, codes, vmin_t, vdiff)
            t_dense_dec = time.perf_counter() - t0
            t0 = time.perf_counter()
            d_b = l2_decodefree(q256, codes, vmin_t, vdiff, rownorm)
            t_dense_free = time.perf_counter() - t0
            results.setdefault("dense_decode_sec", 0.0)
            results.setdefault("dense_free_sec", 0.0)
            results["dense_decode_sec"] += round(t_dense_dec, 3)
            results["dense_free_sec"] += round(t_dense_free, 3)
            # rank agreement at k=10 (the promotion-blocking check)
            ia = np.argsort(d_a, axis=1, kind="stable")[:, :10]
            ib = np.argsort(d_b, axis=1, kind="stable")[:, :10]
            agree += int((ia == ib).all(axis=1).sum())
            total += ia.shape[0]

        # sparse-probing regime: 2 effective queries per batch slice
        q2 = q256[:2]
        t0 = time.perf_counter()
        l2_decode_path(q2, codes, vmin_t, vdiff)
        t_dec += time.perf_counter() - t0
        t0 = time.perf_counter()
        l2_decodefree(q2, codes, vmin_t, vdiff, rownorm)
        t_free += time.perf_counter() - t0

    results["sparse_decode_sec"] = round(t_dec, 2)
    results["sparse_free_sec"] = round(t_free, 2)
    results["sparse_speedup"] = round(t_dec / max(t_free, 1e-9), 2)
    results["dense_speedup"] = round(
        results["dense_decode_sec"] / max(results["dense_free_sec"], 1e-9), 2
    )
    results["precompute_sec_total"] = round(t_pre, 2)
    results["rank_agreement_k10"] = f"{agree}/{total}"
    results["host_load_end"] = round(os.getloadavg()[0], 2)

    lines = [
        f"\n### SQ8 decode-free scan A/B, {n:,} x {dim} (r12, VERDICT r11 task 8)\n",
        "| metric | value |",
        "|---|---|",
    ]
    for k, v in results.items():
        lines.append(f"| {k} | {v} |")
    out = "\n".join(lines) + "\n"
    print(out)
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "SCALE.md"), "a") as f:
        f.write(out)


if __name__ == "__main__":
    main()
