"""Is 4M/2048 recall data-bound? (VERDICT r7 task 5 adjudication)

The probe corpus (`tools/_synth.py`) is hash-UNIFORM iid in [0,1)^dim then
unit-normalized — near-uniform on the positive orthant.  On such data true
nearest neighbors are weakly concentrated: the clusters holding a query's
exact top-k spread far down the query's coarse-score ranking, so nprobe
must grow toward nlist to cover them — no training knob fixes that,
because it is a property of the DATA, not the quantizer.

This study measures that directly, pure numpy, at a scaled-down mirror
(n=262144, nlist=256, dim=64 — same n/nlist as 4M/2048):

1. build the hash corpus + kmeans coarse quantizer (seeded, same sample
   policy as the engine: 256/centroid);
2. exact top-10 for 48 queries;
3. for each true neighbor, find the RANK of its cluster in the query's
   coarse ordering -> the recall@nprobe curve ANY IVF search would get;
4. repeat on a STRUCTURED corpus (mixture of 256 Gaussians) to show the
   same quantizer on clusterable data reaches high recall at small nprobe.

Usage: python tools/recall_structure_study.py [out.json]
"""

import json
import os
import sys

import numpy as np


def kmeans(x, k, rng, iters=20):
    cents = x[rng.choice(len(x), k, replace=False)].astype(np.float64)
    for _ in range(iters):
        d2 = (
            (x**2).sum(1, keepdims=True)
            - 2.0 * (x @ cents.T)
            + (cents**2).sum(1)[None, :]
        )
        lab = d2.argmin(1)
        for j in range(k):
            sel = x[lab == j]
            if len(sel):
                cents[j] = sel.mean(0)
    return cents.astype(np.float32)


def study(corpus, name, k_idx, nq=48, topk=10):
    n, dim = corpus.shape
    rng = np.random.default_rng(42)
    sample = corpus[rng.choice(n, min(n, 256 * k_idx), replace=False)]
    cents = kmeans(sample, k_idx, rng)
    assign = np.empty(n, dtype=np.int32)
    step = 1 << 16
    for i in range(0, n, step):
        assign[i : i + step] = (corpus[i : i + step] @ cents.T).argmax(1)
    sizes = np.bincount(assign, minlength=k_idx)
    q = corpus[:nq]
    # exact IP top-k (queries are corpus rows 0..nq)
    scores = q @ corpus.T
    exact = np.argsort(-scores, axis=1)[:, :topk]
    # coarse ranking of every cluster per query
    crank = np.argsort(-(q @ cents.T), axis=1)  # (nq, k) cluster ids by rank
    pos = np.empty((nq, k_idx), dtype=np.int32)
    for i in range(nq):
        pos[i, crank[i]] = np.arange(k_idx)
    # for each true neighbor: the coarse rank of its cluster
    nb_rank = pos[np.arange(nq)[:, None], assign[exact]]  # (nq, topk)
    out = {
        "corpus": name,
        "n": int(n),
        "nlist": int(k_idx),
        "cluster_max_share_vs_even": round(float(sizes.max() * k_idx / n), 2),
        "recall_at_nprobe": {
            str(np_): round(float((nb_rank < np_).mean()), 4)
            for np_ in (4, 16, 64, 128, 256)
        },
        # nprobe needed per query to reach recall 0.9 of true neighbors
        "nprobe_for_r90_median": int(
            np.median(np.quantile(nb_rank, 0.9, axis=1)) + 1
        ),
    }
    print(json.dumps(out), flush=True)
    return out


def main():
    n, dim, k_idx = 262144, 64, 256
    # hash corpus: same construction as tools/_synth.py, normalized
    ids = np.arange(n, dtype=np.float64)[:, None]
    js = np.arange(dim, dtype=np.float64)[None, :]
    v = np.sin(ids * 1000 + js) * 43758.5453
    hash_corpus = (v - np.floor(v)).astype(np.float32)
    hash_corpus /= np.linalg.norm(hash_corpus, axis=1, keepdims=True)

    rng = np.random.default_rng(7)
    centers = rng.standard_normal((k_idx, dim)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    which = rng.integers(0, k_idx, n)
    structured = centers[which] + 0.15 * rng.standard_normal((n, dim)).astype(
        np.float32
    )
    structured /= np.linalg.norm(structured, axis=1, keepdims=True)

    res = [
        study(hash_corpus, "hash_uniform (the probe corpus)", k_idx),
        study(structured, "mixture_of_256_gaussians", k_idx),
    ]
    dst = sys.argv[1] if len(sys.argv) > 1 else "tools/out_r8/recall_structure.json"
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    with open(dst, "w") as f:
        json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()
