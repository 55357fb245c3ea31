"""FAISS index-factory string parser.

The reference hands the factory string to ``faiss::index_factory``
(faiss_extension.cpp:112).  We accept every string observed in the reference
repo (SURVEY.md §2.1) and map it onto the engine's physical strategies:

- ``Flat``            -> exact brute-force scan (the semantic ground truth)
- ``IDMap,...``       -> user-supplied BIGINT labels allowed
- ``HNSW<m>``         -> navigable-small-world graph segments (one graph per
                         bounded partition, operators/nsw.py); search is a
                         multi-entry beam honoring ``efSearch``
- ``IVF<n>``/"IVF<n>_HNSW<m>" -> KMeans(n) coarse quantizer; search prunes to
                         ``nprobe`` nearest clusters (needs training).  With
                         the HNSW component, one graph per cluster and probed
                         clusters are beam-searched instead of scanned.
                         NOTE: per-cluster graphs only build for clusters of
                         at least ``min_graph_rows`` rows (default 2^20 —
                         measured A/Bs show per-cluster beams losing to the
                         probed-cluster BLAS scan below that, SCALE.md);
                         below it the composite is plan-identical to plain
                         IVF and efSearch is inert.  Pass
                         ``params={"min_graph_rows": 0}`` to force graphs;
                         the engine warns once when an add builds no graphs.
- ``SQ8`` suffix       -> scalar quantization storage tier (public FAISS
                         ``index_factory`` grammar, e.g. ``IVF1024,SQ8``):
                         vectors stored as per-dim affine uint8 codes
                         (functions/quantize.py, FAISS Codec8bit formulas),
                         decoded lazily per scanned batch in front of the
                         search kernels — 4x smaller at rest and in cache.
                         Composes with Flat and IVF; PQ and HNSW composites
                         are rejected loudly (PQ already replaces storage;
                         graph builds would quantize twice).
- ``PQ<m>[x<b>]`` suffix -> product quantization: vectors stored as m b-bit
                         code ids (operators/pq.py), searched with ADC lookup
                         tables; composes with IVF pruning (needs training).
                         In the IVF composite, codes quantize per-cluster
                         RESIDUALS and search builds per-(query, probed
                         cluster) LUTs — faiss IndexIVFPQ semantics; the
                         residual-vs-raw ADC error tightening is pinned in
                         tests/test_pq.py.  Standalone ``PQ<m>`` quantizes
                         raw vectors (faiss IndexPQ).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from duckdb_faiss_ext_spark.errors import FaissSparkError


@dataclass
class IndexSpec:
    factory: str
    idmap: bool = False
    kind: str = "flat"  # flat | hnsw | ivf
    nlist: int = 0  # IVF cluster count
    hnsw_m: int = 0
    pq_m: int = 0  # PQ subspace count (0 = no PQ, full-precision storage)
    pq_nbits: int = 8  # bits per PQ code id
    sq: int = 0  # scalar-quantizer bits (8 = SQ8 storage tier, 0 = none)
    needs_training: bool = False
    extras: list[str] = field(default_factory=list)


_IVF_RE = re.compile(r"^IVF(\d+)(?:_HNSW(\d+))?$")
_HNSW_RE = re.compile(r"^HNSW(\d+)?$")
_PQ_RE = re.compile(r"^PQ(\d+)(?:x(\d+))?$")


def parse_factory(factory: str) -> IndexSpec:
    spec = IndexSpec(factory=factory)
    parts = [p.strip() for p in factory.split(",") if p.strip()]
    if not parts:
        raise FaissSparkError(f"Empty factory string: {factory!r}")
    if parts[0] == "IDMap" or parts[0] == "IDMap2":
        spec.idmap = True
        parts = parts[1:]
    if not parts:
        raise FaissSparkError(f"Factory string has no index type: {factory!r}")
    head = parts[0]
    m = _IVF_RE.match(head)
    if m:
        spec.kind = "ivf"
        spec.nlist = int(m.group(1))
        spec.hnsw_m = int(m.group(2) or 0)
        spec.needs_training = True
    elif _HNSW_RE.match(head):
        spec.kind = "hnsw"
        spec.hnsw_m = int(_HNSW_RE.match(head).group(1) or 32)
    elif head == "Flat":
        spec.kind = "flat"
    elif head == "SQ8":
        # standalone IndexScalarQuantizer: flat scan over SQ8 codes
        spec.kind = "flat"
        spec.sq = 8
        spec.needs_training = True
    elif _PQ_RE.match(head):
        # standalone IndexPQ ("PQ8"): flat scan over ADC codes
        pq = _PQ_RE.match(head)
        spec.kind = "flat"
        spec.pq_m = int(pq.group(1))
        spec.pq_nbits = int(pq.group(2) or 8)
        spec.needs_training = True
    else:
        raise FaissSparkError(f"Unsupported index factory component: {head!r}")
    for extra in parts[1:]:
        pq = _PQ_RE.match(extra)
        if pq:
            spec.pq_m = int(pq.group(1))
            spec.pq_nbits = int(pq.group(2) or 8)
            # codebooks are fitted on the first add (same train-in-finalize
            # flow as IVF, faiss_extension.cpp:583)
            spec.needs_training = True
            spec.extras.append(extra)
        elif extra == "SQ8":
            # scalar-quantized storage tier (faiss index_factory "SQ8"):
            # (vmin, vdiff) are fitted on the first add, same
            # train-in-finalize flow as IVF/PQ
            spec.sq = 8
            spec.needs_training = True
            spec.extras.append(extra)
        elif extra == "Flat" or _HNSW_RE.match(extra):
            spec.extras.append(extra)
        else:
            raise FaissSparkError(f"Unsupported index factory component: {extra!r}")
    return spec
