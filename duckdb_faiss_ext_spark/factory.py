"""FAISS index-factory string parser.

The reference hands the factory string to ``faiss::index_factory``
(faiss_extension.cpp:112).  We accept every string observed in the reference
repo (SURVEY.md §2.1) and map it onto the engine's physical strategies:

- ``Flat``            -> exact brute-force scan (the semantic ground truth)
- ``IDMap,...``       -> user-supplied BIGINT labels allowed
- ``HNSW<m>``         -> accepted, executed as exact scan (recall 1.0 superset
                         of HNSW's approximate recall; efSearch accepted and
                         ignored — documented deviation, SURVEY.md §7)
- ``IVF<n>``/"IVF<n>_HNSW<m>" -> KMeans(n) coarse quantizer; search prunes to
                         ``nprobe`` nearest clusters (needs training)
- ``PQ<m>`` suffix    -> accepted, stored full-precision (exact superset)
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
    needs_training: bool = False
    extras: list[str] = field(default_factory=list)


_IVF_RE = re.compile(r"^IVF(\d+)(?:_HNSW(\d+))?$")
_HNSW_RE = re.compile(r"^HNSW(\d+)?$")
_PQ_RE = re.compile(r"^PQ(\d+)(?:x\d+)?$")


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
    else:
        raise FaissSparkError(f"Unsupported index factory component: {head!r}")
    for extra in parts[1:]:
        if extra == "Flat" or _PQ_RE.match(extra) or _HNSW_RE.match(extra):
            spec.extras.append(extra)
        else:
            raise FaissSparkError(f"Unsupported index factory component: {extra!r}")
    return spec
