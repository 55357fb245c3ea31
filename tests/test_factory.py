import pytest

from duckdb_faiss_ext_spark.errors import FaissSparkError
from duckdb_faiss_ext_spark.factory import parse_factory


@pytest.mark.parametrize(
    "s,idmap,kind,nlist,training",
    [
        # every factory string observed in the reference repo (SURVEY.md §2.1)
        ("Flat", False, "flat", 0, False),
        ("IDMap,Flat", True, "flat", 0, False),
        ("IDMap,HNSW32", True, "hnsw", 0, False),
        ("HNSW16", False, "hnsw", 0, False),
        ("IDMap,IVF1,Flat", True, "ivf", 1, True),
        ("IDMap,HNSW128,Flat", True, "hnsw", 0, False),
        ("IVF2048_HNSW128,Flat", False, "ivf", 2048, True),
    ],
)
def test_reference_factory_strings(s, idmap, kind, nlist, training):
    spec = parse_factory(s)
    assert spec.idmap == idmap
    assert spec.kind == kind
    assert spec.nlist == nlist
    assert spec.needs_training == training


def test_bad_factory():
    with pytest.raises(FaissSparkError):
        parse_factory("NotAThing")
    with pytest.raises(FaissSparkError):
        parse_factory("")
