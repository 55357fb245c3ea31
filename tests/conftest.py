import os

import numpy as np
import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")  # small local parallelism for tests


@pytest.fixture(scope="session")
def spark():
    from duckdb_faiss_ext_spark.session import get_spark

    s = get_spark("tests", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


def gen_vectors(n: int, d: int, offset: int = 0) -> np.ndarray:
    """FIXTURES.md F1 generator: deterministic, float32-representable."""
    ids = np.arange(n)[:, None]
    j = np.arange(d)[None, :]
    vals = np.sin(ids * 1000 + j + offset) * 43758.5453
    return np.round(vals - np.floor(vals), 8).astype(np.float32)


@pytest.fixture(scope="session")
def vectors8():
    return gen_vectors(1000, 8, 0)


@pytest.fixture(scope="session")
def queries8():
    return gen_vectors(10, 8, 8047329823)
