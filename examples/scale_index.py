"""The 100 TB index recipe, end-to-end on a small corpus — every lever a
corpus that dwarfs executor memory actually pulls, in the order a real
deployment applies them:

1. **disk mode** (``storage_path``): the index lives as cluster-partitioned
   parquet; adds are O(batch) appends, searches prune whole directories.
2. **SQ8 storage tier** (``IVFn,SQ8``): 3.8x smaller at rest/in cache
   (SCALE.md r10); codes decode per Arrow batch inside the kernels.
3. **corpus rebalance** (on by default): the build enforces the 4x-even
   skew cap on the FULL assignment histogram; appends that drift past the
   cap warn once, and ``rebalance()`` splits offenders by rewriting ONLY
   their partition directories.
4. **warm()**: one full-probe pass so the first user query runs at
   steady-state cost instead of paying the cold-layout + JIT penalty.

Run:  python examples/scale_index.py [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

import pyspark.sql.functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from duckdb_faiss_ext_spark import FaissSparkEngine
    from duckdb_faiss_ext_spark.session import get_spark

    spark = get_spark("scale-index")
    spark.sparkContext.setLogLevel("ERROR")
    eng = FaissSparkEngine(spark)

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    dim = len(emb.select("embedding").first()[0])
    store = tempfile.mkdtemp(prefix="scale_index_")
    try:
        eng.create(
            "corpus", dim, "IDMap,IVF16,SQ8",
            metric_type="INNER_PRODUCT",
            params={"storage_path": store, "nprobe": "4"},
        )
        eng.add("corpus", emb.select("vec_id", "embedding"))

        idx = eng.registry.get("corpus")
        stored = dict(idx.data.dtypes)
        print(f"at rest: {stored.get('codes')} codes, partitioned by cluster_id")
        print(f"skew receipt: {eng.rebalance('corpus')}")
        print(f"warm cost: {eng.warm('corpus'):.2f}s")

        q = emb.limit(4).select(
            F.col("vec_id").alias("qid"), F.col("embedding").alias("vector")
        )
        hits = eng.search_flat("corpus", 3, q).filter("rank = 0").collect()
        self_hits = sum(1 for r in hits if r["qid"] == r["label"])
        print(f"self-hit sanity: {self_hits}/4 queries found themselves at rank 0")
    finally:
        shutil.rmtree(store, ignore_errors=True)


if __name__ == "__main__":
    main()
