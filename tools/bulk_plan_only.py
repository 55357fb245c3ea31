"""Capture the formatted plan of the bulk grouped IVF search (small shape —
the plan is scale-independent).  Usage: python tools/bulk_plan_only.py <out>"""
import os
import sys

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)
sys.path.insert(0, os.path.join(repo, "tools"))

import pyspark.sql.functions as F

from duckdb_faiss_ext_spark import FaissSparkEngine
from duckdb_faiss_ext_spark.session import get_spark
from _synth import synth_clusterable

spark = get_spark("bulk_plan_only", shuffle_partitions=4)
spark.sparkContext.setLogLevel("ERROR")
eng = FaissSparkEngine(spark)
corp = synth_clusterable(spark, 20_000, 16, n_clusters=64).persist()
corp.count()
q = synth_clusterable(spark, 2_000, 16, n_clusters=64, lo=20_256, id_col="qid")
eng.create("bpo", 16, "IDMap,IVF64", metric_type="L2")
eng.add("bpo", corp)
res = eng.search_flat("bpo", 10, q, params={"nprobe": 16, "bulk_queries": 1})
plan = res._jdf.queryExecution().explainString(
    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
with open(sys.argv[1], "w") as f:
    f.write(plan)
import re
print("Exchanges:", len(re.findall(r"\bExchange\b", plan)),
      "MapInArrow:", len(re.findall(r"MapInArrow", plan)))
spark.stop()
