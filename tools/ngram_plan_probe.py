"""Plan + timing receipt for the ngram_jaccard_pairs restructure (r15).
Usage: python tools/ngram_plan_probe.py <plan_out.txt> [sf_dir]"""
import os
import sys
import time

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)

from duckdb_faiss_ext_spark.session import get_spark

sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
spark = get_spark("ngram_plan_probe")
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as entry

df = entry.dedup_jaccard_pairs(spark, sf_dir)
plan = df._jdf.queryExecution().explainString(
    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
with open(sys.argv[1], "w") as f:
    f.write(plan)
import re
print("Exchanges:", len(re.findall(r"\bExchange\b", plan)),
      "HashAggregate:", len(re.findall(r"HashAggregate", plan)),
      "gram-projections:", len(re.findall(r"concat_ws", plan)))
df.count()  # warm
ts = []
for _ in range(3):
    t0 = time.perf_counter()
    entry.dedup_jaccard_pairs(spark, sf_dir).write.format("noop").mode(
        "overwrite").save()
    ts.append(round(time.perf_counter() - t0, 3))
print("noop_secs:", ts, "median:", sorted(ts)[1])
spark.stop()
