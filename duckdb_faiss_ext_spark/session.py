"""SparkSession bootstrap tuned for the engine.

Local testing runs on ``local[N]``; the config choices are the ones that
matter on a real cluster too: AQE on (runtime skew/coalesce handling), Arrow
on (every vector kernel crosses the Python boundary in Arrow batches, the
Spark analogue of the reference's 2048-row DataChunk batching —
src/faiss_extension.cpp:475, :903).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "duckdb-faiss-ext-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # AQE: runtime coalescing of shuffle partitions + skew-join splitting.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow for every pandas_udf / mapInPandas crossing.  64k-row batches:
        # per-batch overhead (IPC framing, numpy reshape, top-k call) was the
        # dominant cost at the 4M-row probe with the 10k default (10.1 s ->
        # 3.4 s warm exact search); 64k x 64 dims x 4 B ~ 17 MB per batch
        # keeps well under executor memory at any realistic dim.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions if shuffle_partitions is not None else int(cpus)),
        )
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # local mode: the driver JVM IS the executor — size its heap for the
        # cached corpus + per-thread Arrow buffers (32 threads), or multi-GB
        # caches GC-thrash (the 4M probe degraded 3-10x run-over-run at 8g)
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        # driver testdata events.ts is TIMESTAMP(NANOS); Spark reads it as
        # bigint nanos with this flag (convert explicitly where needed)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
