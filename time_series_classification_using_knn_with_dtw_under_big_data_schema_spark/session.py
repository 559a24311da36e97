"""SparkSession factory with engine defaults.

Local-mode testing knobs per /opt/skills/guides/pyspark_guide.md; the same
builder settings (AQE on, UTC, Arrow on) are what we would ship on a real
cluster — only master/memory are local-specific.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "tsknn-engine", *, shuffle_partitions: int | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # bigger Arrow batches amortize the pandas_udf round-trip and feed the
        # batched DTW kernel rectangular blocks worth vectorizing over
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        # Fallback for parquet files that store timestamp[ns] (Spark has no
        # nanosecond type): read them as long nanos instead of erroring.
        # Driver testdata stores events.ts as timestamp[us], so this conf is a
        # no-op there — consumers must branch on the actual dtype (see
        # __spark_entry__._ts_us / streaming.joins._event_time).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.host", "127.0.0.1")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
