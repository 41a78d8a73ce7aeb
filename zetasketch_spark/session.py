"""SparkSession factory with the settings this engine assumes.

Arrow batching is the execution fabric of every sketch UDAF here (SURVEY.md
§4): bigger batches = fewer Python crossings, 64k rows/batch keeps per-batch
state work amortized. AQE stays on for runtime re-planning (skew joins,
coalesced shuffle partitions).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app: str = "zetasketch-spark", cpus: int | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 8)
    return (
        SparkSession.builder
        .master(f"local[{cpus}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled",
                "true" if os.environ.get("SPARK_GRAFT_UI") == "1" else "false")
        .getOrCreate()
    )
