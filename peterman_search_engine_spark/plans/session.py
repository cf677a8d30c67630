"""SparkSession factory with scale-appropriate defaults.

The same builder is used by tests (local[32]), bench.py, and the
spark-submit jobs; on a real cluster the master/memory settings come
from spark-submit and only the SQL conf below applies.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "peterman-spark",
    *,
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("PSE_SHUFFLE_PARTITIONS", cpus if cpus.isdigit() else "32"))
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # AQE: runtime coalescing of small shuffle partitions and skew
        # join splitting — the backstop behind our explicit salting.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow transfer for every pandas UDF / applyInPandas stage.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # Keep scans wide enough to parallelize at small SF too.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.driver.memory", os.environ.get("PSE_DRIVER_MEM", "8g"))
        # UI off by default (test/bench noise); PSE_UI=true turns it on
        # for scripts that read task metrics from the REST API
        # (scripts/skew_study.py).
        .config("spark.ui.enabled", os.environ.get("PSE_UI", "false"))
    )
    return b.getOrCreate()
