"""SparkSession factory tuned for this engine.

Local test profile: one JVM, N threads. The config choices are the ones that
also matter on a real cluster:

- AQE on (runtime coalescing, skew-join splitting) so plans self-correct at
  100 TB without hand-tuned partition counts.
- ``spark.sql.shuffle.partitions`` sized to cores locally; on a cluster this
  is superseded by AQE's coalescing from a high initial value.
- Arrow enabled for every pandas interchange (the only Python-side hot paths
  we allow are vectorized pandas UDFs).
- Session timezone pinned to UTC so results are reproducible and comparable
  against the DuckDB oracle (DuckDB timestamps are UTC-naive).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(app_name: str = "servihabitat_etl_spyke_spark",
              cpus: int | None = None) -> SparkSession:
    """Build (or reuse) the tuned SparkSession."""
    n = cpus or DEFAULT_CPUS
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        # the stage-progress bar writes \r-spam to stdout, which corrupts
        # single-line JSON protocols (the bench driver reads a stdout tail)
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
