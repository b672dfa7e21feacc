"""SparkSession construction with scale-appropriate defaults.

Centralises the config we rely on everywhere:
- AQE on (runtime re-planning, skew-join splitting at 100 TB),
- Arrow on (all our UDFs are pandas UDFs / mapInPandas),
- shuffle partitions sized to the local core count (on a real cluster this
  is set by spark-submit; 2-3x total cores is the usual starting point).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "hades_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's standard config.

    Args:
        app_name: Spark application name.
        master: e.g. ``local[8]``; defaults to ``local[$SPARK_GRAFT_CPUS]``
            (or ``local[*]``) when unset. On a real cluster pass None and
            let spark-submit decide.
        shuffle_partitions: override for ``spark.sql.shuffle.partitions``.
        extra_conf: additional key/value config pairs.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"

    if shuffle_partitions is None:
        if master.startswith("local[") and master[6:-1].isdigit():
            shuffle_partitions = max(int(master[6:-1]), 4)
        else:
            shuffle_partitions = 32

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        .config("spark.sql.session.timeZone", "UTC")
        # pandas-UDF-heavy scans want more, smaller splits than the 128MB
        # default: split count caps stage parallelism, and per-split Arrow
        # batches pipeline better through the python workers
        .config("spark.sql.files.maxPartitionBytes", str(32 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    return builder.getOrCreate()


def load_table(spark: SparkSession, sf_dir: str, name: str):
    """Read one of the driver-generated parquet tables."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
