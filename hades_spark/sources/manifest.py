"""Checkpoint manifest: per-(stage, unit) completion records => exact resume.

The reference persists a completed/failed set after every item
(``batch.py:162-313``) and an incremental watermark doc
(``sync.py:265-356``); restated Spark-first as an append-only manifest
parquet table — resuming a stage = anti-join the input's unit ids against
the manifest's completed set (I3 / U3 semantics), so re-runs are idempotent
and a killed run continues exactly where it stopped.

Units are logical partitions of the input (e.g. url-hash buckets), not
Spark task partitions — stable across cluster sizes, which is what makes
resume exact when the N-executor run continues on 4N executors.
"""

from __future__ import annotations

import datetime as dt
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, functions as F

MANIFEST_SCHEMA = ("stage string, unit int, status string, rows_out long, "
                   "error string, run_id string, ts timestamp")


class Manifest:
    def __init__(self, spark: SparkSession, path: str, run_id: str = "run0"):
        self.spark = spark
        self.path = path
        self.run_id = run_id

    def _read(self) -> DataFrame:
        if not Path(self.path).exists():
            return self.spark.createDataFrame([], MANIFEST_SCHEMA)
        return self.spark.read.parquet(self.path)

    def completed_units(self, stage: str) -> DataFrame:
        return (
            self._read()
            .filter((F.col("stage") == stage) & (F.col("status") == "completed"))
            .select("unit").distinct()
        )

    def record(self, stage: str, unit: int, status: str = "completed",
               rows_out: int = 0, error: str | None = None) -> None:
        row = [(stage, unit, status, rows_out, error, self.run_id,
                dt.datetime.now(dt.timezone.utc).replace(tzinfo=None))]
        self.spark.createDataFrame(row, MANIFEST_SCHEMA) \
            .write.mode("append").parquet(self.path)

    def pending(self, df: DataFrame, stage: str, unit_col: str = "unit") -> DataFrame:
        """Drop rows whose unit is already completed for this stage."""
        done = self.completed_units(stage) \
            .withColumnRenamed("unit", unit_col)
        return df.join(F.broadcast(done), unit_col, "left_anti")


def with_unit(df: DataFrame, key_col: str, n_units: int = 64,
              unit_col: str = "unit") -> DataFrame:
    """Stable logical unit id from a key column (url-hash bucket)."""
    return df.withColumn(
        unit_col, F.pmod(F.xxhash64(F.col(key_col)), n_units).cast("int")
    )


def run_stage_with_resume(
    manifest: Manifest,
    stage: str,
    inp: DataFrame,
    transform,
    out_path: str,
    key_col: str,
    n_units: int = 16,
    partition_by: list[str] | None = None,
) -> None:
    """Run ``transform(unit_df) -> DataFrame`` per pending unit, writing each
    unit's output to its own ``unit=<u>/`` partition directory with
    mode=overwrite, then recording completion. A crash BETWEEN the write and
    the manifest record is safe: the resume re-runs the unit and the
    overwrite replaces the orphaned output instead of appending a duplicate
    (the committed-but-unrecorded window an append-based design has).
    ``spark.read.parquet(out_path)`` discovers ``unit`` as a partition
    column, so downstream readers also get the lineage of which bucket each
    row came from for free.

    Unit-granular, not row-granular: at 100 TB the manifest stays tiny
    (n_units rows per stage) while still bounding recomputation to one
    unit's worth of work.
    """
    keyed = with_unit(inp, key_col, n_units)
    todo = manifest.pending(keyed, stage)
    units = [r["unit"] for r in todo.select("unit").distinct().collect()]
    for u in sorted(units):
        unit_df = keyed.filter(F.col("unit") == u).drop("unit")
        out = transform(unit_df).cache()
        n = out.count()  # materializes the cache; write reuses it
        w = out.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(f"{out_path}/unit={u}")
        out.unpersist()
        manifest.record(stage, u, "completed", rows_out=n)
