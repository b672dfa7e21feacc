"""Streaming KG stage-1: pages arriving as files -> extracted text +
mentions + surface triples, continuously.

The reference drains new documents in batches against a persisted
watermark (``sync.py:106-135``); Structured Streaming subsumes that loop:
``readStream`` on the pages directory discovers new files, the SAME narrow
stage-1 expression used by the batch pipeline (``pipeline/persist._stage1``)
runs per micro-batch, and the sink checkpoint gives exactly-once file
progress — the streaming twin of the manifest's exact-resume contract.

Scale shape: stage-1 is stateless and narrow (no watermark state needed);
``maxFilesPerTrigger`` bounds micro-batch size so executor memory is flat
regardless of backlog. ``trigger(availableNow=True)`` drains the current
backlog then stops — the reference's "sync" semantics; leave it unset for
continuous tailing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..schemas import PAGES


def read_pages_stream(spark: SparkSession, pages_dir: str,
                      max_files_per_trigger: int = 32) -> DataFrame:
    return (
        spark.readStream.schema(PAGES)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(pages_dir)
    )


def stream_extract(
    spark: SparkSession,
    pages_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    max_files_per_trigger: int = 32,
):
    """Start (and return) the streaming stage-1 query. Restarting with the
    same checkpoint resumes at the first unprocessed file — no duplicates,
    no gaps (exactly-once file-source progress)."""
    from ..pipeline.persist import _stage1

    src = read_pages_stream(spark, pages_dir, max_files_per_trigger)
    out = _stage1(src)
    writer = (
        out.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
