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


def stream_incremental_kg(
    spark: SparkSession,
    pages_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    threshold: float = 0.8,
    available_now: bool = True,
    max_files_per_trigger: int = 32,
    compact_every_n_batches: int | None = 32,
    reingest: bool = False,
):
    """Stage-2 streaming: feed arriving page files straight into the
    incremental KG state via ``foreachBatch`` — the end-to-end glue
    between the watermark/file-source contract (I1) and the
    exactly-once state updates (I2/I3).

    ``reingest=True`` routes micro-batches through
    ``incremental_reingest`` instead of ``incremental_update``: a real
    crawl stream re-crawls urls it has seen, and the reingest path
    purges each re-crawled url's old triples first (delete-on-reingest)
    while skipping recrawls whose extracted triples are unchanged. Use
    the plain update path only when the source guarantees never-seen
    urls (e.g. a dedup'd frontier).

    Exactly-once composition: Structured Streaming's checkpoint commits
    a micro-batch AFTER ``foreachBatch`` returns, so a crash between the
    state commit and the sink commit REPLAYS that epoch on restart with
    the SAME epoch id — and ``incremental_update``'s batch-id manifest
    short-circuits the replay (``batch_id=f"stream-{epoch}"`` below).
    The two idempotency layers compose into exactly-once edges without
    either side trusting the other's failure window.

    Scale shape: each micro-batch runs the O(new vocab + touched
    buckets) update, never a rebuild; ``maxFilesPerTrigger`` bounds
    per-batch memory; auto-compaction keeps the state at O(1) dirs over
    an unbounded stream. ``available_now=True`` drains the backlog and
    stops (the reference's sync semantics); unset it to tail forever.
    """
    from ..pipeline.incremental_kg import (incremental_reingest,
                                           incremental_update)

    src = read_pages_stream(spark, pages_dir, max_files_per_trigger)
    fold = incremental_reingest if reingest else incremental_update

    def _apply(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return  # nothing to fold; no state/manifest churn
        fold(
            spark, batch_df, state_dir, threshold=threshold,
            batch_id=f"stream-{epoch_id}",
            compact_every_n_batches=compact_every_n_batches)

    writer = (
        src.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
