"""Sequence packing — assign docs to fixed-capacity training sequences
(the GPT-style concatenate-then-chunk layout) as a distributed prefix sum.

A training pipeline's last mile: documents become one token stream in a
deterministic order, cut every ``capacity`` tokens; each doc needs to know
which sequence (bin) it starts in and how many it spans. The naive plan is
a GLOBAL ordered window — a single-partition sort that dies at corpus
scale. This operator computes the exact global running total with the
classic two-level scheme instead:

1. ``repartitionByRange`` on the deterministic order key (seeded xxhash64,
   doc id as tie-break — unique, so range boundaries can't split a key):
   partitions are ordered segments of the global order;
2. per-partition running totals via a window PARTITIONED by the segment id
   (parallel, bounded by partition size);
3. segment offsets: the <= P-row per-partition totals frame is cumsummed
   on one partition (bounded by construction, like the histogram readout)
   and broadcast-joined back.

global_cum = segment_offset + local_cum, exact and INDEPENDENT of where
the range partitioner drew its boundaries — only the total order matters,
and that is fully determined by (seed, doc id). Rows with NULL or
non-positive token counts carry no tokens and are excluded (documented).

The hash order key is deliberate: sorting by length (the other classic
choice) packs tightest but correlates neighboring sequences; hash order
decorrelates content, which is what LM training wants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def pack_sequences(
    docs: DataFrame,
    id_col: str = "doc_id",
    token_count_col: str = "n_tokens",
    capacity: int = 2048,
    seed: int = 0,
    num_segments: int | None = None,
) -> DataFrame:
    """-> (id, tokens, start_bin, end_bin, n_bins_spanned, bin_offset):
    ``start_bin`` is the sequence the doc's first token lands in,
    ``bin_offset`` the position inside it, ``end_bin`` the sequence of its
    last token (docs span bins — that's the concat-then-chunk contract).
    Exactly reproducible for a given (corpus, seed, capacity) on any
    cluster layout."""
    if capacity < 1:
        raise ValueError(f"capacity must be >= 1: {capacity}")
    tc = F.col(token_count_col).cast("long")
    base = docs.filter(tc.isNotNull() & (tc > 0)).select(
        F.col(id_col), tc.alias("_tc"),
        F.xxhash64(F.lit(int(seed)), F.col(id_col)).alias("_k"))
    segs = num_segments or base.sparkSession.conf.get(
        "spark.sql.shuffle.partitions", "32")
    ranged = base.repartitionByRange(int(segs), "_k", id_col) \
                 .withColumn("_seg", F.spark_partition_id())
    w_local = Window.partitionBy("_seg").orderBy("_k", id_col) \
        .rowsBetween(Window.unboundedPreceding, 0)
    local = ranged.withColumn("_lcum", F.sum("_tc").over(w_local))
    totals = local.groupBy("_seg").agg(F.max("_lcum").alias("_t"))
    w_seg = Window.orderBy("_seg").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.withColumn(
        "_off", F.coalesce(F.sum("_t").over(w_seg), F.lit(0))) \
        .select("_seg", "_off")
    cum = local.join(F.broadcast(offsets), "_seg") \
               .withColumn("_cum", F.col("_lcum") + F.col("_off"))
    # integer DIV, not floor(double /): past 2^53 cumulative tokens a
    # double quotient rounds and bin assignment would contradict the
    # exact long bin_offset — the 10^12-doc regime this targets
    start = F.expr(f"(_cum - _tc) DIV {int(capacity)}")
    end = F.expr(f"(_cum - 1) DIV {int(capacity)}")
    return cum.select(
        F.col(id_col), F.col("_tc").alias("tokens"),
        start.alias("start_bin"), end.alias("end_bin"),
        (end - start + 1).alias("n_bins_spanned"),
        ((F.col("_cum") - F.col("_tc")) % capacity).alias("bin_offset"))
