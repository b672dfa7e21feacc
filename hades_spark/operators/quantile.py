"""Distributed quantiles via mergeable equi-width histograms.

Exact quantiles need a global sort (a full-corpus range exchange — the
single most expensive shuffle shape at 100 TB). This operator trades a
bounded, tunable error for TWO narrow scans and a <= ``n_bins``-row
aggregate:

1. scan 1: global min/max (one partial-agg row per partition);
2. scan 2: bin index = ``floor((x - min) / width)`` -> groupBy bin count
   (map-side combinable, <= n_bins rows shuffle);
3. readout: cumulative bin counts locate each requested quantile's bin;
   linear interpolation inside the bin. Error <= bin width — for
   ``n_bins = 4096`` that is (max-min)/4096, independent of row count.

Histograms are MERGEABLE (bin-wise count sum when built over the same
``(lo, width, n_bins)`` frame) — per-day/per-partition histograms
combine without re-reading data, the property sketches need at scale
(same contract as ``operators/sketch.kmv_union`` / ``cms_merge``).

Everything is JVM column algebra — no UDF, no sort, no driver collect;
the readout is a <= n_bins-row window over ONE partition (bounded by
construction, like the CMS counter table).

vs Spark's built-in ``approx_percentile`` (KLL): the built-in is the
right default for one-shot queries; this exists for the MERGE workflow
(incremental per-batch histograms, cross-dataset combination) and for
oracle-exact verifiability — the staged (bin, cnt) table re-derives in
DuckDB bit-for-bit, which no randomized sketch offers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _validate(n_bins: int) -> None:
    if not 2 <= n_bins <= 1 << 20:
        raise ValueError(f"n_bins must be in [2, 2^20]: {n_bins}")


def hist_frame(df: DataFrame, value_col: str, n_bins: int = 4096) -> DataFrame:
    """-> ONE row ``(lo, width)`` — the histogram frame over the column's
    [min, max] range. Degenerate (all-equal, or empty) inputs get
    width=0; downstream handles both."""
    _validate(n_bins)
    return df.filter(
        F.col(value_col).isNotNull() & ~F.isnan(F.col(value_col).cast("double"))
    ).agg(
        F.min(F.col(value_col).cast("double")).alias("lo"),
        ((F.max(F.col(value_col).cast("double"))
          - F.min(F.col(value_col).cast("double"))) / n_bins).alias("width"),
    )


def hist_build(
    df: DataFrame,
    value_col: str,
    frame: DataFrame,
    n_bins: int = 4096,
) -> DataFrame:
    """-> (bin, cnt) equi-width histogram of ``value_col`` under
    ``frame``'s (lo, width). The frame rides in as a one-row broadcast
    (the bloom/pagerank scalar pattern); the max value clamps into the
    last bin. Rows outside [lo, lo + n_bins*width) clamp to the edge
    bins, so histograms built under a SHARED frame stay mergeable even
    when a later batch exceeds the original range (edge-bin error is
    visible as mass at bin 0 / n_bins-1)."""
    _validate(n_bins)
    x = F.col(value_col).cast("double")
    raw = F.when(F.col("width") > 0,
                 F.floor((x - F.col("lo")) / F.col("width"))) \
        .otherwise(F.lit(0))
    bin_ = F.least(F.greatest(raw, F.lit(0)), F.lit(n_bins - 1)).cast("int")
    return (
        df.filter(F.col(value_col).isNotNull() & ~F.isnan(x))
        .join(F.broadcast(frame))
        .select(bin_.alias("bin"))
        .groupBy("bin")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )


def hist_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Bin-wise sum — exactly the histogram of the concatenated inputs
    (valid only for histograms built under the SAME frame)."""
    return (
        a.select("bin", "cnt").unionByName(b.select("bin", "cnt"))
        .groupBy("bin").agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )


def hist_quantiles(
    hist: DataFrame,
    frame: DataFrame,
    qs: list[float],
    n_bins: int = 4096,
) -> DataFrame:
    """-> (q, value) per requested quantile, interpolated inside the
    located bin. ``q``'s target rank uses the inclusive convention
    rank = q * N (mass-fraction: the value below which at least q*N
    rows fall) — the same convention the DuckDB oracle re-derives.

    The cumulative window runs over the <= n_bins-row histogram in one
    partition — bounded state, never the data."""
    _validate(n_bins)
    for q in qs:
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"quantile out of [0,1]: {q}")
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = (
        hist.withColumn("cum", F.sum("cnt").over(w))
        .withColumn("prev", F.col("cum") - F.col("cnt"))
        .crossJoin(F.broadcast(
            hist.agg(F.sum("cnt").cast("double").alias("n"))))
    )
    from ..functions.localdf import arrow_local_df

    qdf = arrow_local_df(cum.sparkSession,
                         [(float(q),) for q in qs], "q double")
    # the target bin is the FIRST whose cumulative count reaches q*N;
    # q=0's rank clamps to an epsilon so it lands in the first non-empty
    # bin (and interpolates to that bin's lower edge = the minimum)
    target = F.greatest(F.col("q") * F.col("n"), F.lit(1e-12))
    hit = (
        cum.join(F.broadcast(qdf),
                 (F.col("cum") >= target) & (F.col("prev") < target))
    )
    frac = F.when(F.col("cnt") > 0,
                  (F.greatest(F.col("q") * F.col("n"), F.lit(1e-12))
                   - F.col("prev")) / F.col("cnt")) \
        .otherwise(F.lit(0.0))
    val = F.col("lo") + (F.col("bin") + frac) * F.col("width")
    return (
        hit.join(F.broadcast(frame))
        .select("q", val.alias("value"))
    )


def approx_quantiles(
    df: DataFrame,
    value_col: str,
    qs: list[float],
    n_bins: int = 4096,
) -> DataFrame:
    """One-call convenience: frame + histogram + readout."""
    frame = hist_frame(df, value_col, n_bins)
    hist = hist_build(df, value_col, frame, n_bins)
    return hist_quantiles(hist, frame, qs, n_bins)


def grouped_quantiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    qs: list[float],
    n_bins: int = 4096,
    broadcast_frames: bool = True,
) -> DataFrame:
    """-> (group..., q, value): per-group histogram quantiles — the same
    two-scan/no-sort scheme with every stage keyed by group. Frames are
    one row per group; ``broadcast_frames`` fits the common case (groups
    = languages / quality tiers / sources), and the opt-out keeps the
    join a plain shuffle when groups number in the millions (per-host
    frames at crawl scale). Per-group cumulative state stays <= n_bins
    rows — the window partitions by group, never scans data. Rows with a
    NULL group key are excluded (no threshold is derivable for them —
    the equi-join drops them; callers route NULL-group dirt explicitly)."""
    _validate(n_bins)
    for q in qs:
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"quantile out of [0,1]: {q}")
    x = F.col(value_col).cast("double")
    clean = df.filter(F.col(value_col).isNotNull() & ~F.isnan(x))
    frames = clean.groupBy(*group_cols).agg(
        F.min(x).alias("lo"),
        ((F.max(x) - F.min(x)) / n_bins).alias("width"))
    fr = F.broadcast(frames) if broadcast_frames else frames
    raw = F.when(F.col("width") > 0,
                 F.floor((x - F.col("lo")) / F.col("width"))) \
        .otherwise(F.lit(0))
    bin_ = F.least(F.greatest(raw, F.lit(0)), F.lit(n_bins - 1)).cast("int")
    hist = (
        clean.join(fr, list(group_cols))
             .select(*group_cols, bin_.alias("bin"))
             .groupBy(*group_cols, "bin")
             .agg(F.count("*").cast("bigint").alias("cnt"))
    )
    w = Window.partitionBy(*group_cols).orderBy("bin") \
        .rowsBetween(Window.unboundedPreceding, 0)
    wn = Window.partitionBy(*group_cols)
    cum = (
        hist.withColumn("cum", F.sum("cnt").over(w))
            .withColumn("prev", F.col("cum") - F.col("cnt"))
            .withColumn("n", F.sum("cnt").over(wn).cast("double"))
    )
    from ..functions.localdf import arrow_local_df

    qdf = arrow_local_df(df.sparkSession, [(float(q),) for q in qs],
                         "q double")
    target = F.greatest(F.col("q") * F.col("n"), F.lit(1e-12))
    hit = cum.join(F.broadcast(qdf),
                   (F.col("cum") >= target) & (F.col("prev") < target))
    frac = F.when(F.col("cnt") > 0, (target - F.col("prev")) / F.col("cnt")) \
        .otherwise(F.lit(0.0))
    return (
        hit.join(fr, list(group_cols))
           .select(*group_cols, "q",
                   (F.col("lo") + (F.col("bin") + frac) * F.col("width"))
                   .alias("value"))
    )


def adaptive_quality_gate(
    df: DataFrame,
    group_cols: list[str],
    score_col: str,
    keep_top_frac: float,
    n_bins: int = 4096,
) -> DataFrame:
    """Keep each group's top ``keep_top_frac`` of rows by ``score_col``
    (threshold = the per-group (1 - keep_top_frac) histogram quantile,
    inclusive). The adaptive twin of a fixed quality cutoff: per-language
    score distributions differ, so one global threshold over- or
    under-prunes — this is the standard per-language percentile gate.
    Cost: the two quantile scans plus one broadcast threshold join."""
    if not 0.0 < keep_top_frac <= 1.0:
        raise ValueError(f"keep_top_frac must be in (0, 1]: {keep_top_frac}")
    thr = grouped_quantiles(df, group_cols, score_col,
                            [1.0 - keep_top_frac], n_bins) \
        .select(*group_cols, F.col("value").alias("_thr"))
    s = F.col(score_col).cast("double")
    return (
        df.join(F.broadcast(thr), list(group_cols), "left")
          .filter(s.isNotNull() & ~F.isnan(s)
                  & (F.col("_thr").isNull() | (s >= F.col("_thr"))))
          .drop("_thr")
    )


def winsorize(
    df: DataFrame,
    value_col: str,
    p_lo: float = 0.01,
    p_hi: float = 0.99,
    n_bins: int = 256,
    out_col: str | None = None,
) -> DataFrame:
    """Clip a column to its [p_lo, p_hi] interpolated-histogram
    quantiles — outlier winsorization for training signals (loss
    weights, quality scores) where a handful of extreme rows would
    otherwise dominate. Thresholds come from ``approx_quantiles`` (two
    scans, no sort); the clip itself is a broadcast of the 2-row
    threshold frame + a pure-column ``least/greatest`` — NULL/NaN rows
    pass through unclipped (they carry no magnitude to clip)."""
    if not 0.0 <= p_lo < p_hi <= 1.0:
        raise ValueError(f"need 0 <= p_lo < p_hi <= 1, got ({p_lo}, {p_hi})")
    out_col = out_col or f"{value_col}_w"
    qs = approx_quantiles(df, value_col, [p_lo, p_hi], n_bins=n_bins)
    # conditional aggregates, not pivot: pivot column names go through
    # JVM Double.toString (p=0.0001 -> '1.0E-4') and can't be addressed
    # back by the Python float repr
    thr = qs.agg(
        F.min(F.when(F.col("q") == p_lo, F.col("value"))).alias("_lo"),
        F.max(F.when(F.col("q") == p_hi, F.col("value"))).alias("_hi"))
    v = F.col(value_col)
    clipped = F.when(v.isNull() | F.isnan(v.cast("double")), v) \
               .otherwise(F.least(F.greatest(v, F.col("_lo")),
                                  F.col("_hi")))
    return df.crossJoin(F.broadcast(thr)).withColumn(out_col, clipped) \
             .drop("_lo", "_hi")
