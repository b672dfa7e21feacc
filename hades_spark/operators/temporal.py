"""Temporal joins: as-of join, bucketed range join, interval-overlap join.

Neither exists as a built-in Spark join strategy, and both are staples of
web-crawl / event-stream processing at scale (match each page fetch to the
most recent prior robots.txt snapshot; count fetches inside maintenance
windows). The reference's closest analogues are its watermark/anti-join
incremental sync (``core/cli/commands/arxiv/sync.py:496-543``) and
time-bounded AQL filters; these operators generalize both to first-class
relational joins.

Scale design:

- ``asof_join`` is JOIN-FREE: the classic union + running-``last`` window.
  One shuffle on the key columns, one sort, zero join nodes — compared to
  the naive ``left.ts >= right.ts`` theta-join, which Spark can only plan
  as a broadcast-nested-loop (quadratic per key, and a full right-side
  broadcast). The window frame is running (``unboundedPreceding ..
  currentRow``), so Spark evaluates it in a single streaming pass per
  partition — no per-row rescans.
- ``range_join`` never materializes the cross product: intervals explode
  into fixed-width bucket ids (bounded per interval, asserted at runtime),
  points hash into one bucket, and the join is a plain equi-join on the
  bucket id (+ optional keys) that Catalyst plans as a shuffled hash /
  sort-merge join — never ``BroadcastNestedLoopJoin``. The exact
  containment predicate re-filters after the equi-join, so bucket width
  only affects cost, never correctness.
- ``interval_join`` (overlap of two interval tables) additionally avoids
  the post-join pair-dedup shuffle: a pair co-occurring in many buckets is
  kept only in the single bucket holding the overlap's start.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _epoch_col(col_name: str, df: DataFrame) -> Column:
    """Epoch-seconds axis for bucketing. date and timestamp_ntz don't cast
    to long directly; routing via timestamp is session-tz-consistent across
    both join sides, and bucket correctness needs only a shared monotonic
    mapping (the exact predicates re-filter on the original values)."""
    t = df.schema[col_name].dataType.simpleString()
    col = F.col(col_name)
    if t.startswith("date") or t == "timestamp_ntz":
        col = col.cast("timestamp")
    return col.cast("long")


def _bucket_ids(df: DataFrame, s_col: str, e_col: str, w: int,
                cap: int) -> Column:
    """Covered-bucket id array for ``[s_col, e_col)``, capped at ``cap``.
    The guard lives INSIDE the exploded expression: a dropped guard column
    gets pruned by Catalyst and never evaluates (verified), so the raise
    must be on the value path itself."""
    s, e = _epoch_col(s_col, df), _epoch_col(e_col, df)
    seq = F.sequence(F.floor(s / w), F.floor(e / w))
    return F.when(F.size(seq) <= cap, seq).otherwise(
        F.raise_error(F.lit(
            f"interval spans more than {cap} buckets of {w}s — raise "
            f"bucket_width or max_buckets_per_interval")))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    *,
    direction: str = "backward",
    tolerance: Column | None = None,
) -> DataFrame:
    """For each left row, attach the right row with the same key and the
    nearest ``right_ts`` at-or-before (``backward``) / at-or-after
    (``forward``) its ``left_ts`` — DuckDB/pandas ``ASOF JOIN`` semantics,
    inclusive at equality. Unmatched left rows keep NULLs (left join).

    ``right_cols`` are the right-side columns to attach (default: all
    except the keys; ``right_ts`` is attached under its own name and must
    not collide with a left column). ``tolerance`` (an interval/duration
    Column, e.g. ``F.expr("INTERVAL 7 DAYS")``) nulls out matches whose
    timestamp is further than that from ``left_ts``.

    Contract: right must be unique per (key, ``right_ts``) — among
    equal-timestamp right rows the running-``last`` pick is tie-ordered by
    Spark's partition sort, which is not deterministic. Pre-aggregate
    (e.g. ``max_by``) to one row per (key, ts) first.

    Skew note: one key's full left+right history lands in one partition
    (inherent to ordered semantics). For web-scale keys (url, host) the
    key space is wide, so the shuffle is balanced; a single pathological
    key should be pre-split by time range with boundary-state carryover.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward/forward: {direction}")
    keys = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns
                      if c not in keys and c != right_ts]
    payload_cols = [right_ts] + [c for c in right_cols if c != right_ts]
    clash = set(payload_cols) & set(left.columns)
    if clash:
        raise ValueError(
            f"right columns {sorted(clash)} collide with left columns; "
            f"rename before joining")

    # union schema: keys, _ts, _side, _lrow (left payload), _rrow (right
    # payload). Side ordering makes equality-inclusive matching exact:
    # backward scans ascending and the right row must sort BEFORE an
    # equal-ts left row; forward scans the following frame and the right
    # row must sort AFTER it.
    r_side, l_side = (0, 1) if direction == "backward" else (1, 0)
    lp = F.struct(*[F.col(c) for c in left.columns]).alias("_lrow")
    rp = F.struct(*[F.col(c) for c in payload_cols]).alias("_rrow")
    lu = left.select(*keys, F.col(left_ts).alias("_ts"),
                     F.lit(l_side).alias("_side"), lp,
                     F.lit(None).cast(
                         right.select(rp).schema["_rrow"].dataType
                     ).alias("_rrow"))
    # SQL-join parity: a right row with a NULL timestamp or NULL key can
    # never satisfy the ASOF ON clause — but the window grouping would
    # happily match it (NULLs sort first and group together). Drop them.
    r_valid = F.col(right_ts).isNotNull()
    for kcol in keys:
        r_valid = r_valid & F.col(kcol).isNotNull()
    ru = right.filter(r_valid) \
        .select(*keys, F.col(right_ts).alias("_ts"),
                F.lit(r_side).alias("_side"),
                F.lit(None).cast(
                    left.select(lp).schema["_lrow"].dataType
                ).alias("_lrow"), rp)

    from pyspark.sql import Window
    w = Window.partitionBy(*keys).orderBy("_ts", "_side")
    if direction == "backward":
        frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        matched = F.last("_rrow", ignorenulls=True).over(frame)
    else:
        frame = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        matched = F.first("_rrow", ignorenulls=True).over(frame)

    # a NULL left timestamp can never satisfy the ASOF comparison either:
    # NULLs sort FIRST ascending, which is accidentally correct backward
    # (nothing precedes them) but would hand forward rows the whole right
    # side — guard both directions explicitly
    out = (
        lu.unionByName(ru)
        .withColumn("_m", F.when(F.col("_ts").isNotNull(), matched))
        .filter(F.col("_side") == l_side)
    )
    if tolerance is not None:
        gap_ok = (
            (F.col("_ts") <= F.col("_m." + right_ts) + tolerance)
            if direction == "backward"
            else (F.col("_m." + right_ts) <= F.col("_ts") + tolerance)
        )
        out = out.withColumn(
            "_m", F.when(gap_ok, F.col("_m")))
    return out.select(
        *[F.col(f"_lrow.{c}").alias(c) for c in left.columns],
        *[F.col(f"_m.{c}").alias(c) for c in payload_cols],
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    *,
    on: str | list[str] | None = None,
    bucket_width: int = 86_400,
    how: str = "inner",
    max_buckets_per_interval: int = 4_096,
) -> DataFrame:
    """Join points to half-open intervals ``[start, end)`` (optionally also
    on equality ``on`` keys) without a nested-loop plan.

    Timestamps are compared on the epoch-seconds axis; ``bucket_width`` is
    seconds (default 1 day). Each interval emits one row per covered
    bucket id (``floor(start/w) .. floor(end/w)``, runtime-asserted
    ``<= max_buckets_per_interval`` so a malformed unbounded interval
    fails loudly instead of exploding the stage); each point hashes into
    exactly one bucket; the bucket id joins as a plain equi-key and the
    exact predicate ``start <= ts < end`` re-filters. Pick ``bucket_width``
    near the typical interval length: candidate rows per point ≈ intervals
    overlapping its bucket.

    ``how='inner'`` (default) or ``'left'`` (points keep NULL interval
    columns when nothing covers them — implemented without re-scanning
    points). Output: all point columns + all interval columns (names must
    not collide).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner/left: {how}")
    keys = [] if on is None else ([on] if isinstance(on, str) else list(on))
    clash = set(points.columns) & set(intervals.columns) - set(keys)
    if clash:
        raise ValueError(
            f"point/interval columns collide: {sorted(clash)}; rename first")

    w = int(bucket_width)
    if w <= 0:
        raise ValueError(f"bucket_width must be positive: {bucket_width}")
    iv = intervals.withColumn("_bk", F.explode(_bucket_ids(
        intervals, start_col, end_col, w, max_buckets_per_interval)))
    pt = points.withColumn(
        "_bk", F.floor(_epoch_col(point_ts, points) / w))

    exact = (
        (F.col(point_ts) >= F.col(start_col))
        & (F.col(point_ts) < F.col(end_col))
    )
    matched = (
        pt.join(iv, keys + ["_bk"])
        .filter(exact)
        .drop("_bk")
    )
    if how == "inner":
        return matched
    # left: re-attach points that matched nothing. The anti side works on
    # the ALREADY-BUCKETED frames (no second scan of points' lineage).
    hit_keys = matched.select(*points.columns).dropDuplicates(points.columns)
    # null-SAFE anti equality: with plain column-list equality a matched
    # point row carrying a NULL in ANY column never equals its own
    # hit_keys row and would be re-emitted as a spurious miss
    anti_cond = None
    for c in points.columns:
        eq = points[c].eqNullSafe(hit_keys[c])
        anti_cond = eq if anti_cond is None else (anti_cond & eq)
    misses = points.join(hit_keys, anti_cond, "left_anti")
    for c in intervals.columns:
        if c not in keys:
            misses = misses.withColumn(
                c, F.lit(None).cast(intervals.schema[c].dataType))
    return matched.unionByName(misses.select(*matched.columns))


def interval_join(
    a: DataFrame,
    b: DataFrame,
    a_start: str,
    a_end: str,
    b_start: str,
    b_end: str,
    *,
    on: str | list[str] | None = None,
    bucket_width: int = 86_400,
    max_buckets_per_interval: int = 4_096,
) -> DataFrame:
    """Join two interval tables on overlap — ``[a_start, a_end)`` meets
    ``[b_start, b_end)`` iff ``a_start < b_end AND b_start < a_end`` —
    optionally also on equality ``on`` keys, without a nested-loop plan
    AND without a pair-dedup shuffle.

    Both sides explode into covered bucket ids like ``range_join``; the
    anti-duplication trick is that an overlapping pair co-occurs in every
    shared bucket, but exactly ONE bucket holds the overlap's start —
    ``floor(max(a_start, b_start) / w)`` — so the join keeps a candidate
    only when its bucket id equals that value. No ``dropDuplicates`` over
    the (large) matched frame, which at web scale is a full extra exchange
    of the output.

    Output: all ``a`` columns + all ``b`` columns (must not collide
    outside the keys).
    """
    keys = [] if on is None else ([on] if isinstance(on, str) else list(on))
    clash = set(a.columns) & set(b.columns) - set(keys)
    if clash:
        raise ValueError(
            f"interval tables' columns collide: {sorted(clash)}; rename "
            f"first")
    w = int(bucket_width)
    if w <= 0:
        raise ValueError(f"bucket_width must be positive: {bucket_width}")

    ea = a.withColumn("_bk", F.explode(_bucket_ids(
        a, a_start, a_end, w, max_buckets_per_interval)))
    eb = b.withColumn("_bk", F.explode(_bucket_ids(
        b, b_start, b_end, w, max_buckets_per_interval)))
    overlap = (
        (F.col(a_start) < F.col(b_end)) & (F.col(b_start) < F.col(a_end))
    )
    start_bucket = F.floor(
        F.greatest(_epoch_col(a_start, a), _epoch_col(b_start, b)) / w)
    return (
        ea.join(eb, keys + ["_bk"])
        .filter(overlap & (F.col("_bk") == start_bucket))
        .drop("_bk")
    )


def rolling_zscore(
    buckets: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_col: str,
    window: int = 24,
    min_history: int = 4,
) -> DataFrame:
    """Per-key rolling z-score over an ordered bucket series — the
    metric-anomaly shape (crawl-rate spikes, error-rate regressions):
    each bucket is scored against the mean/stddev of its ``window``
    PRECEDING buckets (never itself — no self-masking), NULL until
    ``min_history`` buckets exist or the trailing stddev is 0. The frame
    counts BUCKETS, not wall-clock: gaps (periods with no row) widen the
    effective time span, and a total outage emits no bucket at all —
    densify the series upstream (join against a generated calendar) when
    gap-aware semantics are required.

    Input is the PRE-AGGREGATED bucket table (one row per key x bucket),
    so the window's partition width is the series length, not the event
    count — the expensive shuffle is the upstream combinable bucket
    groupBy, not this. Adds ``mean_prev, std_prev, zscore``.
    """
    from pyspark.sql import Window as W

    if window < 2:
        raise ValueError(f"window must be >= 2, got {window}")
    w = (W.partitionBy(*key_cols).orderBy(order_col)
          .rowsBetween(-window, -1))
    mean_p = F.avg(value_col).over(w)
    std_p = F.stddev(value_col).over(w)
    n_p = F.count(value_col).over(w)
    z = F.when((n_p >= min_history) & (std_p > 0),
               (F.col(value_col) - mean_p) / std_p)
    return buckets.select(
        "*",
        F.round(mean_p, 9).alias("mean_prev"),
        F.round(std_p, 9).alias("std_prev"),
        F.round(z, 9).alias("zscore"))


def funnel_conversion(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered funnel matching — for each user, the deepest prefix of
    ``steps`` completed IN ORDER (each step strictly after the previous
    one's earliest valid occurrence; the standard product-analytics
    semantics where revisiting step 1 later never helps).

    Returns one row per user: ``user_col, depth, ts_1..ts_k`` (the
    earliest valid timestamp per completed step, NULL beyond ``depth``).
    Greedy-earliest is correct for existence: taking the earliest valid
    occurrence of step i maximizes the time window for step i+1.

    Plan: ONE conditional aggregation pass per step over the user's
    events — k combinable ``min(when(...))`` aggregates inside a single
    groupBy... except later steps depend on earlier mins, so the chain
    compiles as k stacked single-groupBy passes over the per-user event
    set (k is 3-5 in practice; each pass is one combinable agg, shuffle
    keyed on the uniform user id — no window, no ordering exchange).
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    e = events.select(F.col(user_col).alias("_u"),
                      F.col(type_col).alias("_t"),
                      F.col(ts_col).alias("_ts"))
    cur = e.groupBy("_u").agg(
        F.min(F.when(F.col("_t") == steps[0], F.col("_ts")))
         .alias("ts_1"))
    for i, step in enumerate(steps[1:], start=2):
        joined = e.join(cur, "_u")
        agg_cols = [F.first(f"ts_{j}").alias(f"ts_{j}")
                    for j in range(1, i)]
        cur = joined.groupBy("_u").agg(
            *agg_cols,
            F.min(F.when((F.col("_t") == step)
                         & F.col(f"ts_{i-1}").isNotNull()
                         & (F.col("_ts") > F.col(f"ts_{i-1}")),
                         F.col("_ts"))).alias(f"ts_{i}"))
    depth = sum([F.when(F.col(f"ts_{i}").isNotNull(), 1).otherwise(0)
                 for i in range(1, len(steps) + 1)],
                F.lit(0))
    return cur.select(F.col("_u").alias(user_col),
                      depth.alias("depth"),
                      *[f"ts_{i}" for i in range(1, len(steps) + 1)])
