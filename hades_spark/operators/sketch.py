"""Mergeable sketches: KMV distinct counts + count-min frequency.

The training-data questions at 10^12 rows are set-cardinality questions:
distinct urls per host, distinct hosts per language, overlap between two
crawls' url sets. Exact answers need per-group state proportional to the
distinct count; a KMV sketch holds the k smallest (normalized) hash values
of the distinct set instead — fixed k doubles per group — and estimates

    |S| ≈ (k - 1) / u_k        (u_k = k-th minimum, uniform on [0,1))

with relative std-error ~ 1/sqrt(k - 2) (Beyer et al., "On Synopses for
Distinct-Value Estimation Under Multiset Operations", SIGMOD'07). Two
properties make it the right 100-TB shape:

- **mergeable**: the sketch of A ∪ B is exactly the k minima of the two
  sketches' union — per-day/per-partition sketches combine without
  re-reading data (``kmv_union``);
- **set operations**: the union sketch is a uniform sample of A ∪ B, so
  the fraction of its values present in both sides estimates Jaccard, and
  ρ · |A ∪ B| estimates the intersection size (``kmv_jaccard``).

Everything is JVM-side column algebra (xxhash64 + window rank + aggregate)
— no UDFs, no driver collects. The hash shuffle key is uniform by
construction, so the groupBy is skew-free even when the VALUE distribution
is skewed. Sketches are plain (group..., hu) rows, ≤ k per group, so they
persist/union like any DataFrame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

# xxhash64 is signed; shifting by 2^63 and scaling by 2^-64 maps it to a
# uniform double in [0, 1). 2^-64 underflows float literals in some SQL
# dialects, so keep the arithmetic explicit here.
_TWO63 = float(2 ** 63)
_TWO64 = float(2 ** 64)


def normalized_hash(value_col) -> F.Column:
    """xxhash64 mapped to a uniform double in [0, 1) — the KMV hash axis."""
    return (F.xxhash64(value_col) + F.lit(_TWO63)) / F.lit(_TWO64)


def kmv_sketch(
    df: DataFrame,
    group_cols: str | list[str],
    value_col: str,
    k: int = 256,
) -> DataFrame:
    """-> (group..., hu) — per group, the ``k`` smallest normalized hash
    values of the DISTINCT ``value_col`` set. One shuffle on (group, hash)
    for the dedup; the rank window reuses the group partitioning (sort
    spills, never OOMs, for pathological groups)."""
    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    hashed = (
        df.filter(F.col(value_col).isNotNull())
        .select(*groups, normalized_hash(value_col).alias("hu"))
    )
    return kmv_sketch_from_hashes(hashed, groups, "hu", k)


def kmv_sketch_from_hashes(
    hashed: DataFrame,
    group_cols: str | list[str],
    hu_col: str = "hu",
    k: int = 256,
) -> DataFrame:
    """The dedup + k-minima tail of ``kmv_sketch`` over precomputed
    normalized hashes — exposed so a staged hash table can be re-ranked
    independently (the DuckDB oracle consumes the same staged doubles)."""
    if k < 2:
        raise ValueError(f"k must be >= 2 for the (k-1)/u_k estimator: {k}")
    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    w = Window.partitionBy(*groups).orderBy("hu")
    return (
        hashed.select(*groups, F.col(hu_col).alias("hu"))
        .dropDuplicates(groups + ["hu"])
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def kmv_estimate(
    sketch: DataFrame,
    group_cols: str | list[str],
    k: int,
) -> DataFrame:
    """-> (group..., distinct_est) from a ``kmv_sketch`` output. A sketch
    holding fewer than ``k`` values saw the whole distinct set — the count
    IS exact; at ``k`` the estimator (k-1)/u_k takes over."""
    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    return sketch.groupBy(*groups).agg(
        F.when(F.count("*") < k, F.count("*").cast("double"))
        .otherwise(F.lit(float(k - 1)) / F.max("hu"))
        .alias("distinct_est"))


def kmv_union(
    a: DataFrame,
    b: DataFrame,
    group_cols: str | list[str],
    k: int,
) -> DataFrame:
    """Sketch of the UNION of the two underlying sets — exactly the k
    minima of the merged hash values (no approximation added by the
    merge). Input sketches' k must be >= this k."""
    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    return kmv_sketch_from_hashes(
        a.select(*groups, "hu").unionByName(b.select(*groups, "hu")),
        groups, "hu", k)


def kmv_jaccard(
    a: DataFrame,
    b: DataFrame,
    group_cols: str | list[str],
    k: int,
) -> DataFrame:
    """-> (group..., jaccard_est, union_est, intersection_est) per group.

    The union sketch is a size-``min(k, |A∪B|)`` uniform sample of A ∪ B;
    ρ = fraction of its values present in BOTH input sketches estimates
    J(A,B), and ρ · |A∪B|-estimate estimates |A ∩ B|. All three come from
    one pass over the two (≤ k rows/group) sketches — never the data."""
    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    u = kmv_union(a, b, groups, k)
    in_a = a.select(*groups, "hu").withColumn("_ina", F.lit(1))
    in_b = b.select(*groups, "hu").withColumn("_inb", F.lit(1))
    tagged = (
        u.join(in_a, groups + ["hu"], "left")
        .join(in_b, groups + ["hu"], "left")
    )
    est = F.when(F.count("*") < k, F.count("*").cast("double")) \
        .otherwise(F.lit(float(k - 1)) / F.max("hu"))
    rho = (F.sum(F.when(F.col("_ina").isNotNull()
                        & F.col("_inb").isNotNull(), 1).otherwise(0))
           / F.count("*"))
    return tagged.groupBy(*groups).agg(
        rho.alias("jaccard_est"),
        est.alias("union_est"),
        (rho * est).alias("intersection_est"))


# ---------------------------------------------------------------------------
# Count-min sketch — mergeable frequency estimation / heavy hitters
# ---------------------------------------------------------------------------
# The frequency twin of KMV: "how often does each host / entity / token
# appear" at 10^12 rows, in depth x width counters instead of a
# |distinct|-sized exact table. Estimates are ONE-SIDED (est >= true;
# overestimate <= 2N/width with prob 1 - 2^-depth — Cormode & Muthukrishnan,
# J. Algorithms 2005), and sketches MERGE by cell-wise addition, so per-day /
# per-partition sketches combine without re-reading data. The heavy-hitter
# readout feeds the skew machinery (operators/skew.py): the estimated hot
# keys are exactly the keys worth salting.
#
# Everything is JVM column algebra — per row, ``depth`` (r, bucket) cells
# via seeded xxhash64, one map-side-combinable groupBy. No UDFs, no
# collects. The (r, bucket) shuffle key is uniform even when the VALUE
# distribution is maximally skewed — the sketch of a skewed stream is
# itself skew-free to compute.


def _cms_validate(depth: int, width: int) -> None:
    if depth < 1:
        raise ValueError(f"cms depth must be >= 1: {depth}")
    if width < 2:
        raise ValueError(f"cms width must be >= 2: {width}")


def cms_cells(value_col, depth: int, width: int) -> F.Column:
    """array<struct<r,bucket>> of the ``depth`` counter cells a value
    increments — row r uses xxhash64 seeded by r (an extra lit column),
    pmod'd into [0, width)."""
    return F.array(*[
        F.struct(
            F.lit(r).alias("r"),
            F.pmod(F.xxhash64(F.lit(r), value_col), F.lit(width))
            .cast("int").alias("bucket"),
        )
        for r in range(depth)
    ])


def cms_assignments(
    df: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 2048,
) -> DataFrame:
    """-> (val, r, bucket): one row per occurrence per sketch row — the
    exploded cell increments. Exposed (rather than fused into
    ``cms_sketch``) so a staged copy can be re-aggregated independently —
    the DuckDB oracle consumes the same staged assignments."""
    _cms_validate(depth, width)
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(F.col(value_col).alias("val"),
                F.explode(cms_cells(F.col(value_col), depth, width))
                .alias("cell"))
        .select("val", "cell.r", "cell.bucket")
    )


def cms_sketch_from_assignments(assign: DataFrame) -> DataFrame:
    """(val, r, bucket) occurrences -> (r, bucket, cnt) counters. Map-side
    combinable; at most depth*width output rows regardless of input size."""
    return assign.groupBy("r", "bucket").agg(
        F.count("*").cast("bigint").alias("cnt"))


def cms_sketch(
    df: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 2048,
) -> DataFrame:
    """-> (r, bucket, cnt) count-min counters over ``value_col``."""
    return cms_sketch_from_assignments(
        cms_assignments(df, value_col, depth, width))


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Cell-wise sum — exactly the sketch of the concatenated streams."""
    return (
        a.select("r", "bucket", "cnt")
        .unionByName(b.select("r", "bucket", "cnt"))
        .groupBy("r", "bucket")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    candidates: DataFrame,
    value_col: str,
    depth: int,
    width: int,
) -> DataFrame:
    """-> (val, est_count) for each DISTINCT candidate value: min over the
    value's ``depth`` cells. The sketch side is <= depth*width rows —
    always broadcastable — so estimation is one broadcast join + one
    groupBy on the candidate set, never a big shuffle. Cells with no
    counter row are count 0 (the min short-circuits via coalesce)."""
    _cms_validate(depth, width)
    cand = (
        candidates.filter(F.col(value_col).isNotNull())
        .select(F.col(value_col).alias("val")).distinct()
        .select("val",
                F.explode(cms_cells(F.col("val"), depth, width))
                .alias("cell"))
        .select("val", "cell.r", "cell.bucket")
    )
    joined = cand.join(F.broadcast(sketch), ["r", "bucket"], "left")
    return joined.groupBy("val").agg(
        F.min(F.coalesce("cnt", F.lit(0))).cast("bigint").alias("est_count"))


def cms_heavy_hitters(
    df: DataFrame,
    value_col: str,
    k: int = 10,
    depth: int = 4,
    width: int = 2048,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Top-``k`` values by estimated count (ties broken by value asc, so
    the output is deterministic). ``candidates`` defaults to the stream's
    own distinct values; at true web scale pass a cheap candidate set
    (e.g. per-partition local top-k unioned) so the readout never
    materializes the full distinct domain."""
    sk = cms_sketch(df, value_col, depth, width)
    est = cms_estimate(sk, candidates if candidates is not None else df,
                       value_col, depth, width)
    # (est desc, val asc) is a TOTAL order over distinct vals, so the
    # TakeOrderedAndProject this compiles to is deterministic — no
    # single-partition window needed for the readout
    return est.orderBy(F.desc("est_count"), F.asc("val")).limit(k)


# --------------------------------------------------------------------------
# HyperLogLog — the fixed-size distinct sketch (Flajolet et al. 2007).
# KMV needs k rows per group; HLL needs exactly m = 2^p REGISTERS (and in
# practice fewer rows: absent register == 0) with std error ~1.04/sqrt(m),
# and merges by cell-wise max — the union-heavy crawl bookkeeping shape
# (distinct urls per host per day, rolled up to any window by merge).
# Spark's approx_count_distinct is HLL++ as an opaque scalar; this keeps
# the REGISTERS as plain (group, register, rho) rows so sketches persist,
# union, and difference like any DataFrame. Pure column algebra: the
# leading-zero count is exact integer work via length(bin(rest)) — no
# float log2 whose boundary rounding could mis-bin.
# --------------------------------------------------------------------------

_HLL_ALPHA = {16: 0.673, 32: 0.697, 64: 0.709}


def _hll_validate(p: int) -> int:
    if not 4 <= p <= 16:
        raise ValueError(f"p must be in [4, 16]: {p}")
    return 1 << p


def hll_alpha(m: int) -> float:
    return _HLL_ALPHA.get(m, 0.7213 / (1.0 + 1.079 / m))


def hll_register(value_col, p: int) -> F.Column:
    """Register index: low ``p`` bits of the 64-bit hash."""
    m = _hll_validate(p)
    return F.xxhash64(value_col).bitwiseAND(F.lit(m - 1))


def hll_rho(value_col, p: int) -> F.Column:
    """Rank = leading zeros of the remaining 64-p hash bits, plus one.
    ``(h >> p) & ((1 << (64-p)) - 1)`` is the logical shift (mask kills the
    sign fill), and ``length(bin(rest))`` is floor(log2(rest)) + 1 exactly
    — integer-exact, unlike a float log2."""
    _hll_validate(p)
    width = 64 - p
    rest = F.shiftright(F.xxhash64(value_col), p) \
            .bitwiseAND(F.lit((1 << width) - 1))
    return F.when(rest == 0, F.lit(width + 1)) \
            .otherwise(F.lit(width + 1) - F.length(F.bin(rest)))


def hll_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    p: int = 9,
) -> DataFrame:
    """-> (group..., register, rho): max rank per register — one
    map-side-combinable groupBy, ≤ 2^p rows per group. NULL values carry
    no distinct identity and are excluded (same contract as kmv_sketch)."""
    _hll_validate(p)
    v = F.col(value_col)
    return (
        df.filter(v.isNotNull())
          .select(*group_cols, hll_register(v, p).alias("register"),
                  hll_rho(v, p).alias("rho"))
          .groupBy(*group_cols, "register")
          .agg(F.max("rho").alias("rho"))
    )


def hll_merge(a: DataFrame, b: DataFrame, group_cols: list[str]) -> DataFrame:
    """Cell-wise max — the sketch of the union, losslessly."""
    return (a.unionByName(b)
             .groupBy(*group_cols, "register")
             .agg(F.max("rho").alias("rho")))


def hll_estimate(
    sketch: DataFrame,
    group_cols: list[str],
    p: int = 9,
) -> DataFrame:
    """-> (group..., distinct_est): the HLL raw estimate with the standard
    small-range linear-counting correction (E <= 2.5m and empty registers
    exist -> m * ln(m / V)). Absent registers contribute 2^0 = 1 to the
    harmonic sum and count toward V."""
    m = _hll_validate(p)
    alpha = hll_alpha(m)
    agg = sketch.groupBy(*group_cols).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("rho"))).alias("_s"),
        F.count("*").alias("_present"),
    )
    harm = F.col("_s") + (F.lit(m) - F.col("_present"))
    raw = F.lit(alpha * m * m) / harm
    zeros = F.lit(m) - F.col("_present")
    small = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros)
    return agg.select(
        *group_cols,
        F.when((raw <= 2.5 * m) & (zeros > 0), small)
         .otherwise(raw).alias("distinct_est"))
