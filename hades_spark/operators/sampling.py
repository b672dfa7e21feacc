"""Deterministic hash-gated sampling — the dataset-mixing primitive.

``DataFrame.sample`` draws from a per-partition RNG stream: the kept set
changes with partitioning, task retries, and row order — unacceptable for
training-data pipelines where a rerun must reproduce the same corpus and a
doc's membership must not depend on cluster layout. The hash gate decides
per KEY instead:

    keep  <=>  pmod(xxhash64(seed, key), RESOLUTION) < fraction * RESOLUTION

Properties the mixing use-case needs, all by construction:

- **reproducible**: same (key, seed, fraction) -> same decision, on any
  cluster, any partitioning, any Spark version with stable xxhash64;
- **monotone in fraction**: the 10% sample is a SUBSET of the 20% sample
  (same seed) — growing a mix never churns previously selected docs;
- **consistent across tables**: any table sharing the key samples the same
  entities — sampling docs and their chunks/embeddings stays aligned;
- **pushdown-friendly**: the gate is a plain column predicate, so it
  reaches the scan as a filter (no UDF barrier, no sample() RDD op).

``stratified_mix`` applies per-group fractions (dataset mixing weights,
e.g. per-language or per-quality-tier) via a broadcast weights map.

The reference has no sampling story (single-node, full-corpus); this is
north-rule training-data machinery, same family as operators/dedup.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# gate resolution: fractions are quantized to 1/RESOLUTION. 2^20 keeps the
# quantization error (< 1e-6) far below sampling noise at any real corpus
# size while staying exactly representable in the integer domain.
RESOLUTION = 1 << 20


def sample_bucket(key_col, seed: int = 0) -> Column:
    """Uniform bucket in [0, RESOLUTION) from the key — the gate's hash
    axis. Seed participates as a leading hash input, so different seeds
    give independent gates over the same keys."""
    return F.pmod(F.xxhash64(F.lit(int(seed)), key_col), F.lit(RESOLUTION))


def _threshold(fraction: float) -> int:
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1]: {fraction}")
    return int(round(fraction * RESOLUTION))


def sample_gate(key_col, fraction: float, seed: int = 0) -> Column:
    """Boolean keep-gate column: deterministic ``fraction`` of keys."""
    return sample_bucket(key_col, seed) < F.lit(_threshold(fraction))


def deterministic_sample(
    df: DataFrame,
    key_col: str,
    fraction: float,
    seed: int = 0,
) -> DataFrame:
    """Keep a deterministic ``fraction`` of KEYS (all rows of a kept key
    survive — per-entity, not per-row, which is what doc-level pipelines
    want). Pure filter: survives predicate pushdown to the scan."""
    return df.filter(sample_gate(F.col(key_col), fraction, seed))


# hash-uniform resolution for the weighted path: 2^52 buckets keep the
# mapped double's quantization (~2e-16) at the precision floor, so two
# distinct keys practically never collide in u.
UNIFORM_RESOLUTION = 1 << 52


def uniform_unit(key_col, seed: int = 0) -> Column:
    """Deterministic hash-uniform in (0, 1): (bucket + 0.5) / 2^52.
    The +0.5 keeps u strictly inside the open interval — ln(u) is finite."""
    b = F.pmod(F.xxhash64(F.lit(int(seed)), key_col),
               F.lit(UNIFORM_RESOLUTION))
    return (b + F.lit(0.5)) / F.lit(float(UNIFORM_RESOLUTION))


def exp_sample_key(key_col, weight_col, seed: int = 0) -> Column:
    """Efraimidis–Spirakis exponential sort key ``-ln(u) / w``: the k
    SMALLEST keys are a weighted sample WITHOUT replacement with inclusion
    probability proportional to weight (A-ES, Efraimidis & Spirakis 2006,
    via the exponential-race equivalence u^(1/w) <-> -ln(u)/w)."""
    return -F.log(uniform_unit(key_col, seed)) / weight_col.cast("double")


def weighted_sample_topk(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    seed: int = 0,
    score_col: str = "es_key",
) -> DataFrame:
    """Deterministic weight-proportional sample of ``k`` keys.

    Rows with NULL or non-positive weight are excluded (they have no
    sampling mass). The global top-k by the exponential key plans as
    TakeOrderedAndProject — per-partition heaps + a k-row merge on the
    driver, no full sort shuffle — so this is scan-shaped at any corpus
    size. Same determinism contract as the uniform gate: reruns, retries,
    and repartitioning cannot change the sample.
    """
    if k <= 0:
        raise ValueError(f"k must be positive: {k}")
    w = F.col(weight_col).cast("double")
    return (
        df.filter(w.isNotNull() & (w > 0) & F.col(key_col).isNotNull())
          .withColumn(score_col, exp_sample_key(F.col(key_col), w, seed))
          .orderBy(score_col)
          .limit(k)
    )


def weighted_gate(key_col, weight_col, rate: float, seed: int = 0) -> Column:
    """Bernoulli keep-gate with per-key probability ``min(1, rate * w)`` —
    the streaming-friendly companion to the fixed-k sampler (no global
    top-k; expected yield rate*sum(w)). Plain predicate: pushes to scans."""
    if rate < 0:
        raise ValueError(f"rate must be non-negative: {rate}")
    p = F.least(F.lit(1.0), F.lit(float(rate)) * weight_col.cast("double"))
    return uniform_unit(key_col, seed) < p


def stratified_mix(
    df: DataFrame,
    key_col: str,
    group_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    seed: int = 0,
) -> DataFrame:
    """Per-group deterministic sampling — dataset mixing weights.

    ``fractions`` maps group values (e.g. languages, quality tiers) to
    keep-fractions; groups absent from the map get ``default_fraction``.
    The weights ride a literal ``map`` expression (broadcast by value in
    the plan — no join), so the whole mix is ONE scan + ONE filter with
    zero shuffles.
    """
    thresholds = {str(g): _threshold(fr) for g, fr in fractions.items()}
    _threshold(default_fraction)  # validate range
    mapping = F.create_map(
        *[F.lit(x) for kv in thresholds.items() for x in kv])
    thr = F.coalesce(
        F.element_at(mapping, F.col(group_col).cast("string")),
        F.lit(_threshold(default_fraction)),
    )
    return df.filter(sample_bucket(F.col(key_col), seed) < thr)


def split_column(key_col, splits: dict[str, float], seed: int = 0) -> Column:
    """Label column assigning each KEY to exactly one named split
    (train/val/test and friends): consecutive bucket ranges over the same
    hash gate, so splits are DISJOINT and EXHAUSTIVE by construction when
    fractions sum to 1 (validated), deterministic across reruns and
    partitionings, and consistent for every table sharing the key. Split
    boundaries are quantized like the gates (1/RESOLUTION); insertion
    order of ``splits`` fixes the ranges, so the same dict always yields
    the same assignment."""
    if not splits:
        raise ValueError("splits must be non-empty")
    total = sum(splits.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1: {total}")
    bucket = sample_bucket(key_col, seed)
    expr = None
    lo = 0
    for name, frac in splits.items():
        hi = lo + _threshold(frac)
        cond = bucket < F.lit(hi)
        expr = F.when(cond, F.lit(name)) if expr is None \
            else expr.when(cond, F.lit(name))
        lo = hi
    # quantization can leave the last few buckets unlabeled; they belong
    # to the final split (exhaustiveness wins over exact quantization)
    return expr.otherwise(F.lit(list(splits)[-1]))


def weighted_sample_topk_grouped(
    df: DataFrame,
    group_cols: list[str],
    key_col: str,
    weight_col: str,
    k: int,
    seed: int = 0,
    score_col: str = "es_key",
) -> DataFrame:
    """Per-GROUP weight-proportional sample of ``k`` keys (the
    per-language / per-source mixing quota shape): same Efraimidis–
    Spirakis race keys, ranked inside each group with one window shuffle
    on the group key instead of the global TakeOrdered. Completes the
    sampling matrix: {uniform, weighted} × {global, grouped, split}."""
    from pyspark.sql import Window

    if k <= 0:
        raise ValueError(f"k must be positive: {k}")
    w = F.col(weight_col).cast("double")
    scored = (
        df.filter(w.isNotNull() & (w > 0) & F.col(key_col).isNotNull())
          .withColumn(score_col, exp_sample_key(F.col(key_col), w, seed))
    )
    win = Window.partitionBy(*group_cols).orderBy(score_col, key_col)
    return scored.withColumn("_rn", F.row_number().over(win)) \
                 .filter(F.col("_rn") <= k).drop("_rn")
