"""Skew-aware aggregation and join helpers (north-rule O12).

The reference is single-node and has no skew story; at web scale a few hot
hosts / high-degree entities dominate shuffle partitions. Two tools:

- ``salted_group_count``: two-phase aggregation — partial count by
  (key, salt), then final sum by key. The first shuffle spreads a hot key
  over ``n_salts`` reducers; the second shuffle moves only ``n_salts``
  partial rows per key. Identical results to a plain groupBy (oracle-
  checked in queries.py), strictly better tail latency under skew.
- ``salted_join_big_to_skewed``: replicate the small side ``n_salts``
  times, salt the big side's key — classic broadcast-free skew join for
  when AQE's runtime skew split isn't available (e.g. disabled AQE or
  deterministic plans). With AQE on (our default), prefer AQE.

Salts derive from xxhash64 of the full row's stable id (or a random-ish
spread column) — deterministic per row, uniform across salts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def host_col(url: Column) -> Column:
    """Host part of a url (the canonical hot key for web corpora)."""
    return F.parse_url(url, F.lit("HOST"))


def _hashable_columns(df: DataFrame) -> list[str]:
    """Default salt columns — shared recursive-map-safe filter (see
    sources/io.hashable_columns). Full-content duplicates still collapse
    to one salt — pass an explicit spread_col when rows of a hot key can
    be byte-identical."""
    from ..sources.io import hashable_columns

    return hashable_columns(df)


def salted_group_count(
    df: DataFrame,
    key_col: str,
    n_salts: int = 16,
    spread_col: str | None = None,
    count_alias: str = "cnt",
) -> DataFrame:
    """groupBy(key).count() with two-phase salting. Result-identical to
    the direct aggregation.

    Salt is a hash of stable row content (``spread_col`` if given, else all
    columns) — NEVER ``monotonically_increasing_id()``, which re-assigns
    rows to different shuffle partitions when a task is retried (duplicate/
    loss hazard on nondeterministic repartition)."""
    if spread_col:
        salt = F.pmod(F.xxhash64(F.col(spread_col).cast("string")), n_salts)
    else:
        cols = _hashable_columns(df)
        salt = F.pmod(F.xxhash64(*[F.col(c) for c in cols]), n_salts)
    salted = df.withColumn("_salt", salt)
    partial = salted.groupBy(key_col, "_salt").agg(
        F.count("*").alias("_partial"))
    return partial.groupBy(key_col).agg(
        F.sum("_partial").cast("bigint").alias(count_alias))


def salted_join_big_to_skewed(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    spread_cols: list[str] | None = None,
) -> DataFrame:
    """Equi-join where ``big`` has skewed keys: replicate ``small``
    n_salts times with an explicit salt column, salt ``big`` rows
    deterministically (content hash over ``spread_cols``, default all of
    ``big``'s columns — stable under task retry), join on (key, salt)."""
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("_salt")
    small_rep = small.select("*", salts)
    cols = spread_cols if spread_cols else _hashable_columns(big)
    big_salted = big.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in cols]), n_salts).cast("int"),
    )
    return big_salted.join(small_rep, [key, "_salt"]).drop("_salt")
