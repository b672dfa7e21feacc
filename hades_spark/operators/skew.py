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


def salted_group_count(
    df: DataFrame,
    key_col: str,
    n_salts: int = 16,
    spread_col: str | None = None,
    count_alias: str = "cnt",
) -> DataFrame:
    """groupBy(key).count() with two-phase salting. Result-identical to
    the direct aggregation."""
    spread = (F.col(spread_col) if spread_col
              else F.monotonically_increasing_id())
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(spread.cast("string")), n_salts))
    partial = salted.groupBy(key_col, "_salt").agg(
        F.count("*").alias("_partial"))
    return partial.groupBy(key_col).agg(
        F.sum("_partial").cast("bigint").alias(count_alias))


def salted_join_big_to_skewed(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
) -> DataFrame:
    """Equi-join where ``big`` has skewed keys: replicate ``small``
    n_salts times with an explicit salt column, salt ``big`` rows
    deterministically, join on (key, salt)."""
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("_salt")
    small_rep = small.select("*", salts)
    big_salted = big.withColumn(
        "_salt",
        F.pmod(F.xxhash64(F.monotonically_increasing_id()), n_salts)
        .cast("int"),
    )
    return big_salted.join(small_rep, [key, "_salt"]).drop("_salt")
