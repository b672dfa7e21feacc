"""Bloom-filter runtime pruning for big-to-medium semi-joins.

The 100-TB join problem this solves: ``big LEFT SEMI JOIN small`` where
``small`` is too large to broadcast as a hash relation (tens of millions
of keys) but the JOIN SELECTIVITY is high — most of ``big``'s rows match
nothing. A plain sort-merge semi-join shuffles ALL of ``big`` on the key;
with a bloom filter built from ``small``'s keys and broadcast to the scan
side, the shuffle input shrinks to ``|matches| + fp_rate * |big|`` rows.
This is the runtime-filter / sideways-information-passing pattern
(Spark's own ``spark.sql.optimizer.runtime.bloomFilter`` applies it
opportunistically; this operator makes it explicit, tunable, and usable
from the DataFrame API with a deterministic layout the oracle can check).

Reference parity: the reference prunes edge candidates against in-memory
key sets before hitting the store (``python_edge_resolver.py:143-181``
seen-set anti-joins); a bloom filter is the bounded-memory version of the
same idea at web scale.

Layout: ``n_bits`` bits packed into int64 words, carried as ONE row with
a ``map<int, bigint>`` of the NON-ZERO words only (a sparse bitmap — for
well-sized filters most words are non-zero, but an over-provisioned
filter costs only its set bits). The single row is broadcast-joined to
the big side; membership is pure JVM column algebra (seeded xxhash64 →
word lookup → bit test), no UDF, no driver collect.

Memory envelope: ``n_bits / 8`` bytes ceiling (map overhead ~3x). The
default 2^20 bits = 128 KiB holds ~10^5 keys at fp≈1% (optimal k≈7,
here 5 for cheaper probes: fp = (1 - e^{-kn/m})^k). Size m ≈ 10 bits
per expected distinct key; the builder warns past 2^27 bits (~48 MiB as
a map) — beyond that, prefer partitioned semi-join pre-filtering.

Exactness: ``bloom_semi_join`` CONFIRMS candidates with a real semi-join
on the key, so false positives never reach the output — the bloom only
reduces the confirm join's shuffle input. ``confirm=False`` exposes the
raw candidate set for pipelines that tolerate fp (e.g. cache warming).
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame, functions as F

_WORD = 64


def _validate(n_bits: int, n_hashes: int) -> None:
    if n_bits < _WORD or n_bits % _WORD:
        raise ValueError(f"n_bits must be a positive multiple of 64: {n_bits}")
    if not 1 <= n_hashes <= 16:
        raise ValueError(f"n_hashes must be in [1, 16]: {n_hashes}")
    if n_bits > 1 << 27:
        warnings.warn(
            f"bloom of {n_bits} bits (~{n_bits // (1 << 23)} MiB as words) "
            "is a large broadcast; prefer a partitioned pre-filter",
            RuntimeWarning, stacklevel=3)


def _positions(value_col, n_bits: int, n_hashes: int) -> list:
    """The ``n_hashes`` bit positions a value sets/tests — seeded xxhash64
    pmod'd into [0, n_bits), one independent row family per seed (the CMS
    cell construction, operators/sketch.py:cms_cells)."""
    return [
        F.pmod(F.xxhash64(F.lit(i), value_col), F.lit(n_bits))
        for i in range(n_hashes)
    ]


def bloom_build(
    keys: DataFrame,
    key_col: str,
    n_bits: int = 1 << 20,
    n_hashes: int = 5,
) -> DataFrame:
    """-> ONE row ``(bloom_words: map<int,bigint>)`` — the packed bitmap
    of ``keys[key_col]``'s distinct values.

    Fully distributed: explode to (word, mask) and ``bit_or`` per word —
    map-side combinable to <= n_bits/64 rows per partition, so the
    shuffle moves at most ``partitions * n_words`` tiny rows no matter
    how many key rows went in. NULL keys are skipped (SQL semi-join
    semantics: NULL matches nothing).
    """
    _validate(n_bits, n_hashes)
    pos = (
        keys.filter(F.col(key_col).isNotNull())
        .select(F.explode(F.array(
            *_positions(F.col(key_col), n_bits, n_hashes))).alias("pos"))
    )
    words = (
        pos.select(
            (F.col("pos") / _WORD).cast("int").alias("w"),
            F.expr(f"shiftleft(CAST(1 AS BIGINT), "
                   f"CAST(pmod(pos, {_WORD}) AS INT))").alias("m"))
        .groupBy("w")
        .agg(F.bit_or("m").alias("word"))
    )
    return words.agg(
        F.map_from_entries(
            F.coalesce(
                F.collect_list(F.struct("w", "word")),
                F.array().cast("array<struct<w:int,word:bigint>>"),
            )
        ).alias("bloom_words")
    )


def bloom_might_contain(value_col, n_bits: int, n_hashes: int):
    """Membership predicate over a ``bloom_words`` column in scope —
    true iff every probed bit is set. False positives possible, false
    negatives impossible. NULL values test false (semi-join semantics).

    Column-amount shifts aren't exposed by pyspark's shiftright wrapper,
    so the bit test is SQL ``getbit(word, pos % 64)`` — still pure JVM
    column algebra inside whole-stage codegen."""
    cond = F.lit(True)
    for i in range(n_hashes):
        p = F.pmod(F.xxhash64(F.lit(i), value_col), F.lit(n_bits))
        word = F.coalesce(
            F.element_at(F.col("bloom_words"), (p / _WORD).cast("int")),
            F.lit(0).cast("bigint"))
        bit = F.call_function(
            "getbit", word, F.pmod(p, F.lit(_WORD)).cast("int"))
        cond = cond & (bit == 1)
    return value_col.isNotNull() & cond


def bloom_prune(
    big: DataFrame,
    key_col: str,
    bloom: DataFrame,
    n_bits: int = 1 << 20,
    n_hashes: int = 5,
) -> DataFrame:
    """Rows of ``big`` whose key MIGHT be in the filter (superset of the
    true matches). The one-row bloom frame joins in as a broadcast nested
    loop of a single row — effectively a broadcast scalar — and the probe
    filter runs at the scan, BEFORE any exchange a downstream join adds.
    """
    _validate(n_bits, n_hashes)
    return (
        big.join(F.broadcast(bloom))
        .filter(bloom_might_contain(F.col(key_col), n_bits, n_hashes))
        .drop("bloom_words")
    )


def bloom_semi_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str | None = None,
    n_bits: int = 1 << 20,
    n_hashes: int = 5,
    confirm: bool = True,
) -> DataFrame:
    """``big LEFT SEMI JOIN small`` with bloom-pruned shuffle input.

    Exact (the confirm semi-join removes false positives); the bloom's
    only job is to keep non-matching ``big`` rows out of the confirm
    join's exchange. With ``confirm=False`` returns the candidate
    superset (fp_rate-bounded) and no second join.
    """
    small_key = small_key or big_key
    keys = small.select(F.col(small_key).alias(big_key))
    bloom = bloom_build(keys, big_key, n_bits, n_hashes)
    cand = bloom_prune(big, big_key, bloom, n_bits, n_hashes)
    if not confirm:
        return cand
    return cand.join(keys.dropDuplicates([big_key]), big_key, "left_semi")
