"""Entity linking: mention surfaces -> catalog entity ids.

The reference resolves a call/mention with a 3-strategy ladder
(``python_edge_resolver.py:190-238``): exact qualified name, contextual
rewrite (self.method -> Class.method), bare name — preferring a same-file
candidate, else the first. Re-expressed Spark-first:

  1. **candidate generation** — one broadcast join per strategy against the
     entity catalog, keyed by exact surface / normalized surface / bare
     (last-token) name, each tagged with its strategy rank;
  2. **vectorized cosine scoring** — hash-embedding similarity between
     mention surface and entity name over Arrow batches (the dense-embedding
     linking of the north star; semantics of ``backend.py:288-344``);
  3. **window top-1** — ``row_number()`` over
     (strategy_rank asc, same_source desc, score desc, entity_id asc) —
     the deterministic restatement of 'prefer same file, else first'.

The catalog is broadcast (small dim vs web-scale mentions), so the whole
resolution is map-side: no shuffle of the mention table until the final
window, which partitions by mention_id (well-distributed key).

**Catalog-exceeds-broadcast fallback** (``broadcast_catalog=False``): when
the entity catalog itself is web-scale (larger than executor memory allows
broadcasting), the ladder is restated as ONE shuffle-hash join: both sides
are MELTED to (key, strategy) rows — (exact surface, 1), (normalized, 2),
(bare name, 3) — and joined on (key, strategy), so the mention table
shuffles once on a well-distributed string key instead of three times
(one per strategy). Candidates, scoring, and the top-1 window are
identical between modes (asserted by tests).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

from ..functions.embedding import HashEmbedder
from .canonicalize import normalize_surface_col


def _bare_name_col(c) -> F.Column:
    """Last whitespace token of the normalized surface ('bare name')."""
    return F.element_at(F.split(normalize_surface_col(c), " "), -1)


def link_mentions(
    mentions: DataFrame,
    catalog: DataFrame,
    mention_id: str = "mention_id",
    surface: str = "surface",
    source: str = "url",
    entity_id: str = "entity_id",
    entity_name: str = "name",
    entity_source: str = "source",
    dim: int = 64,
    min_score: float = 0.0,
    broadcast_catalog: bool = True,
    backend_factory=HashEmbedder,
) -> DataFrame:
    """-> (mention_id, surface, entity_id, strategy, score).

    Unlinkable mentions (no candidate on any strategy) are absent from the
    output — callers left-join if they need nulls. Set
    ``broadcast_catalog=False`` when the catalog exceeds broadcastable
    size (see module docstring: single melted shuffle-hash join).
    ``backend_factory`` is any ``EmbedderBackend`` class (e.g. the
    checkpoint-loading ``NumpyTokenTransformer``): it is constructed
    LAZILY inside the scoring UDF via the executor-global singleton, so
    a heavy model loads once per worker process, never on the driver and
    never per task.
    """
    men = mentions.select(
        F.col(mention_id).alias("_mid"),
        F.col(surface).alias("_surface"),
        F.col(source).alias("_msrc"),
        normalize_surface_col(F.col(surface)).alias("_mnorm"),
        _bare_name_col(F.col(surface)).alias("_mbare"),
    )
    cat = catalog.select(
        F.col(entity_id).alias("_eid"),
        F.col(entity_name).alias("_ename"),
        F.col(entity_source).alias("_esrc"),
        normalize_surface_col(F.col(entity_name)).alias("_enorm"),
        _bare_name_col(F.col(entity_name)).alias("_ebare"),
    )
    if broadcast_catalog:
        cat = F.broadcast(cat)
        # strategy ladder: 1 exact surface, 2 normalized, 3 bare name —
        # three MAP-SIDE joins, zero shuffles of the mention table
        c1 = men.join(cat, men._surface == cat._ename).withColumn(
            "strategy", F.lit(1))
        c2 = men.join(cat, men._mnorm == cat._enorm).withColumn(
            "strategy", F.lit(2))
        c3 = men.join(cat, men._mbare == cat._ebare).withColumn(
            "strategy", F.lit(3))
        cands = c1.unionByName(c2).unionByName(c3)
    else:
        # melted single-shuffle ladder: one (key, strategy) equi-join
        men_m = men.select(
            "_mid", "_surface", "_msrc",
            F.explode(F.array(
                F.struct(F.col("_surface").alias("_key"),
                         F.lit(1).alias("strategy")),
                F.struct(F.col("_mnorm").alias("_key"),
                         F.lit(2).alias("strategy")),
                F.struct(F.col("_mbare").alias("_key"),
                         F.lit(3).alias("strategy")),
            )).alias("_k"),
        ).select("_mid", "_surface", "_msrc", "_k._key", "_k.strategy")
        cat_m = cat.select(
            "_eid", "_ename", "_esrc",
            F.explode(F.array(
                F.struct(F.col("_ename").alias("_key"),
                         F.lit(1).alias("strategy")),
                F.struct(F.col("_enorm").alias("_key"),
                         F.lit(2).alias("strategy")),
                F.struct(F.col("_ebare").alias("_key"),
                         F.lit(3).alias("strategy")),
            )).alias("_k"),
        ).select("_eid", "_ename", "_esrc", "_k._key", "_k.strategy")
        cands = men_m.join(cat_m.hint("SHUFFLE_HASH"),
                           ["_key", "strategy"]).drop("_key")

    @F.pandas_udf("double")
    def _score(it: Iterator[tuple[pd.Series, pd.Series]]) -> Iterator[pd.Series]:
        from ..functions.embedding import get_backend

        emb = get_backend(backend_factory, dim)  # once per WORKER (O7)
        for a, b in it:
            ma = emb.encode(a.fillna("").tolist())
            mb = emb.encode(b.fillna("").tolist())
            yield pd.Series(np.einsum("ij,ij->i", ma, mb).astype(float))

    scored = cands.withColumn("score", _score("_surface", "_ename")) \
                  .filter(F.col("score") >= min_score) \
                  .withColumn("same_source",
                              (F.col("_msrc") == F.col("_esrc")).cast("int"))

    w = Window.partitionBy("_mid").orderBy(
        F.asc("strategy"), F.desc("same_source"),
        F.desc("score"), F.asc("_eid"),
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            F.col("_mid").alias(mention_id),
            F.col("_surface").alias(surface),
            F.col("_eid").alias(entity_id),
            "strategy", "score",
        )
    )
