"""Entity canonicalization: surface forms -> canonical entity ids.

The reference's canonicalization layer is pure string key rules
(``core/database/keys.py:15-87``); the Spark-native extension required at
web scale (the same real-world entity surfacing under many keys: 'HADES' /
'hades' / 'H.A.D.E.S.') is:

  1. normalize each surface (lower, strip non-alnum runs to single space),
  2. MinHash-LSH over character 3-grams of the squashed form -> candidate
     alias pairs (plus the exact-normalized-form pairs, which LSH finds
     trivially),
  3. exact-Jaccard verification at ``threshold``,
  4. connected components over the verified alias graph,
  5. canonical_id = min(normalized form) within each component.

Every step is a DataFrame op; the CC loop is the only iteration.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, functions as F

from .components import connected_components
from .lsh import char_shingles, verified_pairs

_NON_ALNUM = re.compile(r"[^a-z0-9]+")


def normalize_surface(s: str) -> str:
    """Pure-python twin of normalize_surface_col (for tests / oracles)."""
    return _NON_ALNUM.sub(" ", s.lower()).strip()


def normalize_surface_col(c) -> F.Column:
    return F.trim(F.regexp_replace(F.lower(c), r"[^a-z0-9]+", " "))


def squash_col(c) -> F.Column:
    """Normalized form with spaces removed — the shingling basis, so that
    'Common Crawl' and 'CommonCrawl' share all their 3-grams."""
    return F.regexp_replace(normalize_surface_col(c), " ", "")


def canonical_map(
    surfaces: DataFrame,
    surface_col: str = "surface",
    threshold: float = 0.8,
    num_hashes: int = 16,
    bands: int = 16,
    max_bucket_size: int = 500,
    max_iter: int = 15,
) -> DataFrame:
    """distinct surfaces -> (surface, norm, canonical_id).

    canonical_id is the lexicographically-smallest normalized form in the
    surface's alias component; surfaces with no alias partner canonicalize
    to their own normalized form.
    """
    distinct = (
        surfaces.select(F.col(surface_col).alias("surface"))
        .dropDuplicates(["surface"])
        .withColumn("norm", normalize_surface_col(F.col("surface")))
        .withColumn("squash", squash_col(F.col("surface")))
        .filter(F.length("squash") > 0)
        .cache()
    )

    # alias pairs between normalized forms (dedup identical norms first:
    # they cluster for free via the norm key itself)
    norms = distinct.select("norm", "squash").dropDuplicates(["norm"])
    pairs = verified_pairs(
        norms, "norm", char_shingles(F.col("squash"), 3),
        threshold=threshold, metric="containment",
        num_hashes=num_hashes, bands=bands,
        max_bucket_size=max_bucket_size,
    )

    comp = connected_components(pairs, "a", "b", max_iter=max_iter)

    out = (
        distinct.join(comp, distinct.norm == comp.node, "left")
        .select(
            "surface", "norm",
            F.coalesce(F.col("component"), F.col("norm")).alias("canonical_id"),
        )
    )
    return out
