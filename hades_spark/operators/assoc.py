"""Association-rule mining over transaction baskets — pairwise
support / confidence / lift with a minimum-support prune (the useful
core of Apriori/FP-growth at web scale, where 2-itemsets are what
anyone acts on: co-occurring entities, co-clicked hosts, co-imported
modules).

Shape: baskets are (basket_id, item) DISTINCT membership rows. Item
supports are one combinable groupBy; the pair join self-joins the
membership table keyed on basket_id — bounded by basket width, so the
skew guard is ``max_basket_size`` (a degenerate basket containing half
the catalog would square; real baskets are tens of items). The
min-support prune applies to ITEMS BEFORE the pair join (Apriori's
monotonicity: a pair can't beat the support of its rarer item), which
is what keeps the candidate space linear-ish at 10^12 baskets.

Metrics (n = basket count):
  support(a,b) = n_ab / n
  confidence(a->b) = n_ab / n_a
  lift(a,b) = n * n_ab / (n_a * n_b)
Rules are emitted in BOTH directions (a->b and b->a) since confidence
is asymmetric.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def association_rules(
    baskets: DataFrame,
    basket_col: str = "basket_id",
    item_col: str = "item",
    min_support: float = 0.01,
    max_basket_size: int = 200,
) -> DataFrame:
    """(antecedent, consequent, n_pair, support, confidence, lift) for
    every ordered pair of distinct items whose PAIR support clears
    ``min_support``. Baskets wider than ``max_basket_size`` are dropped
    whole (documented recall trade; the cap is the self-join guard)."""
    if not 0.0 < min_support <= 1.0:
        raise ValueError(f"min_support must be in (0, 1], got {min_support}")
    m = baskets.select(F.col(basket_col).alias("_b"),
                       F.col(item_col).alias("_i")).distinct()
    sized = m.groupBy("_b").agg(F.count("*").alias("_w")) \
             .where(F.col("_w") <= max_basket_size).select("_b")
    m = m.join(sized, "_b")

    # sized is already one row per surviving basket — count the small
    # aggregated side, not a second distinct over the membership table
    n_baskets = sized.count()
    if n_baskets == 0:
        raise ValueError("no baskets after the size cap")

    item_n = m.groupBy("_i").agg(F.count("*").alias("_ni"))
    # Apriori prune: an item below min support cannot form a valid pair
    keep = item_n.where(F.col("_ni") >= F.ceil(
        F.lit(min_support) * F.lit(n_baskets)))
    m2 = m.join(keep.select("_i"), "_i")

    a = m2.select("_b", F.col("_i").alias("x"))
    b = m2.select("_b", F.col("_i").alias("y"))
    pairs = (a.join(b, "_b").where(F.col("x") != F.col("y"))
             .groupBy("x", "y").agg(F.count("*").alias("n_pair"))
             .where(F.col("n_pair") >= F.ceil(
                 F.lit(min_support) * F.lit(n_baskets))))
    nx = item_n.select(F.col("_i").alias("x"), F.col("_ni").alias("_nx"))
    ny = item_n.select(F.col("_i").alias("y"), F.col("_ni").alias("_ny"))
    return (
        pairs.join(nx, "x").join(ny, "y")
        .select(
            F.col("x").alias("antecedent"),
            F.col("y").alias("consequent"),
            "n_pair",
            (F.col("n_pair") / F.lit(n_baskets)).alias("support"),
            (F.col("n_pair") / F.col("_nx")).alias("confidence"),
            (F.lit(n_baskets) * F.col("n_pair")
             / (F.col("_nx") * F.col("_ny"))).alias("lift"))
    )
