"""Table profiling — per-column data-quality statistics in two passes.

Every ingest pipeline wants the same first report over a new table: row
count, per-column null rate, distinct cardinality, range, and the most
frequent values (the skew/dirt fingerprint). The reference has no
profiler (single-node, schema-known collections); at 10^12 rows this is
how you discover the hot keys to salt and the dirt to route.

Shape:

- **Pass 1** — ONE ``agg`` over the table computes count / nulls / min /
  max for every requested column simultaneously (all map-side
  combinable; a single reduce to one row).
- **Pass 2** — a ``stack`` melt to ``(column, value)`` rows, one
  combinable groupBy, then per-column top-k by a window over the
  (column) partition. The window partitions by COLUMN NAME, so its
  width is the per-column distinct count — fine for a profile report;
  for a single hot column at full-web cardinality use
  ``operators/sketch.cms_heavy_hitters`` instead (documented trade).
- ``exact_distinct=False`` (default) uses ``approx_count_distinct``
  (HLL++, mergeable, no extra shuffle); ``True`` computes exact
  distincts (one expand) and is what the DuckDB value-hash oracle pins.

Values are profiled as strings (uniform report schema across column
types); NULLs are excluded from min/max/top-k and counted separately.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    top_k: int = 5,
    exact_distinct: bool = False,
) -> DataFrame:
    """One row per profiled column:
    ``column, n_rows, n_nulls, n_distinct, min_value, max_value,
    top_values`` (array of the ``top_k`` most frequent non-null string
    values, frequency desc then value asc)."""
    cols = columns if columns is not None else df.columns
    if not cols:
        raise ValueError("no columns to profile")
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"columns not in frame: {missing}")

    casted = df.select(
        *[F.col(c).cast("string").alias(c) for c in cols])

    # pass 1 aggregates on the NATIVE types (numeric min/max order, not
    # lexicographic) and stringifies only the result
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
             .alias(f"{c}__nulls"),
            (F.count_distinct(F.col(c)) if exact_distinct
             else F.approx_count_distinct(F.col(c)))
            .alias(f"{c}__nd"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    one = df.agg(*aggs)
    stats = one.select(F.explode(F.array(*[
        F.struct(
            F.lit(c).alias("column"),
            F.col(f"{c}__n").alias("n_rows"),
            F.col(f"{c}__nulls").alias("n_nulls"),
            F.col(f"{c}__nd").alias("n_distinct"),
            F.col(f"{c}__min").alias("min_value"),
            F.col(f"{c}__max").alias("max_value"),
        ) for c in cols])).alias("s")).select("s.*")

    melt_expr = "stack({n}, {pairs}) as (column, value)".format(
        n=len(cols),
        pairs=", ".join(f"'{c}', `{c}`" for c in cols))
    freq = (
        casted.select(F.expr(melt_expr))
        .where(F.col("value").isNotNull())
        .groupBy("column", "value").agg(F.count("*").alias("cnt"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("column").orderBy(
        F.col("cnt").desc(), F.col("value").asc())
    top = (
        freq.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= top_k)
        .groupBy("column")
        .agg(F.transform(
            F.array_sort(F.collect_list(
                F.struct(F.col("_rn"), F.col("value")))),
            lambda s: s["value"]).alias("top_values"))
    )
    return stats.join(top, "column", "left").select(
        "column", "n_rows", "n_nulls", "n_distinct",
        "min_value", "max_value",
        F.coalesce(F.col("top_values"),
                   F.array().cast("array<string>")).alias("top_values"))
