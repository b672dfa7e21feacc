"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship KG-construction pipeline over a
deterministic synthetic page corpus (the BASELINE.json input_hint shape) and
returns the canonical (subj, pred, obj) edge table. ``queries()`` /
``oracle_sql()`` cover the operator inventory of SURVEY.md §2 over the
driver's parquet tables, cross-checked against DuckDB.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: synthetic pages -> deterministic text extraction -> SVO
    triples -> LSH+CC canonicalization -> deduped canonical edge table."""
    from hades_spark.pipeline.kg import run_kg_pipeline

    return run_kg_pipeline(spark, n_pages=200, seed=42)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from hades_spark.queries import SPARK_QUERIES

    return dict(SPARK_QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted for genuinely
    non-SQL-expressible ops, which the driver checks rows-only)."""
    from hades_spark.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
