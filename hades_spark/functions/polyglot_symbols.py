"""Spark binding for multi-language symbol extraction (X8).

Same wrapping shape as the python AST path (``functions/ast_symbols.py``):
one Arrow-batched pandas UDF per file returning ``array<struct>``, exploded
into a symbols table; import statements become file->module edges joined
against the defined-symbol index (broadcast — the per-file symbol vocabulary
is tiny next to the file contents). Reference semantics:
``extractors_treesitter.py:100-938`` (see textcore/polyglot.py).
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import StringType

from .keys import file_key_col, symbol_key_col


@F.pandas_udf(StringType())
def _polyglot_json_udf(
    it: Iterator[tuple[pd.Series, pd.Series]],
) -> Iterator[pd.Series]:
    from ..textcore.polyglot import extract_symbols

    for path_s, src_s in it:
        yield pd.Series([
            json.dumps(extract_symbols(p or "", s or ""))
            for p, s in zip(path_s, src_s)
        ])


_POLY_SCHEMA = (
    "struct<language: string, symbols: map<string,"
    " array<struct<name:string, statement:string, line:int>>>>"
)


def polyglot_symbols_table(files: DataFrame, path_col: str = "rel_path",
                           source_col: str = "source") -> DataFrame:
    """(rel_path, source) -> one row per symbol:
    (rel_path, language, category, name, line, symbol_key).

    Narrow until the explode; symbol keys follow the same file-scoped rule
    as the python path (``keys.py``), so multi-language and python symbols
    live in one namespace.
    """
    parsed = files.select(
        F.col(path_col).alias("rel_path"),
        F.from_json(
            _polyglot_json_udf(F.col(path_col), F.col(source_col)),
            _POLY_SCHEMA,
        ).alias("p"),
    )
    exploded = (
        parsed
        .select("rel_path", F.col("p.language").alias("language"),
                F.explode("p.symbols").alias("category", "items"))
        .select("rel_path", "language", "category",
                F.explode("items").alias("s"))
    )
    return exploded.select(
        "rel_path", "language", "category",
        F.coalesce(F.col("s.name"), F.col("s.statement")).alias("name"),
        F.col("s.line").alias("line"),
        symbol_key_col(
            F.col("rel_path"),
            F.coalesce(F.col("s.name"), F.col("s.statement"))).alias("symbol_key"),
    )


def polyglot_defines_edges(symbols: DataFrame) -> DataFrame:
    """file -[defines]-> symbol edges for named (non-import) symbols."""
    named = symbols.filter(
        ~F.col("category").isin("imports", "exports", "includes"))
    return named.select(
        file_key_col(F.col("rel_path")).alias("src"),
        F.col("symbol_key").alias("dst"),
        F.lit("defines").alias("rel"),
        "language", "category",
    )


def polyglot_import_edges(symbols: DataFrame) -> DataFrame:
    """file -[imports]-> statement edges (module resolution is corpus-
    dependent; the raw statement is the stable dst surface)."""
    imports = symbols.filter(
        F.col("category").isin("imports", "includes"))
    return imports.select(
        file_key_col(F.col("rel_path")).alias("src"),
        F.col("name").alias("dst"),
        F.lit("imports").alias("rel"),
        "language", "category",
    )
