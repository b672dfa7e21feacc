"""Codebase KG pipeline: python files -> symbol nodes + defines/calls edges.

The Spark restatement of the reference's ``codebase ingest`` trace
(SURVEY §3.3 / ``codebase.py:453-741``): per-file AST extraction
(``python_ast_extractor.py:96-383`` semantics, in textcore/pyast.py) as a
pandas UDF, then the 3-strategy call resolution of
``python_edge_resolver.py:190-238`` — exact qualified name,
``self.method`` -> ``Class.method`` rewrite, bare name — expressed as
broadcast candidate joins with a deterministic window tie-break
(same-file preferred, then file path / line order, replacing the
reference's index-insertion-order 'first match').
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import StringType

from ..functions.keys import file_key_col, symbol_key_col


@F.pandas_udf(StringType())
def _extract_json_udf(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
    from ..textcore.pyast import extract_symbols

    for s in batches:
        yield s.map(lambda src: json.dumps(extract_symbols(src or "")))


_AST_SCHEMA = (
    "struct<symbols: array<struct<name:string, qualified_name:string,"
    " kind:string, visibility:string, signature:string, start_line:int,"
    " end_line:int, parent_symbol:string, decorators:array<string>,"
    " bases:array<string>,"
    " calls:array<struct<name:string, qualified_name:string>>>>,"
    " imports: array<struct<module:string, name:string, alias:string>>,"
    " error:string>"
)


def analyzed_files(files: DataFrame, path_col: str = "rel_path",
                   source_col: str = "source") -> DataFrame:
    """(rel_path, source) -> + python_ast struct column (narrow)."""
    return files.withColumn(
        "python_ast",
        F.from_json(_extract_json_udf(F.col(source_col)), _AST_SCHEMA),
    )


def symbols_table(analyzed: DataFrame) -> DataFrame:
    """-> codebase_symbols rows with file-scoped keys (keys.py rules)."""
    s = analyzed.select(
        "rel_path", F.explode("python_ast.symbols").alias("sym"))
    return s.select(
        symbol_key_col(F.col("rel_path"), F.col("sym.qualified_name"))
        .alias("symbol_key"),
        F.col("sym.name").alias("name"),
        F.col("sym.qualified_name").alias("qualified_name"),
        F.col("sym.kind").alias("kind"),
        F.col("sym.visibility").alias("visibility"),
        F.col("sym.signature").alias("signature"),
        F.col("rel_path").alias("file_path"),
        F.col("sym.start_line").alias("start_line"),
        F.col("sym.end_line").alias("end_line"),
        F.col("sym.parent_symbol").alias("parent_symbol"),
        F.col("sym.calls").alias("calls"),
    )


def defines_edges(symbols: DataFrame) -> DataFrame:
    """file -> symbol 'defines' edges (deduped)."""
    return (
        symbols.select(
            F.concat(F.lit("codebase_files/"),
                     file_key_col(F.col("file_path"))).alias("src"),
            F.concat(F.lit("codebase_symbols/"),
                     F.col("symbol_key")).alias("dst"),
            F.lit("defines").alias("rel"),
            F.col("file_path"),
            F.col("qualified_name").alias("symbol_name"),
        )
        .dropDuplicates(["src", "dst", "rel"])
    )


def calls_edges(symbols: DataFrame) -> DataFrame:
    """symbol -> symbol 'calls' edges via the 3-strategy ladder."""
    index = symbols.select(
        F.col("symbol_key").alias("t_key"),
        F.col("qualified_name").alias("t_qname"),
        F.col("name").alias("t_name"),
        F.col("file_path").alias("t_file"),
        F.col("start_line").alias("t_line"),
    ).cache()
    bindex = F.broadcast(index)

    calls = symbols.select(
        F.col("symbol_key").alias("caller_key"),
        F.col("qualified_name").alias("caller_qname"),
        F.col("file_path").alias("caller_file"),
        F.explode("calls").alias("c"),
    ).select(
        "caller_key", "caller_qname", "caller_file",
        F.col("c.name").alias("call_name"),
        F.col("c.qualified_name").alias("call_qname"),
    )

    # strategy 1: exact qualified name
    s1 = calls.join(bindex, calls.call_qname == bindex.t_qname) \
        .withColumn("strategy", F.lit(1))
    # strategy 2: self.method -> Class.method (caller must be Class.method)
    s2 = (
        calls.filter(F.col("call_qname").startswith("self.")
                     & F.col("caller_qname").contains("."))
        .withColumn(
            "rewritten",
            F.concat(
                F.expr("substring(caller_qname, 1,"
                       " length(caller_qname) - length(substring_index(caller_qname, '.', -1)) - 1)"),
                F.lit("."), F.col("call_name")),
        )
        .join(bindex, F.col("rewritten") == bindex.t_qname)
        .drop("rewritten")
        .withColumn("strategy", F.lit(2))
    )
    # strategy 3: bare name
    s3 = calls.join(bindex, calls.call_name == bindex.t_name) \
        .withColumn("strategy", F.lit(3))

    cands = s1.unionByName(s2).unionByName(s3)
    w = Window.partitionBy("caller_key", "call_qname").orderBy(
        F.asc("strategy"),
        F.desc(F.col("caller_file") == F.col("t_file")),
        F.asc("t_file"), F.asc("t_line"),
    )
    resolved = cands.withColumn("_rn", F.row_number().over(w)) \
        .filter(F.col("_rn") == 1)
    return (
        resolved.select(
            F.concat(F.lit("codebase_symbols/"), F.col("caller_key")).alias("src"),
            F.concat(F.lit("codebase_symbols/"), F.col("t_key")).alias("dst"),
            F.lit("calls").alias("rel"),
            F.col("caller_qname").alias("caller"),
            F.col("call_qname").alias("callee"),
        )
        .dropDuplicates(["src", "dst", "rel"])
    )


def resolve_imports(
    imports: DataFrame,
    module_index: DataFrame,
    max_depth: int = 8,
) -> DataFrame:
    """Resolve dotted imports against a module index with hierarchical
    parent-module fallback (``import_resolver.py:31-86``): try the full
    dotted path, then each parent prefix, keeping the LONGEST prefix that
    resolves. Spark-first: explode the prefix ladder, broadcast-join the
    module index, window-rank by prefix length.

    imports:      (src_file string, module string)
    module_index: (module string, rel_path string)  — the prebuilt
                  dotted-module -> file map (broadcast dimension)
    -> (src_file, module, resolved_path, matched_prefix)
    """
    # prefix ladder: 'a.b.c' -> ['a.b.c', 'a.b', 'a'] (source order kept)
    parts = F.split(F.col("module"), r"\.")
    ladder = F.transform(
        F.sequence(F.size(parts), F.lit(1), F.lit(-1)),
        lambda n: F.concat_ws(".", F.slice(parts, 1, n)),
    )
    cands = imports.select(
        "src_file", "module", F.explode(ladder).alias("prefix"))

    idx = F.broadcast(module_index.select(
        F.col("module").alias("prefix"), F.col("rel_path")))
    hits = cands.join(idx, "prefix")

    w = Window.partitionBy("src_file", "module").orderBy(
        F.desc(F.length("prefix")), F.asc("rel_path"))
    return (
        hits.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("src_file", "module",
                F.col("rel_path").alias("resolved_path"),
                F.col("prefix").alias("matched_prefix"))
    )


def absolutize_relative_imports(imps: DataFrame) -> DataFrame:
    """Rewrite relative modules ('.x' / '..x' / '.' as encoded by pyast's
    leading-dot convention) to absolute dotted paths against the importing
    file's package: 'from .sub import y' in pkg/main.py -> 'pkg.sub', and
    'from . import y' -> 'pkg.y' (prefix-ladder resolution then falls back
    to 'pkg' when y is an attribute, not a submodule). Without this,
    relative imports either vanish or resolve against same-named TOP-LEVEL
    modules — systematically wrong edges."""
    dots = F.length(F.regexp_extract(F.col("module"), r"^(\.+)", 1))
    rem = F.regexp_replace(F.col("module"), r"^\.+", "")
    parts = F.split(F.col("src_file"), "/")
    pkg = F.slice(parts, 1, F.greatest(F.size(parts) - 1, F.lit(0)))
    keep = F.greatest(F.size(pkg) - (dots - F.lit(1)), F.lit(0))
    prefix = F.when(keep > 0, F.concat_ws(".", F.slice(pkg, 1, keep))) \
              .otherwise(F.lit(""))
    tail = F.when(rem != "", rem).otherwise(F.col("name"))
    abs_module = F.when(dots == 0, F.col("module")).otherwise(
        F.when((prefix == "") | (tail == ""),
               F.concat(prefix, tail))
        .otherwise(F.concat_ws(".", prefix, tail)))
    return imps.withColumn("module", abs_module) \
               .filter(F.col("module") != "")


def imports_edges(analyzed: DataFrame, module_index: DataFrame) -> DataFrame:
    """file -> file 'imports' edges from resolved imports (deduped,
    ``codebase.py:620-635`` edge shape)."""
    imps = analyzed.select(
        F.col("rel_path").alias("src_file"),
        F.explode("python_ast.imports").alias("imp"),
    ).select("src_file",
             F.col("imp.module").alias("module"),
             F.coalesce(F.col("imp.name"), F.lit("")).alias("name")) \
     .filter(F.col("module") != "")
    imps = absolutize_relative_imports(imps) \
        .select("src_file", "module").dropDuplicates()
    resolved = resolve_imports(imps, module_index)
    return (
        resolved.select(
            F.concat(F.lit("codebase_files/"),
                     file_key_col(F.col("src_file"))).alias("src"),
            F.concat(F.lit("codebase_files/"),
                     file_key_col(F.col("resolved_path"))).alias("dst"),
            F.lit("imports").alias("rel"),
            F.col("module"),
        )
        .filter(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst", "rel"])
    )
