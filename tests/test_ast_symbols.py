"""Codebase KG pipeline tests (python AST symbols + defines/calls edges)."""

from hades_spark.functions.ast_symbols import (
    analyzed_files, calls_edges, defines_edges, symbols_table,
)
from hades_spark.textcore.pyast import extract_symbols

SRC_A = '''
import os
from collections import OrderedDict

def helper(x):
    return x + 1

class Pool:
    def acquire(self):
        return helper(1)

    def release(self):
        self.acquire()
'''

SRC_B = '''
from mypkg.a import Pool

def main():
    p = Pool()
    helper(2)
'''


class TestPyAst:
    def test_symbols_and_qualified_names(self):
        out = extract_symbols(SRC_A)
        assert out["error"] is None
        q = {s["qualified_name"]: s for s in out["symbols"]}
        assert set(q) == {"helper", "Pool", "Pool.acquire", "Pool.release"}
        assert q["Pool.acquire"]["kind"] == "method"
        assert q["Pool.acquire"]["parent_symbol"] == "Pool"
        assert q["helper"]["signature"] == "helper(x)"

    def test_self_call_kept_verbatim(self):
        out = extract_symbols(SRC_A)
        rel = {s["qualified_name"]: s["calls"] for s in out["symbols"]}
        assert {"name": "acquire", "qualified_name": "self.acquire"} in \
            rel["Pool.release"]

    def test_imports(self):
        out = extract_symbols(SRC_A)
        assert {"module": "os", "alias": "os"} in out["imports"]

    def test_syntax_error_isolated(self):
        out = extract_symbols("def broken(:")
        assert out["symbols"] == [] and "SyntaxError" in out["error"]


class TestEdges:
    def test_defines_and_calls(self, spark):
        files = spark.createDataFrame(
            [("mypkg/a.py", SRC_A), ("mypkg/b.py", SRC_B)],
            "rel_path string, source string")
        analyzed = analyzed_files(files)
        syms = symbols_table(analyzed).cache()
        assert syms.count() == 5  # 4 in a.py + main in b.py

        d = {(r["src"], r["dst"]) for r in defines_edges(syms).collect()}
        assert ("codebase_files/mypkg_a_py",
                "codebase_symbols/mypkg_a_py__helper") in d

        c = {(r["caller"], r["callee"]): r for r in calls_edges(syms).collect()}
        # strategy 2: self.acquire -> Pool.acquire (same file)
        assert ("Pool.release", "self.acquire") in c
        assert c[("Pool.release", "self.acquire")]["dst"] == \
            "codebase_symbols/mypkg_a_py__Pool_acquire"
        # strategy 3 cross-file: bare helper resolved to a.py's helper
        assert ("main", "helper") in c
        assert c[("main", "helper")]["dst"] == \
            "codebase_symbols/mypkg_a_py__helper"
        # strategy 1/3: Pool() call resolves to the class symbol
        assert ("main", "Pool") in c


class TestImportResolution:
    def test_prefix_ladder_longest_match(self, spark):
        from hades_spark.functions.ast_symbols import resolve_imports

        imports = spark.createDataFrame(
            [("x.py", "mypkg.sub.mod"), ("x.py", "mypkg.other.deep.thing"),
             ("x.py", "unknown.module")],
            "src_file string, module string")
        index = spark.createDataFrame(
            [("mypkg", "mypkg/__init__.py"),
             ("mypkg.sub.mod", "mypkg/sub/mod.py"),
             ("mypkg.other", "mypkg/other/__init__.py")],
            "module string, rel_path string")
        out = {r["module"]: r for r in
               resolve_imports(imports, index).collect()}
        # exact match wins over parent prefixes
        assert out["mypkg.sub.mod"]["resolved_path"] == "mypkg/sub/mod.py"
        # hierarchical fallback: deepest existing parent
        assert out["mypkg.other.deep.thing"]["matched_prefix"] == "mypkg.other"
        # unresolvable imports are absent
        assert "unknown.module" not in out

    def test_imports_edges(self, spark):
        from hades_spark.functions.ast_symbols import (
            analyzed_files, imports_edges)

        files = spark.createDataFrame(
            [("pkg/b.py", "from pkg.a import Pool\nimport os\n"),
             ("pkg/a.py", "x = 1\n")],
            "rel_path string, source string")
        index = spark.createDataFrame(
            [("pkg.a", "pkg/a.py"), ("pkg.b", "pkg/b.py")],
            "module string, rel_path string")
        edges = {(r["src"], r["dst"]) for r in
                 imports_edges(analyzed_files(files), index).collect()}
        assert edges == {("codebase_files/pkg_b_py", "codebase_files/pkg_a_py")}


class TestRelativeImports:
    def test_relative_imports_absolutized_and_resolved(self, spark):
        from pyspark.sql import functions as F

        from hades_spark.functions.ast_symbols import (
            analyzed_files, imports_edges)

        files = spark.createDataFrame([
            ("pkg/main.py",
             "from .sub import helper\n"
             "from . import util\n"
             "from ..top import thing\n"
             "import os\n"),
            ("pkg/sub.py", "def helper():\n    return 1\n"),
            ("pkg/util.py", "X = 1\n"),
            ("top.py", "thing = 2\n"),
            ("sub.py", "DECOY = True\n"),  # same-named TOP-LEVEL module
        ], "rel_path string, source string")
        module_index = spark.createDataFrame([
            ("pkg.sub", "pkg/sub.py"), ("pkg.util", "pkg/util.py"),
            ("top", "top.py"), ("sub", "sub.py"), ("os", "<stdlib>"),
        ], "module string, rel_path string")

        edges = imports_edges(analyzed_files(files), module_index)
        got = {(r["src"], r["dst"]) for r in
               edges.filter(F.col("src").contains("pkg_main")).collect()}
        # '.sub' resolves to pkg/sub.py, NOT the top-level decoy sub.py
        assert ("codebase_files/pkg_main_py",
                "codebase_files/pkg_sub_py") in got
        assert ("codebase_files/pkg_main_py",
                "codebase_files/sub_py") not in got
        # 'from . import util' resolves to pkg/util.py
        assert ("codebase_files/pkg_main_py",
                "codebase_files/pkg_util_py") in got
        # '..top' from pkg/ climbs to the root package -> top.py
        assert ("codebase_files/pkg_main_py",
                "codebase_files/top_py") in got

    def test_pyast_encodes_levels(self):
        from hades_spark.textcore.pyast import extract_symbols

        out = extract_symbols(
            "from . import a\nfrom .b import c\nfrom ..d import e\n"
            "import plain\n")
        mods = [i["module"] for i in out["imports"]]
        assert mods == [".", ".b", "..d", "plain"]
