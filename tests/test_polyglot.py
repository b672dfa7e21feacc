"""Multi-language symbol extraction (X8) tests — per-language grammars plus
the Spark symbols/edges tables. Categories mirror the reference's
tree-sitter extractor (``extractors_treesitter.py:229-597``)."""

from pyspark.sql import functions as F

from hades_spark.textcore.polyglot import detect_language, extract_symbols


def _names(out, cat):
    return [d.get("name") or d.get("statement")
            for d in out["symbols"].get(cat, [])]


class TestDetectLanguage:
    def test_map(self):
        assert detect_language("a/b.ts") == "typescript"
        assert detect_language("x.jsx") == "javascript"
        assert detect_language("m.go") == "go"
        assert detect_language("l.RS".lower()) == "rust"
        assert detect_language("u.hpp") == "cpp"
        assert detect_language("u.h") == "c"
        assert detect_language("s.kt") == "kotlin"
        assert detect_language("noext") is None
        assert detect_language("data.csv") is None


class TestJavaScript:
    SRC = (
        "import { a } from 'mod';\n"
        "export class Widget extends Base {\n  render() {}\n}\n"
        "export default function main() {}\n"
        "async function load() {}\n"
        "function* gen() {}\n"
        "const arrow = async (x) => x + 1;\n"
        "interface Props { n: number }\n"
        "type Pair = [number, number];\n"
    )

    def test_symbols(self):
        out = extract_symbols("w.ts", self.SRC)
        assert out["language"] == "typescript"
        fns = {f["name"]: f for f in out["symbols"]["functions"]}
        assert set(fns) == {"main", "load", "gen", "arrow"}
        assert fns["load"]["async"] and not fns["load"]["generator"]
        assert fns["gen"]["generator"]
        assert fns["arrow"]["async"]
        cls = out["symbols"]["classes"][0]
        assert cls["name"] == "Widget" and cls["extends"] == "Base"
        assert _names(out, "interfaces") == ["Props"]
        assert _names(out, "types") == ["Pair"]
        assert any("import" in s for s in _names(out, "imports"))

    def test_line_numbers(self):
        out = extract_symbols("w.js", "\n\nfunction f() {}\n")
        assert out["symbols"]["functions"][0]["line"] == 3


class TestGo:
    def test_receiver_and_types(self):
        src = ("package p\n\nimport \"fmt\"\n\n"
               "type T struct{}\ntype I interface{}\n"
               "func (t *T) M() {}\nfunc F() {}\n")
        out = extract_symbols("p.go", src)
        fns = {f["name"]: f for f in out["symbols"]["functions"]}
        assert fns["M"]["receiver"] == "t *T"
        assert fns["F"]["receiver"] is None
        assert _names(out, "types") == ["T"]
        assert _names(out, "interfaces") == ["I"]
        assert _names(out, "imports") == ["fmt"]


class TestRust:
    def test_items(self):
        src = ("use a::b;\npub struct S;\nenum E { X }\n"
               "pub trait Tr {}\npub async fn f() {}\nfn g() {}\n")
        out = extract_symbols("x.rs", src)
        assert _names(out, "structs") == ["S"]
        assert _names(out, "enums") == ["E"]
        assert _names(out, "traits") == ["Tr"]
        fns = {f["name"]: f for f in out["symbols"]["functions"]}
        assert fns["f"]["async"] and not fns["g"]["async"]


class TestJavaAndC:
    def test_java(self):
        src = ("import java.io.File;\n"
               "public final class Svc {\n"
               "    protected synchronized int count(List<Integer> xs) {\n"
               "        return 0;\n    }\n}\n"
               "enum Color { RED }\n")
        out = extract_symbols("Svc.java", src)
        assert _names(out, "classes") == ["Svc"]
        assert _names(out, "enums") == ["Color"]
        m = out["symbols"]["functions"][0]
        assert m["name"] == "count"
        assert "synchronized" in m["modifiers"]

    def test_c_keywords_not_functions(self):
        src = ("#include \"x.h\"\n#define N 4\n"
               "struct pt { int x; };\n"
               "int sum(int a, int b) {\n"
               "    if (a) {\n        return a + b;\n    }\n    return b;\n}\n")
        out = extract_symbols("m.c", src)
        assert _names(out, "functions") == ["sum"]  # 'if' filtered
        assert _names(out, "structs") == ["pt"]
        assert _names(out, "defines") == ["N"]


class TestGenericFallback:
    def test_kotlin(self):
        out = extract_symbols(
            "a.kt", "import x.y\nclass C {}\nfun go(n: Int) = n\n")
        assert _names(out, "classes") == ["C"]
        assert _names(out, "functions") == ["go"]

    def test_ruby(self):
        out = extract_symbols(
            "a.rb", "require 'json'\nmodule M\nend\ndef run!\nend\n")
        assert _names(out, "functions") == ["run!"]
        assert _names(out, "classes") == ["M"]


class TestSparkTables:
    def test_symbols_and_edges(self, spark):
        from hades_spark.functions.polyglot_symbols import (
            polyglot_defines_edges, polyglot_import_edges,
            polyglot_symbols_table)

        files = spark.createDataFrame([
            ("src/a.go", "package a\nimport \"fmt\"\nfunc Run() {}\n"),
            ("src/b.rs", "use c::d;\npub fn go() {}\n"),
            ("src/c.py", "import os\ndef f():\n    return 1\n"),
        ], "rel_path string, source string")
        syms = polyglot_symbols_table(files)
        rows = {(r["rel_path"], r["category"], r["name"])
                for r in syms.collect()}
        assert ("src/a.go", "functions", "Run") in rows
        assert ("src/b.rs", "functions", "go") in rows
        assert ("src/c.py", "functions", "f") in rows
        assert ("src/c.py", "imports", "os") in rows

        defines = polyglot_defines_edges(syms)
        assert defines.filter(F.col("rel") != "defines").count() == 0
        assert defines.filter(F.col("dst").contains("Run")).count() == 1
        imports = polyglot_import_edges(syms).collect()
        assert {r["dst"] for r in imports} >= {"fmt", "os"}

    def test_query_registered(self, spark, sf_dir):
        from hades_spark.queries import SPARK_QUERIES

        out = SPARK_QUERIES["x8_polyglot_edges"](spark, sf_dir)
        rows = out.collect()
        langs = {r["language"] for r in rows}
        assert {"typescript", "go", "rust", "java", "c", "python"} <= langs
        assert {r["rel"] for r in rows} == {"defines", "imports"}


class TestTreesitterParityCases:
    """Round 3 (VERDICT #6): ~25 per-language extraction cases ported from
    the reference visitor semantics (extractors_treesitter.py:299-597).
    Where our regex grammar is a documented SUPERSET (reference quirks that
    lose symbols), the case says so inline."""

    def _sym(self, path, src):
        from hades_spark.textcore.polyglot import extract_symbols

        return extract_symbols(path, src)["symbols"]

    # --- javascript / typescript (:299-367) ---------------------------
    def test_js_generator_flag(self):
        s = self._sym("a.js", "function* gen() { yield 1; }\n")
        assert s["functions"] == [
            {"name": "gen", "line": 1, "async": False, "generator": True}]

    def test_js_async_function(self):
        s = self._sym("a.js", "async function load() {}\n")
        f = s["functions"][0]
        assert (f["name"], f["async"]) == ("load", True)

    def test_js_nested_function_captured(self):
        src = "function outer() {\n  function inner() {}\n}\n"
        names = {f["name"] for f in self._sym("a.js", src)["functions"]}
        assert names == {"outer", "inner"}  # recursive traverse (:363-365)

    def test_js_class_methods_not_functions(self):
        # method_definition has no handler in the reference visitor
        src = "class A {\n  render() {}\n  async tick() {}\n}\n"
        s = self._sym("a.js", src)
        assert s["functions"] == []
        assert [c["name"] for c in s["classes"]] == ["A"]

    def test_js_class_extends(self):
        s = self._sym("a.js", "class B extends Base.Core {}\n")
        assert s["classes"] == [
            {"name": "B", "line": 1, "extends": "Base.Core"}]

    def test_js_class_expression_not_captured(self):
        # class_declaration only (:326); class EXPRESSIONS are a different
        # node type
        s = self._sym("a.js", "const A = class extends B {};\n")
        assert s["classes"] == []

    def test_ts_generic_type_alias(self):
        s = self._sym("a.ts", "export type Pair<T> = [T, T];\n")
        assert s["types"] == [{"name": "Pair", "line": 1}]

    def test_ts_generic_interface(self):
        s = self._sym("a.ts", "interface Box<T> extends Base<T> {}\n")
        assert s["interfaces"] == [{"name": "Box", "line": 1}]

    def test_js_arrow_single_param(self):
        s = self._sym("a.js", "const f = async x => x + 1;\n")
        f = s["functions"][0]
        assert (f["name"], f["async"]) == ("f", True)

    # --- java (:369-425) ----------------------------------------------
    def test_java_package_private_method(self):
        # method_declaration has no modifier requirement (:383-390)
        src = "class A {\n    void run() {\n    }\n}\n"
        s = self._sym("A.java", src)
        assert s["functions"] == [
            {"name": "run", "line": 2, "modifiers": []}]

    def test_java_generic_method(self):
        src = "class A {\n    public <T> T id(T x) {\n        return x;\n    }\n}\n"
        f = self._sym("A.java", src)["functions"]
        assert [(x["name"], x["modifiers"]) for x in f] == \
            [("id", ["public"])]

    def test_java_constructor_not_captured(self):
        # constructor_declaration is a distinct node the visitor skips
        src = "public class App {\n    public App() {\n    }\n}\n"
        assert self._sym("App.java", src)["functions"] == []

    def test_java_nested_class(self):
        src = "public class Outer {\n    static class Inner {\n    }\n}\n"
        names = [c["name"] for c in self._sym("O.java", src)["classes"]]
        assert names == ["Outer", "Inner"]

    def test_java_control_flow_not_methods(self):
        src = ("class A {\n    int f(int x) {\n        if (x > 0) {\n"
               "        }\n        while (x > 0) {\n        }\n"
               "        return new Thread() {\n        }.hashCode();\n"
               "    }\n}\n")
        names = [f["name"] for f in self._sym("A.java", src)["functions"]]
        assert names == ["f"]

    def test_java_static_import(self):
        s = self._sym("A.java", "import static java.util.List.of;\nclass A {}\n")
        assert s["imports"] == [
            {"statement": "import static java.util.List.of;", "line": 1}]

    # --- go (:427-478) --------------------------------------------------
    def test_go_grouped_type_block(self):
        # type_declaration -> every type_spec child (:446-454)
        src = ("package p\n\ntype (\n\tPool struct{}\n"
               "\tRunner interface{}\n\tID int64\n)\n")
        s = self._sym("p.go", src)
        assert [(t["name"], t["line"]) for t in s["types"]] == \
            [("Pool", 4), ("ID", 6)]
        assert [(t["name"], t["line"]) for t in s["interfaces"]] == \
            [("Runner", 5)]

    def test_go_grouped_const_block(self):
        # const_declaration -> every const_spec child (:462-470)
        src = "package p\n\nconst (\n\tMaxSize = 10\n\tMinSize = 1\n)\n"
        s = self._sym("p.go", src)
        assert [(c["name"], c["line"]) for c in s["constants"]] == \
            [("MaxSize", 4), ("MinSize", 5)]

    def test_go_inline_type_and_const(self):
        src = "package p\n\ntype Graph struct{}\n\nconst K = 1\n"
        s = self._sym("p.go", src)
        assert [t["name"] for t in s["types"]] == ["Graph"]
        assert [c["name"] for c in s["constants"]] == ["K"]

    def test_go_receiver_method_superset(self):
        # documented SUPERSET: tree-sitter-go puts methods in
        # method_declaration nodes the reference visitor never handles
        # (:440 handles function_declaration only) — we capture them WITH
        # the receiver, which is strictly more useful
        src = "package p\n\nfunc (p *Pool) Acquire() error {\n\treturn nil\n}\n"
        f = self._sym("p.go", src)["functions"][0]
        assert (f["name"], f["receiver"]) == ("Acquire", "p *Pool")

    # --- rust (:480-536) -------------------------------------------------
    def test_rust_const_fn(self):
        s = self._sym("l.rs", "pub const fn new() -> Self { Self {} }\n")
        assert [f["name"] for f in s["functions"]] == ["new"]

    def test_rust_async_unsafe_fn(self):
        s = self._sym("l.rs", "pub async unsafe fn go() {}\n")
        f = s["functions"][0]
        assert (f["name"], f["async"]) == ("go", True)

    def test_rust_pub_crate_fn(self):
        s = self._sym("l.rs", "pub(crate) fn helper() {}\n")
        assert [f["name"] for f in s["functions"]] == ["helper"]

    def test_rust_impl_methods_captured(self):
        # function_item inside impl blocks: recursive traverse (:532-534)
        src = "impl Graph {\n    pub fn nodes(&self) -> usize { 0 }\n}\n"
        assert [f["name"] for f in self._sym("l.rs", src)["functions"]] \
            == ["nodes"]

    def test_rust_use_with_braces(self):
        s = self._sym("l.rs", "use std::{collections::HashMap, fmt};\n")
        assert s["imports"] == [
            {"statement": "use std::{collections::HashMap, fmt};",
             "line": 1}]

    # --- c / c++ (:538-597) -----------------------------------------------
    def test_cpp_qualified_method_definition(self):
        s = self._sym("f.cpp", "void Foo::bar() {\n}\n")
        assert [f["name"] for f in s["functions"]] == ["bar"]

    def test_c_object_and_function_macros(self):
        # reference handles preproc_def only (:585-591); capturing
        # function-like macros too is a documented superset
        src = "#define MAX_N 10\n#define SQ(x) ((x)*(x))\n"
        names = [d["name"] for d in self._sym("f.c", src)["defines"]]
        assert names == ["MAX_N", "SQ"]

    def test_cpp_struct_and_class_specifiers(self):
        src = "struct Node { int v; };\nclass Tree : public Base {\n};\n"
        s = self._sym("f.cpp", src)
        assert [x["name"] for x in s["structs"]] == ["Node"]
        assert [x["name"] for x in s["classes"]] == ["Tree"]


class TestGoBlockBlankLines:
    def test_leading_blank_lines_keep_line_numbers_exact(self):
        from hades_spark.textcore.polyglot import extract_symbols

        src = "package p\n\ntype (\n\n\tFoo struct{}\n)\n\nconst (\n\n\tK = 1\n)\n"
        s = extract_symbols("p.go", src)["symbols"]
        assert [(t["name"], t["line"]) for t in s["types"]] == [("Foo", 5)]
        assert [(c["name"], c["line"]) for c in s["constants"]] == [("K", 10)]


class TestGoStructBodies:
    def test_struct_fields_not_phantom_types(self):
        from hades_spark.textcore.polyglot import extract_symbols

        src = ("package p\n\ntype (\n\tAlpha struct {\n\t\tName string\n"
               "\t\tCount int\n\t}\n\tBeta interface {\n\t\tRun()\n\t}\n)\n")
        s = extract_symbols("p.go", src)["symbols"]
        assert [t["name"] for t in s["types"]] == ["Alpha"]
        assert [t["name"] for t in s["interfaces"]] == ["Beta"]


class TestAstCrossValidation:
    """X8 accuracy, measured (VERDICT r4 #4): the regex grammar vs the
    exact-AST extractor over the reference repo's own ~40k LoC of real
    Python. Python is the one language with in-repo ground truth; the
    bar below is the measured round-5 result (P=R=1.0 after docstring
    masking + async-def support), held with a little slack."""

    def test_generic_grammar_matches_ast_on_reference_corpus(self):
        import sys
        from pathlib import Path

        sys.path.insert(0, str(Path(__file__).resolve().parent.parent
                               / "tools"))
        from polyglot_xval import xval_file

        root = Path("/root/reference/core")
        if not root.exists():
            import pytest
            pytest.skip("reference corpus not present")
        tp = fp = fn = ctp = cfp = cfn = 0
        files = 0
        for p in sorted(root.rglob("*.py")):
            r = xval_file(p.read_text(errors="replace"))
            if r is None:
                continue
            files += 1
            want_f, got_f, want_c, got_c = r
            tp += len(want_f & got_f); fp += len(got_f - want_f)
            fn += len(want_f - got_f)
            ctp += len(want_c & got_c); cfp += len(got_c - want_c)
            cfn += len(want_c - got_c)
        assert files >= 50
        f_prec = tp / max(tp + fp, 1); f_rec = tp / max(tp + fn, 1)
        c_prec = ctp / max(ctp + cfp, 1); c_rec = ctp / max(ctp + cfn, 1)
        assert f_prec >= 0.995 and f_rec >= 0.995, (f_prec, f_rec)
        assert c_prec >= 0.99 and c_rec >= 0.99, (c_prec, c_rec)

    def test_docstring_masking_kills_signature_fps(self):
        from hades_spark.textcore.polyglot import _extract_generic

        src = (
            'def real_one():\n'
            '    """Example:\n'
            '        def fake_inside_docstring():\n'
            '            class FakeClass:\n'
            '    """\n'
            '    return 1\n'
            "pattern = '[\"\"\"]'  # quote chars inside a one-line string\n"
            'async def real_async(): ...\n'
            'class RealClass:\n'
            '    pass\n')
        out = _extract_generic(src)
        names = {d["name"] for d in out["functions"]}
        assert names == {"real_one", "real_async"}
        assert {d["name"] for d in out["classes"]} == {"RealClass"}

    def test_block_comment_masking_c_family(self):
        from hades_spark.textcore.polyglot import _extract_js

        src = (
            "/*\n"
            " * function commentedOut() {\n"
            " */\n"
            'const s = "/*";  // a block-comment opener inside a string\n'
            "function realFn() { return 1; }\n")
        out = _extract_js(src)
        assert {d["name"] for d in out["functions"]} == {"realFn"}
