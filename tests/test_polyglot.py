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
