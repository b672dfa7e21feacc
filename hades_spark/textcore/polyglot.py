"""Multi-language symbol extraction (X8) — lightweight grammars, stdlib re.

The reference extracts per-language symbol tables with tree-sitter
(``/root/reference/core/extractors/extractors_treesitter.py:100-938``:
language map ``:33-79``, python ``:229-297``, javascript/typescript
``:299-367``, java ``:369-425``, go ``:427-478``, rust ``:480-536``, c/cpp
``:538-597``). tree-sitter native parsers are not available in this
environment, so the SAME symbol categories per language — (name, line,
kind) plus import statements — are recovered with line-oriented regex
grammars. Python keeps the real-AST path (``textcore/pyast.py``); this
module covers the other languages. Output shape matches the reference:
``{"language": ..., "symbols": {category: [{"name", "line", ...}]}}``.

Executor-side module: stdlib only.
"""

from __future__ import annotations

import re
from typing import Any

# reference LANGUAGE_MAP (code languages; config formats route to the
# metadata extractor and markdown/html to the text extractors)
LANGUAGE_MAP: dict[str, str] = {
    ".py": "python",
    ".js": "javascript", ".jsx": "javascript",
    ".ts": "typescript", ".tsx": "typescript",
    ".java": "java",
    ".go": "go",
    ".rs": "rust",
    ".cpp": "cpp", ".cc": "cpp", ".cxx": "cpp", ".hpp": "cpp",
    ".c": "c", ".h": "c",
    ".cs": "c_sharp",
    ".rb": "ruby",
    ".php": "php",
    ".swift": "swift",
    ".kt": "kotlin",
    ".scala": "scala",
    ".sh": "bash", ".bash": "bash", ".zsh": "bash",
}


def detect_language(path: str) -> str | None:
    dot = path.rfind(".")
    if dot < 0:
        return None
    return LANGUAGE_MAP.get(path[dot:].lower())


def _finditer_lines(pattern: re.Pattern, content: str):
    """(match, 1-based line number) for every match."""
    for m in pattern.finditer(content):
        yield m, content.count("\n", 0, m.start()) + 1


# spans whose BODY can contain signature-shaped lines that the
# line-anchored grammars would false-match: triple-quoted strings
# (python-style docstrings — the measured top FP class on the 40k-LoC
# reference corpus: example `class Foo(Base):` blocks inside factory
# docstrings) and C-family /* */ block comments (JSDoc/Javadoc code
# examples). Masked to spaces with newlines preserved so every
# surviving match keeps its true line number. Unterminated spans stay
# unmasked (better a stray match than masking the rest of the file).
# Each masker is ONE ordered alternation scanned left-to-right: the
# maskable span alternatives come first, then one-line string literals
# and line comments which are CONSUMED UNCHANGED — so a quote character
# inside a string (e.g. the regex literal '["""]' found in the reference
# corpus) or a comment can never open a span and misalign the pairing.
_PY_NOISE_RE = re.compile(
    r'("""[\s\S]*?"""|\'\'\'[\s\S]*?\'\'\')'   # 1: docstring -> blank
    r'|"(?:[^"\\\n]|\\.)*"'                    # one-line strings: keep
    r"|'(?:[^'\\\n]|\\.)*'"
    r"|#[^\n]*")                               # line comment: keep
_C_NOISE_RE = re.compile(
    r"(/\*[\s\S]*?\*/)"                        # 1: block comment -> blank
    r'|"(?:[^"\\\n]|\\.)*"'
    r"|'(?:[^'\\\n]|\\.)*'"
    r"|//[^\n]*")


def _blank_spans(noise_re: re.Pattern, content: str) -> str:
    return noise_re.sub(
        lambda m: re.sub(r"[^\n]", " ", m.group(0)) if m.group(1)
        else m.group(0),
        content)


def _mask_docstrings(content: str) -> str:
    return _blank_spans(_PY_NOISE_RE, content)


def _mask_block_comments(content: str) -> str:
    return _blank_spans(_C_NOISE_RE, content)


# --- javascript / typescript -------------------------------------------------

_JS_FUNC = re.compile(
    r"^[ \t]*(?:export\s+)?(?:default\s+)?(async\s+)?function\s*(\*?)\s*"
    r"([A-Za-z_$][\w$]*)\s*\(", re.MULTILINE)
_JS_ARROW = re.compile(
    r"^[ \t]*(?:export\s+)?(?:const|let|var)\s+([A-Za-z_$][\w$]*)\s*=\s*"
    r"(async\s+)?(?:\([^)]*\)|[A-Za-z_$][\w$]*)\s*=>", re.MULTILINE)
_JS_CLASS = re.compile(
    r"^[ \t]*(?:export\s+)?(?:default\s+)?class\s+([A-Za-z_$][\w$]*)"
    r"(?:\s+extends\s+([A-Za-z_$][\w$.]*))?", re.MULTILINE)
_JS_IMPORT = re.compile(r"^[ \t]*(import\s+[^\n;]+;?)", re.MULTILINE)
_JS_EXPORT = re.compile(r"^[ \t]*(export\s+[^\n;{]+[;{]?)", re.MULTILINE)
_TS_INTERFACE = re.compile(
    r"^[ \t]*(?:export\s+)?interface\s+([A-Za-z_$][\w$]*)", re.MULTILINE)
_TS_TYPE = re.compile(
    r"^[ \t]*(?:export\s+)?type\s+([A-Za-z_$][\w$]*)\s*(?:<[^=>]*>)?\s*=",
    re.MULTILINE)


def _extract_js(content: str) -> dict[str, list[dict[str, Any]]]:
    content = _mask_block_comments(content)
    symbols: dict[str, list[dict[str, Any]]] = {
        "functions": [], "classes": [], "imports": [], "exports": [],
        "interfaces": [], "types": [],
    }
    for m, line in _finditer_lines(_JS_FUNC, content):
        symbols["functions"].append({
            "name": m.group(3), "line": line,
            "async": bool(m.group(1)), "generator": m.group(2) == "*"})
    for m, line in _finditer_lines(_JS_ARROW, content):
        symbols["functions"].append({
            "name": m.group(1), "line": line,
            "async": bool(m.group(2)), "generator": False})
    for m, line in _finditer_lines(_JS_CLASS, content):
        symbols["classes"].append({
            "name": m.group(1), "line": line, "extends": m.group(2)})
    for m, line in _finditer_lines(_JS_IMPORT, content):
        symbols["imports"].append({
            "statement": m.group(1).strip(), "line": line})
    for m, line in _finditer_lines(_JS_EXPORT, content):
        symbols["exports"].append({
            "statement": m.group(1).strip(), "line": line})
    for m, line in _finditer_lines(_TS_INTERFACE, content):
        symbols["interfaces"].append({"name": m.group(1), "line": line})
    for m, line in _finditer_lines(_TS_TYPE, content):
        symbols["types"].append({"name": m.group(1), "line": line})
    return symbols


# --- java / c# ---------------------------------------------------------------

_JAVA_CLASS = re.compile(
    r"^[ \t]*((?:public|private|protected|static|final|abstract|sealed)\s+)*"
    r"class\s+([A-Za-z_]\w*)", re.MULTILINE)
_JAVA_INTERFACE = re.compile(
    r"^[ \t]*(?:(?:public|private|protected|static)\s+)*interface\s+"
    r"([A-Za-z_]\w*)", re.MULTILINE)
_JAVA_ENUM = re.compile(
    r"^[ \t]*(?:(?:public|private|protected|static)\s+)*enum\s+([A-Za-z_]\w*)",
    re.MULTILINE)
_JAVA_METHOD = re.compile(
    r"^[ \t]*((?:(?:public|private|protected|static|final|abstract|"
    r"synchronized)\s+)*)"          # modifiers now OPTIONAL (tree-sitter
    r"(?:<[^<>]+>\s+)?"             # method type-parameter list (<T> foo)
    r"[\w<>\[\].]+\s+([A-Za-z_]\w*)\s*\([^;{)]*\)\s*(?:throws[^{;]*)?\{",
    re.MULTILINE)
# a method_declaration always has a return TYPE + name; these keywords in
# either slot mean the match is control flow / a statement, not a method
_JAVA_NON_TYPES = {"new", "return", "throw", "else", "if", "while", "for",
                   "switch", "catch", "do", "try"}
_JAVA_IMPORT = re.compile(r"^[ \t]*(import\s+(?:static\s+)?[\w.*]+\s*;)",
                          re.MULTILINE)


def _extract_java(content: str) -> dict[str, list[dict[str, Any]]]:
    content = _mask_block_comments(content)
    symbols: dict[str, list[dict[str, Any]]] = {
        "functions": [], "classes": [], "imports": [], "interfaces": [],
        "enums": [],
    }
    mods = {"public", "private", "protected", "static", "final",
            "abstract", "synchronized"}
    for m, line in _finditer_lines(_JAVA_METHOD, content):
        name = m.group(2)
        head = m.group(0)[: m.group(0).rindex("(")]
        toks = re.findall(r"<[^<>]*>|[\w.\[\]<>]+", head)
        pre = toks[:-1]  # tokens before the name
        if any(t in _JAVA_NON_TYPES for t in toks):
            continue
        # a method_declaration always has a RETURN TYPE before the name;
        # only modifiers before the name means this is a constructor
        # (constructor_declaration — a node the reference visitor skips)
        if not [t for t in pre if t not in mods and not t.startswith("<")]:
            continue
        symbols["functions"].append({
            "name": name, "line": line,
            "modifiers": [t for t in pre if t in mods]})
    for m, line in _finditer_lines(_JAVA_CLASS, content):
        symbols["classes"].append({"name": m.group(2), "line": line})
    for m, line in _finditer_lines(_JAVA_INTERFACE, content):
        symbols["interfaces"].append({"name": m.group(1), "line": line})
    for m, line in _finditer_lines(_JAVA_ENUM, content):
        symbols["enums"].append({"name": m.group(1), "line": line})
    for m, line in _finditer_lines(_JAVA_IMPORT, content):
        symbols["imports"].append({
            "statement": m.group(1).strip(), "line": line})
    return symbols


# --- go -----------------------------------------------------------------------

_GO_FUNC = re.compile(
    r"^func\s+(?:\(([^)]*)\)\s+)?([A-Za-z_]\w*)\s*\(", re.MULTILINE)
_GO_TYPE = re.compile(
    r"^type\s+([A-Za-z_]\w*)\s+(struct|interface|\w)", re.MULTILINE)
_GO_IMPORT_ONE = re.compile(r'^import\s+(?:\w+\s+)?"([^"]+)"', re.MULTILINE)
_GO_IMPORT_BLOCK = re.compile(r"^import\s*\(\s*\n(.*?)\)", re.MULTILINE | re.DOTALL)
_GO_IMPORT_LINE = re.compile(r'(?:\w+\s+)?"([^"]+)"')
_GO_CONST = re.compile(r"^const\s+([A-Za-z_]\w*)", re.MULTILINE)
# grouped declarations: type ( A struct{..}; B interface{..} ) and
# const ( A = 1; B = 2 ) — tree-sitter iterates the type_spec/const_spec
# children, so every member must be captured, not just inline forms
_GO_TYPE_BLOCK = re.compile(r"^type\s*\(\s*\n(.*?)^\)", re.MULTILINE | re.DOTALL)
_GO_CONST_BLOCK = re.compile(r"^const\s*\(\s*\n(.*?)^\)",
                             re.MULTILINE | re.DOTALL)


def _extract_go(content: str) -> dict[str, list[dict[str, Any]]]:
    content = _mask_block_comments(content)
    symbols: dict[str, list[dict[str, Any]]] = {
        "functions": [], "types": [], "imports": [], "interfaces": [],
        "constants": [],
    }
    for m, line in _finditer_lines(_GO_FUNC, content):
        symbols["functions"].append({
            "name": m.group(2), "line": line, "receiver": m.group(1)})
    for m, line in _finditer_lines(_GO_TYPE, content):
        entry = {"name": m.group(1), "line": line}
        if m.group(2) == "interface":
            symbols["interfaces"].append(entry)
        else:
            symbols["types"].append(entry)
    for m, line in _finditer_lines(_GO_IMPORT_ONE, content):
        symbols["imports"].append({"statement": m.group(1), "line": line})
    for m, line in _finditer_lines(_GO_IMPORT_BLOCK, content):
        for im in _GO_IMPORT_LINE.finditer(m.group(1)):
            symbols["imports"].append({"statement": im.group(1), "line": line})
    for m, line in _finditer_lines(_GO_CONST, content):
        symbols["constants"].append({"name": m.group(1), "line": line})
    # member lines are computed from the BODY's start offset (not the
    # 'type ('/'const (' line + 1): the opener regex swallows any blank
    # lines before the first spec. Specs are matched per line AT BRACE
    # DEPTH 0 only — a multi-line struct body's field lines ('Name
    # string') would otherwise match the spec shape and surface as
    # phantom top-level types.
    def _block_specs(body: str, base_line: int, spec_re):
        depth = 0
        for off, ln_text in enumerate(body.split("\n")):
            if depth == 0:
                sm = spec_re.match(ln_text)
                if sm:
                    yield sm, base_line + off
            depth += ln_text.count("{") - ln_text.count("}")
            depth = max(depth, 0)

    _TYPE_SPEC_LINE = re.compile(r"[ \t]*([A-Za-z_]\w*)\s+"
                                 r"(struct|interface|\S+)")
    _CONST_SPEC_LINE = re.compile(r"[ \t]*([A-Za-z_]\w*)\b")
    for m in _GO_TYPE_BLOCK.finditer(content):
        body = m.group(1)
        body_line = content.count("\n", 0, m.start(1)) + 1
        for sm, ln in _block_specs(body, body_line, _TYPE_SPEC_LINE):
            entry = {"name": sm.group(1), "line": ln}
            if sm.group(2) == "interface":
                symbols["interfaces"].append(entry)
            else:
                symbols["types"].append(entry)
    for m in _GO_CONST_BLOCK.finditer(content):
        body = m.group(1)
        body_line = content.count("\n", 0, m.start(1)) + 1
        for sm, ln in _block_specs(body, body_line, _CONST_SPEC_LINE):
            symbols["constants"].append({"name": sm.group(1), "line": ln})
    return symbols


# --- rust ----------------------------------------------------------------------

_RUST_FN = re.compile(
    r"^[ \t]*(?:pub(?:\([^)]*\))?\s+)?(?:default\s+)?(?:const\s+)?"
    r"(async\s+)?(?:unsafe\s+)?(?:extern\s+\"[^\"]*\"\s+)?fn\s+"
    r"([A-Za-z_]\w*)", re.MULTILINE)
_RUST_STRUCT = re.compile(
    r"^[ \t]*(?:pub(?:\([^)]*\))?\s+)?struct\s+([A-Za-z_]\w*)", re.MULTILINE)
_RUST_ENUM = re.compile(
    r"^[ \t]*(?:pub(?:\([^)]*\))?\s+)?enum\s+([A-Za-z_]\w*)", re.MULTILINE)
_RUST_TRAIT = re.compile(
    r"^[ \t]*(?:pub(?:\([^)]*\))?\s+)?trait\s+([A-Za-z_]\w*)", re.MULTILINE)
_RUST_USE = re.compile(r"^[ \t]*(use\s+[^;]+;)", re.MULTILINE)


def _extract_rust(content: str) -> dict[str, list[dict[str, Any]]]:
    content = _mask_block_comments(content)
    symbols: dict[str, list[dict[str, Any]]] = {
        "functions": [], "structs": [], "enums": [], "traits": [],
        "imports": [],
    }
    for m, line in _finditer_lines(_RUST_FN, content):
        symbols["functions"].append({
            "name": m.group(2), "line": line, "async": bool(m.group(1))})
    for m, line in _finditer_lines(_RUST_STRUCT, content):
        symbols["structs"].append({"name": m.group(1), "line": line})
    for m, line in _finditer_lines(_RUST_ENUM, content):
        symbols["enums"].append({"name": m.group(1), "line": line})
    for m, line in _finditer_lines(_RUST_TRAIT, content):
        symbols["traits"].append({"name": m.group(1), "line": line})
    for m, line in _finditer_lines(_RUST_USE, content):
        symbols["imports"].append({
            "statement": m.group(1).strip(), "line": line})
    return symbols


# --- c / c++ -------------------------------------------------------------------

_C_FUNC = re.compile(
    r"^[A-Za-z_][\w:<>,\s*&]*?[\s*&:]([A-Za-z_]\w*)\s*\([^;{)]*\)\s*"
    r"(?:const\s*)?\{", re.MULTILINE)
_C_STRUCT = re.compile(r"\bstruct\s+([A-Za-z_]\w*)\s*[{;:]")
_C_CLASS = re.compile(r"\bclass\s+([A-Za-z_]\w*)\s*[{;:]")
_C_INCLUDE = re.compile(r"^[ \t]*(#include\s*[<\"][^>\"]+[>\"])", re.MULTILINE)
_C_DEFINE = re.compile(r"^[ \t]*#define\s+([A-Za-z_]\w*)", re.MULTILINE)
_C_KEYWORDS = {"if", "for", "while", "switch", "return", "sizeof", "catch"}


def _extract_c(content: str) -> dict[str, list[dict[str, Any]]]:
    content = _mask_block_comments(content)
    symbols: dict[str, list[dict[str, Any]]] = {
        "functions": [], "structs": [], "classes": [], "includes": [],
        "defines": [],
    }
    for m, line in _finditer_lines(_C_FUNC, content):
        name = m.group(1)
        if name in _C_KEYWORDS:
            continue
        symbols["functions"].append({"name": name, "line": line})
    for m, line in _finditer_lines(_C_STRUCT, content):
        symbols["structs"].append({"name": m.group(1), "line": line})
    for m, line in _finditer_lines(_C_CLASS, content):
        symbols["classes"].append({"name": m.group(1), "line": line})
    for m, line in _finditer_lines(_C_INCLUDE, content):
        symbols["includes"].append({
            "statement": m.group(1).strip(), "line": line})
    for m, line in _finditer_lines(_C_DEFINE, content):
        symbols["defines"].append({"name": m.group(1), "line": line})
    return symbols


# --- generic fallback (ruby/php/swift/kotlin/scala/bash/c#) ---------------------

_GENERIC_FUNC = re.compile(
    r"^[ \t]*(?:(?:public|private|protected|internal|open|override|static|"
    r"final|suspend|async)\s+)*(?:def|fn|func|function|fun)\s+"
    r"([A-Za-z_]\w*[!?]?)",
    re.MULTILINE)
_GENERIC_CLASS = re.compile(
    r"^[ \t]*(?:(?:public|private|abstract|open|final|case|sealed|data)\s+)*"
    r"(?:class|object|module|protocol)\s+([A-Za-z_]\w*)", re.MULTILINE)
_GENERIC_IMPORT = re.compile(
    r"^[ \t]*((?:import|require|using|source)\b[^\n;]*;?)", re.MULTILINE)


def _extract_generic(content: str) -> dict[str, list[dict[str, Any]]]:
    content = _mask_docstrings(content)
    symbols: dict[str, list[dict[str, Any]]] = {
        "functions": [], "classes": [], "imports": [],
    }
    for m, line in _finditer_lines(_GENERIC_FUNC, content):
        symbols["functions"].append({"name": m.group(1), "line": line})
    for m, line in _finditer_lines(_GENERIC_CLASS, content):
        symbols["classes"].append({"name": m.group(1), "line": line})
    for m, line in _finditer_lines(_GENERIC_IMPORT, content):
        symbols["imports"].append({
            "statement": m.group(1).strip(), "line": line})
    return symbols


_EXTRACTORS = {
    "javascript": _extract_js,
    "typescript": _extract_js,
    "java": _extract_java,
    "go": _extract_go,
    "rust": _extract_rust,
    "c": _extract_c,
    "cpp": _extract_c,
}


def extract_symbols(path: str, content: str) -> dict[str, Any]:
    """File path + source -> {language, symbols{category: [...]}}.

    Python files route to the real-AST extractor (``textcore/pyast.py``);
    unknown extensions return language=None with empty symbols.
    """
    language = detect_language(path)
    if language is None:
        return {"language": None, "symbols": {}}
    if language == "python":
        from .pyast import extract_symbols as py_extract

        ast_out = py_extract(content)
        return {
            "language": "python",
            "symbols": {
                "functions": [
                    {"name": s["name"], "line": s["start_line"]}
                    for s in ast_out.get("symbols", [])
                    if s["kind"] in ("function", "method")],
                "classes": [
                    {"name": s["name"], "line": s["start_line"]}
                    for s in ast_out.get("symbols", [])
                    if s["kind"] == "class"],
                "imports": [
                    {"statement": (i["module"] or i["name"] or ""),
                     "line": 0}
                    for i in ast_out.get("imports", [])],
            },
        }
    fn = _EXTRACTORS.get(language, _extract_generic)
    return {"language": language, "symbols": fn(content)}
