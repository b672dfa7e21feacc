"""Python AST symbol + call extraction (stdlib ``ast`` only).

Per-file extraction with the reference's output shape
(``core/analyzers/python_ast_extractor.py:96-383``): module-level and
class-level functions/classes with qualified names, signatures, line
ranges, decorators, bases; call sites with best-effort qualified names
(``self.method`` kept verbatim for the resolver's contextual rewrite);
module imports. Deterministic: output ordering follows source order.
"""

from __future__ import annotations

import ast
from typing import Any


def _name_of(node: ast.AST) -> str | None:
    if isinstance(node, ast.Name):
        return node.id
    if isinstance(node, ast.Attribute):
        base = _name_of(node.value)
        return f"{base}.{node.attr}" if base else node.attr
    return None


def _signature(fn: ast.FunctionDef | ast.AsyncFunctionDef) -> str:
    # positional-only, regular, vararg, keyword-only, kwarg — the full
    # modern signature surface (the reference iterates kwonlyargs too,
    # python_ast_extractor.py:66-82)
    args = [a.arg for a in fn.args.posonlyargs]
    if args:
        args.append("/")
    args += [a.arg for a in fn.args.args]
    if fn.args.vararg:
        args.append("*" + fn.args.vararg.arg)
    elif fn.args.kwonlyargs:
        args.append("*")
    args += [a.arg for a in fn.args.kwonlyargs]
    if fn.args.kwarg:
        args.append("**" + fn.args.kwarg.arg)
    return f"{fn.name}({', '.join(args)})"


def _calls_in(node: ast.AST) -> list[dict[str, str]]:
    out = []
    for sub in ast.walk(node):
        if isinstance(sub, ast.Call):
            q = _name_of(sub.func)
            if q:
                out.append({"name": q.rsplit(".", 1)[-1], "qualified_name": q})
    return out


def extract_symbols(source: str) -> dict[str, Any]:
    """-> {symbols: [...], imports: [...], error: str|None}."""
    try:
        tree = ast.parse(source)
    except SyntaxError as e:
        return {"symbols": [], "imports": [], "error": f"SyntaxError: {e}"}

    symbols: list[dict[str, Any]] = []
    imports: list[dict[str, Any]] = []

    def visit(node: ast.AST, parent_q: str | None) -> None:
        for child in ast.iter_child_nodes(node):
            if isinstance(child, (ast.FunctionDef, ast.AsyncFunctionDef)):
                q = f"{parent_q}.{child.name}" if parent_q else child.name
                symbols.append({
                    "name": child.name,
                    "qualified_name": q,
                    "kind": "method" if parent_q else "function",
                    "visibility": "private" if child.name.startswith("_") else "public",
                    "signature": _signature(child),
                    "start_line": child.lineno,
                    "end_line": getattr(child, "end_lineno", child.lineno),
                    "parent_symbol": parent_q,
                    "decorators": [d for d in
                                   (_name_of(x) for x in child.decorator_list)
                                   if d],
                    "bases": [],
                    "calls": _calls_in(child),
                })
                visit(child, q)
            elif isinstance(child, ast.ClassDef):
                q = f"{parent_q}.{child.name}" if parent_q else child.name
                symbols.append({
                    "name": child.name,
                    "qualified_name": q,
                    "kind": "class",
                    "visibility": "private" if child.name.startswith("_") else "public",
                    "signature": f"class {child.name}",
                    "start_line": child.lineno,
                    "end_line": getattr(child, "end_lineno", child.lineno),
                    "parent_symbol": parent_q,
                    "decorators": [d for d in
                                   (_name_of(x) for x in child.decorator_list)
                                   if d],
                    "bases": [b for b in (_name_of(x) for x in child.bases) if b],
                    "calls": [],
                })
                visit(child, q)
            elif isinstance(child, ast.Import):
                for alias in child.names:
                    imports.append({"module": alias.name,
                                    "alias": alias.asname or alias.name})
            elif isinstance(child, ast.ImportFrom):
                # encode relative level as leading dots ('from ..x import y'
                # -> module '..x'; 'from . import y' -> module '.') so the
                # resolver can absolutize against the importing file's
                # package instead of mistaking 'x' for a top-level module
                mod = "." * child.level + (child.module or "")
                for alias in child.names:
                    imports.append({"module": mod, "name": alias.name,
                                    "alias": alias.asname or alias.name})

    visit(tree, None)
    return {"symbols": symbols, "imports": imports, "error": None}
