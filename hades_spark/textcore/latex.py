"""LaTeX extraction — equations, tables+captions, \\cite keys, sections.

Pure stdlib ``re``; semantics match the reference's LaTeX extractor
(``/root/reference/core/extractors/extractors_latex.py``: equations in 4
environments ``:372-433``, table/tabular/array with caption+label
``:435-482``, ``\\cite``/``\\citep``/``\\citet`` key lists ``:484-504``,
section commands ``:506-520``), so .tex documents flow through the same
mentions pipeline as HTML and markdown.

Executor-side module: no pyspark/pandas imports.
"""

from __future__ import annotations

import re
from typing import Any

_RE_EQUATION = re.compile(r"\\begin\{equation\}(.*?)\\end\{equation\}",
                          re.DOTALL)
_RE_EQUATION_STAR = re.compile(
    r"\\begin\{equation\*\}(.*?)\\end\{equation\*\}", re.DOTALL)
_RE_ALIGN = re.compile(r"\\begin\{align\*?\}(.*?)\\end\{align\*?\}",
                       re.DOTALL)
_RE_INLINE_MATH = re.compile(r"\$([^$]{2,200})\$")
_RE_LABEL = re.compile(r"\\label\{([^}]+)\}")
_RE_TABLE_ENV = re.compile(r"\\begin\{table\*?\}(.*?)\\end\{table\*?\}",
                           re.DOTALL)
_RE_CAPTION = re.compile(r"\\caption\{((?:[^{}]|\{[^}]*\})*)\}")
_RE_TABULAR = re.compile(r"\\begin\{tabular\}(.*?)\\end\{tabular\}",
                         re.DOTALL)
_RE_ARRAY = re.compile(r"\\begin\{array\}(.*?)\\end\{array\}", re.DOTALL)
_RE_COL_SPEC = re.compile(r"\\begin\{(?:tabular|array)\}\{([^}]+)\}")
_RE_CITE = re.compile(r"\\cite[pt]?\{([^}]+)\}")
_RE_SECTION = re.compile(
    r"\\(section|subsection|subsubsection|paragraph)\{([^}]+)\}")

_MAX_INLINE_MATH = 100  # reference cap: first 100 inline-math hits


def latex_equations(latex: str) -> list[dict[str, Any]]:
    """Equations from the 4 environments, reference emission order:
    equation, equation*, align/align*, then capped inline ``$...$``."""
    equations: list[dict[str, Any]] = []
    for eq in _RE_EQUATION.findall(latex):
        label_m = _RE_LABEL.search(eq)
        equations.append({
            "type": "display",
            "latex": _RE_LABEL.sub("", eq).strip(),
            "label": label_m.group(1) if label_m else None,
        })
    for eq in _RE_EQUATION_STAR.findall(latex):
        equations.append({
            "type": "display_unnumbered", "latex": eq.strip(), "label": None,
        })
    for eq in _RE_ALIGN.findall(latex):
        label_m = _RE_LABEL.search(eq)
        equations.append({
            "type": "align",
            "latex": _RE_LABEL.sub("", eq).strip(),
            "label": label_m.group(1) if label_m else None,
        })
    for eq in _RE_INLINE_MATH.findall(latex)[:_MAX_INLINE_MATH]:
        equations.append({"type": "inline", "latex": eq, "label": None})
    return equations


def latex_tables(latex: str) -> list[dict[str, Any]]:
    """table/table* environments with caption, label, tabular/array body
    and column spec."""
    tables: list[dict[str, Any]] = []
    for content in _RE_TABLE_ENV.findall(latex):
        caption_m = _RE_CAPTION.search(content)
        label_m = _RE_LABEL.search(content)
        tabular_m = _RE_TABULAR.search(content) or _RE_ARRAY.search(content)
        tabular = tabular_m.group(0) if tabular_m else content
        col_spec_m = _RE_COL_SPEC.search(tabular)
        tables.append({
            "caption": caption_m.group(1) if caption_m else None,
            "label": label_m.group(1) if label_m else None,
            "latex": tabular,
            "column_spec": col_spec_m.group(1) if col_spec_m else None,
        })
    return tables


def latex_cite_keys(latex: str) -> list[str]:
    """All \\cite{a,b}/\\citep/\\citet keys, first-seen order, deduped."""
    seen: set[str] = set()
    out: list[str] = []
    for m in _RE_CITE.finditer(latex):
        for key in m.group(1).split(","):
            key = key.strip()
            if key and key not in seen:
                seen.add(key)
                out.append(key)
    return out


def latex_sections(latex: str) -> list[dict[str, Any]]:
    """section/subsection/subsubsection/paragraph commands with positions."""
    return [
        {"level": m.group(1), "title": m.group(2), "position": m.start()}
        for m in _RE_SECTION.finditer(latex)
    ]


def latex_to_text(latex: str) -> str:
    """LaTeX -> plain text: drop comments/math/tables, unwrap common text
    commands, strip remaining commands, collapse whitespace."""
    text = re.sub(r"(?<!\\)%.*", "", latex)
    text = _RE_TABLE_ENV.sub(" ", text)
    text = _RE_EQUATION.sub(" ", text)
    text = _RE_EQUATION_STAR.sub(" ", text)
    text = _RE_ALIGN.sub(" ", text)
    text = re.sub(r"\$\$.*?\$\$", " ", text, flags=re.DOTALL)
    text = re.sub(r"\$[^$]*\$", " ", text)
    # unwrap single-argument text commands, keep the argument
    text = re.sub(
        r"\\(?:section|subsection|subsubsection|paragraph|textbf|textit|"
        r"emph|texttt|title|author|caption)\{([^{}]*)\}", r"\1", text)
    text = re.sub(r"\\begin\{[^}]+\}|\\end\{[^}]+\}", " ", text)
    text = re.sub(r"\\[a-zA-Z]+(\[[^\]]*\])?(\{[^{}]*\})?", " ", text)
    text = re.sub(r"[{}]", "", text)
    text = re.sub(r"[ \t]+", " ", text)
    text = re.sub(r"\n{3,}", "\n\n", text)
    return text.strip()
