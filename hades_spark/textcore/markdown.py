"""Markdown extraction — text conversion, code blocks, tables, links,
headers. Pure stdlib ``re``; semantics match the reference's markdown
extractor (``/root/reference/core/extractors/extractors_markdown.py``:
plain text ``:439-487``, fenced+indented code ``:235-291``, pipe tables
``:293-335``, inline/reference/auto links ``:337-394``, ATX/Setext headers
``:396-437``), so markdown documents flow through the same mentions/triples
pipeline as HTML pages.
"""

from __future__ import annotations

import re
from typing import Any

_RE_FENCE = re.compile(r"```([^\n`]*)\n(.*?)```", re.DOTALL)
_RE_INDENTED = re.compile(r"(?:^|\n\n)((?:(?:    |\t).*\n?)+)")
_RE_TABLE = re.compile(r"(\|.+\|)\n(\|[-:| ]+\|)\n((?:\|.+\|\n?)+)")
_RE_INLINE_LINK = re.compile(r"(?<!\!)\[([^\]]+)\]\(([^)]+)\)")
_RE_REF_DEF = re.compile(r"^\[([^\]]+)\]:\s*(.+)$", re.MULTILINE)
_RE_REF_USE = re.compile(r"(?<!\!)\[([^\]]+)\]\[([^\]]*)\]")
_RE_AUTOLINK = re.compile(r"<(https?://[^>]+)>")
_RE_ATX = re.compile(r"^(#{1,6})\s+(.+)$", re.MULTILINE)
_RE_SETEXT = re.compile(r"^(.+)\n([=-]+)$", re.MULTILINE)


def md_code_blocks(content: str) -> list[dict[str, Any]]:
    """Fenced blocks (language-tagged) plus 4-space/tab indented blocks."""
    out = []
    for language, code in _RE_FENCE.findall(content):
        out.append({"language": language.strip() or "text",
                    "code": code.strip()})
    remainder = _RE_FENCE.sub("", content)
    for block in _RE_INDENTED.findall(remainder):
        lines = []
        for line in block.split("\n"):
            if line.startswith("    "):
                lines.append(line[4:])
            elif line.startswith("\t"):
                lines.append(line[1:])
            else:
                lines.append("")
        dedented = "\n".join(lines)
        if dedented.strip():
            out.append({"language": "text", "code": dedented.strip()})
    return out


def _cells(row: str) -> list[str]:
    parts = [c.strip() for c in row.split("|")]
    if parts and parts[0] == "" and parts[-1] == "":
        return parts[1:-1]
    return parts


def md_tables(content: str) -> list[dict[str, Any]]:
    tables = []
    for header_row, _sep, body in _RE_TABLE.findall(content):
        headers = _cells(header_row)
        rows = [c for c in (_cells(r) for r in body.strip().split("\n"))
                if any(x != "" for x in c)]
        tables.append({"headers": headers, "rows": rows})
    return tables


def md_links(content: str) -> list[dict[str, Any]]:
    """Inline [t](u), reference [t][ref] (case-insensitive defs), <auto>."""
    links = [{"text": t, "href": u, "type": "inline"}
             for t, u in _RE_INLINE_LINK.findall(content)]
    ref_defs = {k.lower(): v for k, v in _RE_REF_DEF.findall(content)}
    for text, ref in _RE_REF_USE.findall(content):
        key = (ref or text).lower()
        if key in ref_defs:
            links.append({"text": text, "href": ref_defs[key],
                          "type": "reference"})
    for url in _RE_AUTOLINK.findall(content):
        links.append({"text": url, "href": url, "type": "autolink"})
    return links


def md_headers(content: str) -> list[dict[str, Any]]:
    """ATX + Setext headers, sorted by document position."""
    headers = [
        {"level": len(m.group(1)), "text": m.group(2).strip(),
         "position": m.start()}
        for m in _RE_ATX.finditer(content)
    ]
    for m in _RE_SETEXT.finditer(content):
        headers.append({
            "level": 1 if m.group(2)[0] == "=" else 2,
            "text": m.group(1).strip(), "position": m.start(),
        })
    headers.sort(key=lambda h: h["position"])
    return headers


def markdown_to_text(content: str) -> str:
    """Markdown -> plain text, reference rewrite order."""
    text = re.sub(r"```[^\n`]*\n", "", content)
    text = re.sub(r"```", "", text)
    text = re.sub(r"`([^`]+)`", r"\1", text)
    text = re.sub(r"^#{1,6}\s+", "", text, flags=re.MULTILINE)
    text = re.sub(r"\*\*([^*]+)\*\*", r"\1", text)
    text = re.sub(r"\*([^*]+)\*", r"\1", text)
    text = re.sub(r"__([^_]+)__", r"\1", text)
    text = re.sub(r"_([^_]+)_", r"\1", text)
    text = re.sub(r"\[([^\]]+)\]\([^)]+\)", r"\1", text)
    text = re.sub(r"\[([^\]]+)\]\[[^\]]*\]", r"\1", text)
    text = re.sub(r"!\[([^\]]*)\]\([^)]+\)", r"\1", text)
    text = re.sub(r"^[-*_]{3,}$", "", text, flags=re.MULTILINE)
    text = re.sub(r"^>\s*", "", text, flags=re.MULTILINE)
    text = re.sub(r"^[\s]*[-*+]\s+", "", text, flags=re.MULTILINE)
    text = re.sub(r"^[\s]*\d+\.\s+", "", text, flags=re.MULTILINE)
    text = re.sub(r"\n{3,}", "\n\n", text)
    return text.strip()
