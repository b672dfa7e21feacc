"""Bibliography-section detection and entry splitting over extracted text.

Semantics match the reference's universal bibliography extractor
(``/root/reference/core/tools/rag_utils/academic_citation_toolkit.py``:
3 section-location strategies ``:413-471`` — explicit header, numbered
``[n]`` list near the end, author-year block near the end — and 3
entry-splitting strategies ``:473-544`` — numbered, paragraph-separated,
line-grouped). This surfaces citations WITHOUT machine ids (arXiv/DOI/PMID),
which a regex-window scan alone never finds.

Executor-side module: stdlib ``re`` only.
"""

from __future__ import annotations

import re

_HEADER_PATTERNS = (
    re.compile(
        r"\b(References|Bibliography|REFERENCES|BIBLIOGRAPHY|Works Cited|"
        r"Literature Cited)\b.*?(?=\n\n[A-Z][a-z]+|\Z)",
        re.DOTALL | re.IGNORECASE),
    re.compile(r"\b(References|Bibliography)\b(.*?)(?=\n\n|\Z)",
               re.DOTALL | re.IGNORECASE),
    re.compile(r"## References(.*?)(?=\n##|\Z)", re.DOTALL | re.IGNORECASE),
    re.compile(r"# References(.*?)(?=\n#|\Z)", re.DOTALL | re.IGNORECASE),
)
_RE_NUMBERED_TAIL = re.compile(r"(\[\d+\].*?)(?=\n\n[A-Z][a-z]+|\Z)",
                               re.DOTALL)
_RE_AUTHOR_YEAR_TAIL = re.compile(
    r"((?:[A-Z][a-z]+(?:\s+et\s+al\.?)?,\s+\d{4}.*?\n){5,})", re.DOTALL)
_RE_STRIP_HEADER = re.compile(
    r"^(References|Bibliography|REFERENCES|BIBLIOGRAPHY|Works Cited|"
    r"Literature Cited)\s*\n?", re.IGNORECASE)
_RE_NUMBERED_ENTRY = re.compile(r"\[(\d+)\]\s*(.*?)(?=\[\d+\]|\Z)", re.DOTALL)
_RE_ENTRY_START = re.compile(r"^([A-Z]|\d+\.)")


def find_bibliography_section(full_text: str) -> str | None:
    """Locate the references block via the reference's 3 strategies, in
    order; None when no substantial section exists."""
    if not full_text:
        return None

    # Strategy 1: explicit section header
    for pat in _HEADER_PATTERNS:
        m = pat.search(full_text)
        if m and len(m.group(0)) > 50:
            return m.group(0)

    # Strategy 2: numbered [n] list in the last 8000 chars
    m = _RE_NUMBERED_TAIL.search(full_text[-8000:])
    if m and len(m.group(0)) > 200:
        return m.group(0)

    # Strategy 3: author-year block in the last 5000 chars
    m = _RE_AUTHOR_YEAR_TAIL.search(full_text[-5000:])
    if m:
        return m.group(0)
    return None


def split_bibliography_entries(bibliography_text: str) -> list[tuple[str, str]]:
    """Split a references block into (entry_number, raw_text) pairs via the
    reference's 3 strategies: numbered entries, double-newline paragraphs,
    line grouping on capital/number starts."""
    text = _RE_STRIP_HEADER.sub("", bibliography_text)

    # Strategy 1: numbered entries [1], [2], ...
    numbered = _RE_NUMBERED_ENTRY.findall(text)
    if numbered:
        return [(num, entry.strip()) for num, entry in numbered
                if len(entry.strip()) > 20]

    # Strategy 2: paragraph-separated
    entries: list[tuple[str, str]] = []
    paragraphs = [p.strip() for p in text.split("\n\n")
                  if p.strip() and len(p.strip()) > 30]
    for i, paragraph in enumerate(paragraphs, 1):
        entries.append((str(i), paragraph))

    # Strategy 3: line-grouped (only when 2 produced nothing)
    if not entries:
        lines = [ln.strip() for ln in text.split("\n") if ln.strip()]
        current = ""
        n = 1
        for line in lines:
            if _RE_ENTRY_START.match(line) and len(current) > 50:
                entries.append((str(n), current))
                current = line
                n += 1
            else:
                current = (current + " " + line).strip()
        if len(current) > 50:
            entries.append((str(n), current))
    return entries
