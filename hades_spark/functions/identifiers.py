"""Identifier validation (P7) — injection-safe table/collection/key names.

The reference validates every user-supplied collection name before
interpolating it into AQL (``structural_fusion.py:29-38``:
``^[a-zA-Z0-9_-]{1,256}$``) and document keys before lookups. Re-expressed
for the Spark surface: the same rules guard table paths/view names before
they reach ``spark.read``/``spark.sql`` string interpolation, plus a Column
twin for bulk-validating key columns (the reference's per-row key checks).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, functions as F

_SAFE_NAME = re.compile(r"^[a-zA-Z0-9_-]{1,256}$")
# ArangoDB _key charset (reference's document keys): no '/', no quotes
_SAFE_KEY = re.compile(r"^[a-zA-Z0-9_\-:.@()+,=;$!*'%]{1,254}$")


def validate_table_name(name: str) -> str:
    """Raise ValueError unless ``name`` is a safe identifier; returns it
    unchanged so calls compose: ``spark.table(validate_table_name(n))``."""
    if not _SAFE_NAME.match(name):
        raise ValueError(f"Invalid table/collection name: {name!r}")
    return name


def is_valid_key(key: str | None) -> bool:
    return bool(key) and bool(_SAFE_KEY.match(key))


def valid_key_col(c: Column) -> Column:
    """Column twin of ``is_valid_key`` (JVM regex, codegen-friendly) —
    bulk-filter rows whose keys the store would reject."""
    return c.isNotNull() & c.rlike(r"^[a-zA-Z0-9_\-:.@()+,=;$!*'%]{1,254}$")
