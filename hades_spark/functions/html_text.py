"""Spark bindings for the deterministic HTML -> text extraction.

The pure transformation lives in ``hades_spark.textcore.html`` (stdlib-only
so executor worker import stays cheap); this module re-exports it and wraps
it as an Arrow-batched pandas UDF. See textcore/html.py for the
byte-identical contract and the reference citations
(``/root/reference/core/extractors/extractors_markdown.py:619-697``).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from ..textcore.html import (  # noqa: F401  (re-exported public API)
    decode_html_bytes,
    extract_text_from_html_bytes,
    html_to_text,
    html_to_text_spec,
    unescape_html,
    unescape_html_spec,
)


@F.pandas_udf(StringType())
def html_to_text_udf(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
    """Arrow-batched pandas UDF over an ``html: binary`` (or string) column."""
    for s in batches:
        yield s.map(
            lambda v: extract_text_from_html_bytes(v)
            if isinstance(v, (bytes, bytearray)) or v is None
            else html_to_text(v)
        )


def with_extracted_text(df, html_col: str = "html", out_col: str = "text"):
    """pages -> pages + deterministic extracted text column.

    Narrow (no shuffle): the UDF runs inside the scan stage, so at 100 TB
    this parallelizes to however many input splits the table has.
    """
    return df.withColumn(out_col, html_to_text_udf(F.col(html_col)))
