"""Format routing: per-document extraction dispatch (HTML vs Markdown).

The reference dispatches on file extension (``extractors_markdown.py:93-103``
routes .html/.htm to the HTML path, everything else to markdown). Restated
columnar: a ``doc_format`` discriminator column routes each row through the
matching pure extractor inside one Arrow-batched UDF — one pass, no
per-format scans.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import StringType

from ..textcore.route import (  # noqa: F401  (re-exported public API)
    detect_format,
    extract_text,
)


@F.pandas_udf(StringType())
def extract_text_routed_udf(
    it: Iterator[tuple[pd.Series, pd.Series]],
) -> Iterator[pd.Series]:
    for url_s, raw_s in it:
        yield pd.Series([extract_text(u, r) for u, r in zip(url_s, raw_s)])


def with_routed_text(df: DataFrame, url_col: str = "url",
                     raw_col: str = "html",
                     out_col: str = "text") -> DataFrame:
    return df.withColumn(out_col,
                         extract_text_routed_udf(F.col(url_col),
                                                 F.col(raw_col)))
