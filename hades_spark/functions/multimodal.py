"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

Images / audio / video ride the pipeline as binary columns with a
``media_type`` discriminator and a ``meta: map<string,string>``. The
Spark-side machinery — schema, Arrow batch shape, ``mapInPandas``
signatures, partitioning — is real and tested; the actual codec work is
stubbed (the decode libraries are not in this container): ``decode_media``
raises ``NotImplementedError`` unless the deterministic fake decoder is
selected, which derives stable pseudo-metadata from the bytes (so tests and
oracles exercise the full distributed path).

At 100 TB the rule that matters here: binary payloads are NEVER a shuffle
key and never pass through a groupBy — metadata extraction is narrow
(mapInPandas in the scan stage), and any aggregation happens on the small
extracted-metadata columns after the binary column is dropped.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = (
    "media_id string, media_type string, n_bytes bigint, sha string, "
    "width int, height int, duration_ms int, error string"
)


def real_decode(payload: bytes, media_type: str) -> dict:
    """Real codec path — requires image/audio libs not present here."""
    raise NotImplementedError(
        "media decoding requires codec libraries (PIL/ffmpeg) that are not "
        "available in this environment; use fake_decode for plumbing tests"
    )


def fake_decode(payload: bytes, media_type: str) -> dict:
    """Deterministic stand-in decoder: stable pseudo width/height/duration
    derived from the payload hash — same schema and failure contract as the
    real path."""
    if payload is None:
        return {"n_bytes": 0, "sha": "", "width": None, "height": None,
                "duration_ms": None, "error": "empty payload"}
    sha = hashlib.sha256(payload).hexdigest()
    n = len(payload)
    meta = {"n_bytes": n, "sha": sha, "width": None,
            "height": None, "duration_ms": None, "error": None}
    if media_type == "image":
        meta["width"] = 160 + n % 1920
        meta["height"] = 120 + (n * 7) % 1080
    elif media_type in ("audio", "video"):
        meta["duration_ms"] = 500 + (n * 131) % 600000
        if media_type == "video":
            meta["width"] = 320 + n % 1600
            meta["height"] = 240 + (n * 7) % 840
    else:
        meta["error"] = f"unknown media_type: {media_type}"
    return meta


def extract_media_metadata(
    df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    type_col: str = "media_type",
    decoder=fake_decode,
) -> DataFrame:
    """(id, payload, type, ...) -> MEDIA_SCHEMA rows via mapInPandas.

    Row-level error isolation (O11): a failing decode fills ``error``
    instead of killing the task — the reference's per-item try/except
    (``batch.py:245-291``) restated per Arrow batch.
    """
    cols = df.select(
        F.col(id_col).cast("string").alias("media_id"),
        F.col(type_col).alias("media_type"),
        F.col(payload_col).alias("_payload"),
    )

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, mt, payload in zip(
                pdf["media_id"], pdf["media_type"], pdf["_payload"]
            ):
                try:
                    meta = decoder(
                        bytes(payload) if payload is not None else None, mt
                    )
                except NotImplementedError:
                    raise
                except Exception as e:  # row-level isolation
                    meta = {"n_bytes": None, "sha": None, "width": None,
                            "height": None, "duration_ms": None,
                            "error": str(e)}
                rows.append({"media_id": mid, "media_type": mt, **meta})
            yield pd.DataFrame(
                rows,
                columns=["media_id", "media_type", "n_bytes", "sha",
                         "width", "height", "duration_ms", "error"],
            )

    return cols.mapInPandas(_extract, schema=MEDIA_SCHEMA)
