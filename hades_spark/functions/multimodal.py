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


def real_resize(payload: bytes, width: int, height: int) -> bytes:
    """Real image resize — requires PIL, not present here."""
    raise NotImplementedError(
        "image resize requires PIL which is not available in this "
        "environment; use fake_resize for plumbing tests")


def fake_resize(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic resize stand-in: a stable digest payload derived from
    (bytes, target dims) — same signature/failure contract as a real
    resampler, tiny output so tests stay fast."""
    h = hashlib.blake2b(digest_size=32)
    h.update(payload or b"")
    h.update(f"{width}x{height}".encode())
    return h.digest()


def resize_media(
    df: DataFrame,
    width: int,
    height: int,
    id_col: str = "media_id",
    payload_col: str = "payload",
    resizer=fake_resize,
) -> DataFrame:
    """Narrow mapInPandas image-resize stage: (id, payload) ->
    (media_id, payload, width, height, error). Row-level error isolation;
    binary in, binary out, never a shuffle key."""
    cols = df.select(
        F.col(id_col).cast("string").alias("media_id"),
        F.col(payload_col).alias("_payload"),
    )
    schema = ("media_id string, payload binary, width int, height int, "
              "error string")

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["_payload"]):
                try:
                    out = resizer(
                        bytes(payload) if payload is not None else b"",
                        width, height)
                    rows.append({"media_id": mid, "payload": out,
                                 "width": width, "height": height,
                                 "error": None})
                except NotImplementedError:
                    raise
                except Exception as e:
                    rows.append({"media_id": mid, "payload": None,
                                 "width": None, "height": None,
                                 "error": str(e)})
            yield pd.DataFrame(
                rows, columns=["media_id", "payload", "width", "height",
                               "error"])

    return cols.mapInPandas(_resize, schema=schema)


def fake_frame(payload: bytes, ts_ms: int) -> bytes:
    """Deterministic frame stand-in keyed by (payload, timestamp)."""
    h = hashlib.blake2b(digest_size=24)
    h.update(payload or b"")
    h.update(str(ts_ms).encode())
    return h.digest()


def sample_frames(
    df: DataFrame,
    every_ms: int = 1000,
    max_frames: int = 10,
    id_col: str = "media_id",
    payload_col: str = "payload",
    type_col: str = "media_type",
    decoder=fake_decode,
    framer=fake_frame,
) -> DataFrame:
    """Video frame sampling (narrow, UDTF-shaped): one row per sampled
    frame at t = 0, every_ms, 2*every_ms, ... up to the decoded duration,
    capped at ``max_frames`` per video. Non-video rows emit nothing.
    -> (media_id, frame_index, ts_ms, frame binary, error)."""
    cols = df.select(
        F.col(id_col).cast("string").alias("media_id"),
        F.col(type_col).alias("media_type"),
        F.col(payload_col).alias("_payload"),
    )
    schema = ("media_id string, frame_index int, ts_ms int, frame binary, "
              "error string")

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, mt, payload in zip(
                pdf["media_id"], pdf["media_type"], pdf["_payload"]
            ):
                if mt != "video":
                    continue
                try:
                    raw = bytes(payload) if payload is not None else None
                    meta = decoder(raw, mt)
                    if meta.get("error"):
                        # decoder-reported failure: propagate, never
                        # fabricate a frame (O11 row-level isolation)
                        rows.append({"media_id": mid, "frame_index": None,
                                     "ts_ms": None, "frame": None,
                                     "error": meta["error"]})
                        continue
                    dur = meta.get("duration_ms") or 0
                    n = min(dur // every_ms + 1, max_frames)
                    for i in range(int(n)):
                        ts = i * every_ms
                        rows.append({
                            "media_id": mid, "frame_index": i, "ts_ms": ts,
                            "frame": framer(raw, ts), "error": None})
                except NotImplementedError:
                    raise
                except Exception as e:
                    rows.append({"media_id": mid, "frame_index": None,
                                 "ts_ms": None, "frame": None,
                                 "error": str(e)})
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_index", "ts_ms", "frame",
                               "error"])

    return cols.mapInPandas(_frames, schema=schema)


def media_feature_vector(payload: bytes, dim: int = 32) -> list[float]:
    """Deterministic feature extraction stand-in: byte-histogram-of-hashes
    features, L2-normalized — the plumbing contract of a real vision/audio
    encoder (which would load per executor like ModelEmbedder)."""
    import numpy as np

    v = np.zeros(dim, dtype=np.float64)
    raw = payload or b""
    for i in range(0, len(raw), 64):
        chunk = raw[i: i + 64]
        h = int.from_bytes(
            hashlib.blake2b(chunk, digest_size=8).digest(), "big")
        v[h % dim] += 1.0 if (h >> 63) & 1 else -1.0
    n = np.linalg.norm(v)
    return (v / n if n > 0 else v).astype(float).tolist()


def media_features(
    df: DataFrame,
    dim: int = 32,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Narrow feature-extraction stage: binary -> array<float> embedding
    (deterministic stand-in; a real encoder plugs in per executor)."""
    cols = df.select(
        F.col(id_col).cast("string").alias("media_id"),
        F.col(payload_col).alias("_payload"),
    )
    schema = "media_id string, features array<float>"

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "features": [
                    media_feature_vector(
                        bytes(p) if p is not None else b"", dim)
                    for p in pdf["_payload"]
                ],
            })

    return cols.mapInPandas(_feat, schema=schema)


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
