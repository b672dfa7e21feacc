"""Embedding stage — ``mapInPandas`` with a pluggable per-executor backend.

The production contract mirrors the reference embedder
(``embedders_jina.py:904-914``): a dense float vector per chunk, mean-pooled
and L2-normalized, fixed dimension. The heavy model is loaded lazily ONCE
per executor process inside the iterator closure (the Spark restatement of
the reference's persistent embedder daemon, ``embedder_service.py:111-147``)
— never per batch, never per row.

For tests/bench this module ships a **deterministic hash embedder**: char
3-gram feature hashing into ``dim`` buckets + L2 norm. Same shape/normalize
contract as the real model, fully reproducible, and it preserves the
similar-surface => high-cosine behavior the linking stage depends on.

A real model backend would subclass ``EmbedderBackend`` and load its weights
in ``__init__`` (executor-side); nothing else changes. The model libraries
are not in this container, so that path is a documented stub.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F


class EmbedderBackend:
    """One instance per executor process; ``encode`` maps a batch of texts
    to a (len(texts), dim) float32 matrix of L2-normalized rows."""

    dim: int

    def encode(self, texts: list[str]) -> np.ndarray:
        raise NotImplementedError


class HashEmbedder(EmbedderBackend):
    """Deterministic char-3-gram feature-hash embedder."""

    def __init__(self, dim: int = 64, ngram: int = 3):
        self.dim = dim
        self.ngram = ngram

    def _grams(self, text: str) -> list[str]:
        t = " " + (text or "").lower() + " "
        n = self.ngram
        return [t[i: i + n] for i in range(max(len(t) - n + 1, 1))]

    def encode(self, texts: list[str]) -> np.ndarray:
        out = np.zeros((len(texts), self.dim), dtype=np.float32)
        for r, text in enumerate(texts):
            for g in self._grams(text):
                h = int.from_bytes(
                    hashlib.blake2b(g.encode(), digest_size=8).digest(), "big"
                )
                sign = 1.0 if (h >> 63) & 1 else -1.0
                out[r, h % self.dim] += sign
        norms = np.linalg.norm(out, axis=1, keepdims=True)
        np.divide(out, norms, out=out, where=norms > 0)
        return out


_BACKEND_CACHE: dict = {}


def get_backend(factory, dim: int) -> EmbedderBackend:
    """Executor-global lazy singleton (O7 — the reference's persistent
    embedder daemon, ``embedder_service.py:111-147``): one backend instance
    per python worker PROCESS, reused across tasks and Arrow batches, so a
    heavy model loads once per executor rather than once per task.

    Only plain CLASSES are cached: a lambda/partial factory deserializes
    as a new object per task (identity keying would miss every time and
    leak one backend per task), and keying by code location would wrongly
    share backends between closures capturing different arguments —
    configure a heavy model via an EmbedderBackend subclass instead."""
    import inspect

    if not inspect.isclass(factory) or "<locals>" in factory.__qualname__:
        # lambdas/partials AND function-local classes: distinct objects can
        # share a (module, qualname) key while capturing different config —
        # a cache hit would silently reuse the wrong backend
        return factory(dim)
    key = (factory.__module__, factory.__qualname__, dim)
    b = _BACKEND_CACHE.get(key)
    if b is None:
        global _IN_SINGLETON_INIT
        _IN_SINGLETON_INIT = True  # backends log inits ONLY on this path
        try:
            b = factory(dim)
        finally:
            _IN_SINGLETON_INIT = False
        _BACKEND_CACHE[key] = b
    return b


# True only while get_backend constructs a cache-managed instance —
# lets a backend's init-telemetry distinguish the one-per-worker
# singleton path from ad-hoc driver-side constructions (tests, oracle
# staging), which may legitimately repeat in one process.
_IN_SINGLETON_INIT = False


class ModelEmbedder(EmbedderBackend):
    """Real-model backend stub — the container has no model libraries.

    On a real cluster: load the model here (once per executor), move to the
    local device, and implement ``encode`` with batched forward passes —
    batch size tuned to device memory exactly like the reference's VRAM
    table (``README.md:321-327``).
    """

    def __init__(self, model_name: str = "jinaai/jina-embeddings-v4",
                 dim: int = 2048):
        raise NotImplementedError(
            "model libraries are not available in this environment; "
            "use HashEmbedder or provide a custom EmbedderBackend"
        )


def embed_chunks(
    chunks: DataFrame,
    backend_factory=HashEmbedder,
    dim: int = 64,
    text_col: str = "text",
    batch_size: int = 256,
    model_name: str = "hash-v1",
) -> DataFrame:
    """chunks -> embeddings(doc_id, chunk_index, embedding_id, embedding,
    model). ``mapInPandas`` so the backend is constructed lazily once per
    task and reused across Arrow batches; no shuffle (narrow)."""
    out_schema = (
        "doc_id string, chunk_index int, embedding_id string, "
        "embedding array<float>, model string"
    )
    cols = chunks.select(
        F.col("doc_id").cast("string"),
        F.col("chunk_index").cast("int"),
        F.col("chunk_id"),
        F.col(text_col).alias("_text"),
    )

    def _embed(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        backend = get_backend(backend_factory, dim)  # once per WORKER (O7)
        for pdf in batches:
            texts = pdf["_text"].fillna("").tolist()
            vecs = []
            for i in range(0, len(texts), batch_size):
                vecs.append(backend.encode(texts[i: i + batch_size]))
            mat = np.vstack(vecs) if vecs else np.zeros((0, backend.dim))
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "chunk_index": pdf["chunk_index"],
                "embedding_id": pdf["chunk_id"] + "_emb",
                "embedding": [row.tolist() for row in mat],
                "model": model_name,
            })

    return cols.mapInPandas(_embed, schema=out_schema)


def mean_pool_l2(token_matrix: np.ndarray) -> np.ndarray:
    """Token-matrix (n_tokens, dim) -> one L2-normalized mean-pooled row —
    the reference's late-pooling contract (``embedders_jina.py:904-914``:
    per-token embeddings averaged then normalized). Pure function, shared
    by the distributed path and tests."""
    if token_matrix.size == 0:
        return np.zeros(token_matrix.shape[-1] if token_matrix.ndim == 2
                        else 0, dtype=np.float32)
    pooled = token_matrix.mean(axis=0)
    n = np.linalg.norm(pooled)
    return (pooled / n if n > 0 else pooled).astype(np.float32)


def pooled_embed_chunks(
    chunks: DataFrame,
    backend_factory=HashEmbedder,
    dim: int = 64,
    text_col: str = "text",
    model_name: str = "hash-pooled-v1",
) -> DataFrame:
    """A7: REAL token pooling — embed each whitespace token, mean-pool the
    token matrix per chunk, L2-normalize (vs ``embed_chunks``, which encodes
    the whole chunk text as one string). ``mapInPandas``; backend built once
    per task; per-batch token lists are flattened into ONE ``encode`` call
    so the backend sees large batches (the reference's batched forward
    pass), then split back by chunk."""
    out_schema = (
        "doc_id string, chunk_index int, embedding_id string, "
        "embedding array<float>, n_tokens int, model string"
    )
    cols = chunks.select(
        F.col("doc_id").cast("string"),
        F.col("chunk_index").cast("int"),
        F.col("chunk_id"),
        F.col(text_col).alias("_text"),
    )

    def _embed(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        backend = get_backend(backend_factory, dim)  # once per WORKER (O7)
        for pdf in batches:
            token_lists = [
                (t or "").split() for t in pdf["_text"].fillna("")]
            flat = [tok for toks in token_lists for tok in toks]
            mat = (backend.encode(flat) if flat
                   else np.zeros((0, backend.dim), dtype=np.float32))
            vecs, i = [], 0
            for toks in token_lists:
                chunk_mat = mat[i: i + len(toks)]
                i += len(toks)
                vecs.append(mean_pool_l2(
                    chunk_mat if len(toks)
                    else np.zeros((0, backend.dim), dtype=np.float32)))
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "chunk_index": pdf["chunk_index"],
                "embedding_id": pdf["chunk_id"] + "_emb",
                "embedding": [v.tolist() for v in vecs],
                "n_tokens": [len(t) for t in token_lists],
                "model": model_name,
            })

    return cols.mapInPandas(_embed, schema=out_schema)


class TokenEmbedderBackend(EmbedderBackend):
    """Backend contract for LATE CHUNKING (X5): token-level embeddings for
    a FULL document plus character offsets per token. A real model backend
    returns CONTEXTUALIZED token vectors from one forward pass over the
    whole document (the reference's ``encode_full_document``,
    ``embedders_jina.py:688-780``); the slicing/pooling downstream is
    identical either way — that algorithm is the portable part."""

    def encode_tokens(self, text: str) -> tuple[list[tuple[int, int]],
                                                np.ndarray]:
        """text -> (offset_mapping [(start_char, end_char)], matrix
        (n_tokens, dim))."""
        raise NotImplementedError


class HashTokenEmbedder(HashEmbedder, TokenEmbedderBackend):
    """Deterministic token-level backend: whitespace tokens (regex ``\\S+``
    with character offsets) each hash-embedded. Stands in for the model's
    tokenizer+forward pass; the offsets/matrix contract is the real one."""

    _TOKEN_RE = None

    def encode_tokens(self, text: str):
        import re

        if HashTokenEmbedder._TOKEN_RE is None:
            HashTokenEmbedder._TOKEN_RE = re.compile(r"\S+")
        ms = list(HashTokenEmbedder._TOKEN_RE.finditer(text or ""))
        offsets = [(m.start(), m.end()) for m in ms]
        mat = (self.encode([m.group(0) for m in ms]) if ms
               else np.zeros((0, self.dim), dtype=np.float32))
        return offsets, mat


def late_chunk_spans(num_tokens: int, chunk_size: int,
                     overlap: int) -> list[tuple[int, int]]:
    """The reference's late-chunking span loop
    (``embedders_jina.py:860-940``, no special tokens): fixed-size token
    windows, next start = max(end - overlap, 0), last chunk ends at
    num_tokens and breaks. -> [(start_token, end_token_exclusive)].
    Pure function: unit-tested against a direct transliteration of the
    reference loop, and the SQL oracle recomputes it in closed form
    (start_k = k * (size - overlap))."""
    if chunk_size <= 0:
        raise ValueError("chunk_size must be positive")
    if overlap >= chunk_size:
        raise ValueError(
            f"overlap ({overlap}) must be < chunk_size ({chunk_size}) "
            "or the span loop cannot advance")
    spans: list[tuple[int, int]] = []
    start = 0
    while start < num_tokens:
        end = min(start + chunk_size, num_tokens)
        spans.append((start, end))
        if end >= num_tokens:
            break
        start = max(end - overlap, 0)
    return spans


def late_chunk_embed(
    docs: DataFrame,
    backend_factory=HashTokenEmbedder,
    dim: int = 64,
    chunk_size_tokens: int = 500,
    chunk_overlap_tokens: int = 200,
    id_col: str = "doc_id",
    text_col: str = "text",
    model_name: str = "hash-late-v1",
) -> DataFrame:
    """X5 late chunking (``embedders_jina.py:824-940``): full-document
    token embeddings -> per-chunk token-slice -> mean-pool -> L2. One
    narrow ``mapInPandas`` pass; the backend (real model on a cluster,
    hash stand-in here) is an executor-global singleton. Chunk text spans
    the chars of its first..last token (offset mapping), exactly like the
    reference; defaults mirror the reference's 500/200 token config
    (``hades.yaml:58-61``)."""
    out_schema = (
        f"{id_col} string, chunk_index int, total_chunks int, "
        "start_char int, end_char int, start_token int, end_token int, "
        "text string, embedding array<float>, model string"
    )
    cols = docs.select(F.col(id_col).cast("string").alias(id_col),
                       F.col(text_col).alias("_text"))

    def _embed(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        backend = get_backend(backend_factory, dim)  # once per WORKER (O7)
        for pdf in batches:
            rows: list[tuple] = []
            for did, text in zip(pdf[id_col], pdf["_text"]):
                text = text or ""
                offsets, mat = backend.encode_tokens(text)
                spans = late_chunk_spans(
                    len(offsets), chunk_size_tokens, chunk_overlap_tokens)
                total = len(spans)
                for ci, (s, e) in enumerate(spans):
                    sc, ec = offsets[s][0], offsets[e - 1][1]
                    rows.append((
                        did, ci, total, sc, ec, s, e, text[sc:ec],
                        mean_pool_l2(mat[s:e]).tolist(), model_name,
                    ))
            yield pd.DataFrame(rows, columns=[
                id_col, "chunk_index", "total_chunks", "start_char",
                "end_char", "start_token", "end_token", "text",
                "embedding", "model"])

    return cols.mapInPandas(_embed, schema=out_schema)


def token_embeddings_table(
    docs: DataFrame,
    backend_factory=HashTokenEmbedder,
    dim: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """-> (id, token_index, embedding): the raw per-document token-level
    output of a ``TokenEmbedderBackend`` — the staging surface the
    late-chunking oracles verify against (a contextual backend's token
    vectors depend on the WHOLE document, so they must be produced by
    one per-document forward pass, never per-token calls). Narrow
    ``mapInPandas``; backend is the executor-global singleton."""
    out_schema = f"{id_col} string, token_index int, embedding array<float>"
    cols = docs.select(F.col(id_col).cast("string").alias(id_col),
                       F.col(text_col).alias("_text"))

    def _tok(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        backend = get_backend(backend_factory, dim)
        for pdf in batches:
            rows: list[tuple] = []
            for did, text in zip(pdf[id_col], pdf["_text"]):
                _, mat = backend.encode_tokens(text or "")
                rows.extend((did, i, v.tolist())
                            for i, v in enumerate(mat))
            yield pd.DataFrame(rows,
                               columns=[id_col, "token_index", "embedding"])

    return cols.mapInPandas(_tok, schema=out_schema)


def embed_text_column(df: DataFrame, text_col: str, out_col: str = "embedding",
                      dim: int = 64) -> DataFrame:
    """Attach a deterministic embedding column to any DataFrame (used by
    linking / similarity tests). Arrow-batched scalar path."""
    emb = HashEmbedder(dim)

    @F.pandas_udf("array<float>")
    def _udf(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in batches:
            mat = emb.encode(s.fillna("").tolist())
            yield pd.Series([row.tolist() for row in mat])

    return df.withColumn(out_col, _udf(F.col(text_col)))
