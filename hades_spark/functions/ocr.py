"""OCR seam for scanned / image-only PDF pages.

Reference parity: HADES routes scanned documents through Docling's
layout + OCR stack (``core/extractors/extractors_docling.py:100-227``).
OCR engines (tesseract / docling) are not installable in this
container, so the backend is a documented seam in the same style as
``functions/multimodal.py``: ``RealOcrBackend`` raises
``NotImplementedError`` with the deployment note; ``FakeOcrBackend``
deterministically recognizes the fixture raster written by
``textcore.pdf.make_scanned_pdf`` (the page text rides utf-8-encoded
behind ``OCR_MARKER`` inside the fake-JPEG payload), so tests and the
DuckDB oracle exercise the FULL distributed path with real value
checks: PDF parse (xref overlay, page-tree walk), raw image-XObject /
inline-image cut, Arrow-batched ``mapInPandas``, per-worker backend
singleton.

100-TB shape: PDF payloads are never a shuffle key and never pass a
groupBy — the OCR stage is narrow (``mapInPandas`` in the scan stage)
and emits only small (url, page_no, text) rows; the heavy engine loads
once per python worker via the singleton, not once per task.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..textcore.pdf import OCR_MARKER, pdf_page_images


class OcrBackend:
    """One OCR engine instance per python worker (see ``get_ocr_backend``).

    ``recognize`` takes a batch of raw image payloads (the still-encoded
    bytes ``pdf_page_images`` cut — e.g. JPEG files for /DCTDecode
    XObjects) and returns one text per payload ('' = illegible)."""

    def recognize(self, payloads: list[bytes | None]) -> list[str]:
        raise NotImplementedError


class RealOcrBackend(OcrBackend):
    """Real OCR path — requires an engine not present in this container.

    On a real cluster: load tesseract/docling here (once per worker via
    the singleton), decode the payload with the codec matching the
    inventory's ``filter`` (JPEG for /DCTDecode, raw+predictors for
    /FlateDecode rasters), and run layout+OCR per page image exactly
    like the reference's Docling pipeline."""

    def __init__(self):
        raise NotImplementedError(
            "OCR engines (tesseract/docling) are not available in this "
            "environment; use FakeOcrBackend for plumbing tests")


class FakeOcrBackend(OcrBackend):
    """Deterministic stand-in: recognizes the ``make_scanned_pdf``
    fixture raster — text is utf-8 behind ``OCR_MARKER`` inside the
    payload; anything unmarked is illegible (''). Same signature and
    failure contract as a real engine. ``init_count`` is class-level
    telemetry for the one-init-per-worker assertion."""

    init_count = 0

    def __init__(self):
        type(self).init_count += 1

    def recognize(self, payloads: list[bytes | None]) -> list[str]:
        out: list[str] = []
        for p in payloads:
            if not p:
                out.append("")
                continue
            b = bytes(p)
            i = b.find(OCR_MARKER)
            if i < 0:
                out.append("")
                continue
            body = b[i + len(OCR_MARKER):]
            if body.endswith(b"\xff\xd9"):  # the fixture's JPEG EOI
                body = body[:-2]  # 0xff never occurs in utf-8: unambiguous
            out.append(body.decode("utf-8", "replace"))
        return out


_OCR_CACHE: dict = {}


def get_ocr_backend(factory) -> OcrBackend:
    """Executor-global lazy singleton, same contract and caveats as
    ``embedding.get_backend``: only plain module-level classes are
    cached (a lambda/partial or function-local class deserializes fresh
    per task and could capture per-instance config — caching those
    would silently share the wrong engine)."""
    import inspect

    if not inspect.isclass(factory) or "<locals>" in factory.__qualname__:
        return factory()
    key = (factory.__module__, factory.__qualname__)
    b = _OCR_CACHE.get(key)
    if b is None:
        b = factory()
        _OCR_CACHE[key] = b
    return b


OCR_PAGE_SCHEMA = "url string, page_no int, n_images int, text string"


def ocr_scanned_pages(
    df: DataFrame,
    backend_factory=FakeOcrBackend,
    url_col: str = "url",
    payload_col: str = "payload",
    include_text_pages: bool = False,
) -> DataFrame:
    """(url, pdf-bytes) -> one row per OCR'd page:
    ``(url, page_no, n_images, text)``.

    Narrow ``mapInPandas``: each worker inventories its PDFs' page
    images (``pdf_page_images``), keeps pages whose text layer came up
    empty (pass ``include_text_pages=True`` to OCR everything — the
    mixed-scan re-OCR shape), and batch-recognizes each page's images
    through the per-worker backend singleton, joining multi-image pages
    with newlines in inventory order. Pages with no images emit
    nothing; a page whose images are all illegible emits ``text=''``
    (it WAS OCR'd — callers distinguish 'no raster' from 'unreadable
    raster')."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        backend = get_ocr_backend(backend_factory)
        for pdfs in batches:
            urls: list[str] = []
            pnos: list[int] = []
            nimg: list[int] = []
            texts: list[str] = []
            for url, payload in zip(pdfs["url"], pdfs["payload"]):
                if payload is None:
                    continue
                by_page: dict[int, list[bytes]] = {}
                for im in pdf_page_images(bytes(payload)):
                    if im["page_has_text"] and not include_text_pages:
                        continue
                    by_page.setdefault(im["page_no"], []) \
                        .append(im["payload"])
                for pno in sorted(by_page):
                    recognized = backend.recognize(by_page[pno])
                    urls.append(url)
                    pnos.append(pno)
                    nimg.append(len(by_page[pno]))
                    texts.append("\n".join(t for t in recognized if t))
            yield pd.DataFrame({
                "url": pd.Series(urls, dtype=object),
                "page_no": pd.Series(pnos, dtype="int32"),
                "n_images": pd.Series(nimg, dtype="int32"),
                "text": pd.Series(texts, dtype=object),
            })

    return (
        df.select(F.col(url_col).alias("url"),
                  F.col(payload_col).alias("payload"))
        .mapInPandas(gen, OCR_PAGE_SCHEMA)
    )
