"""Incremental / streaming semantics (watermark batches + structured streaming)."""
