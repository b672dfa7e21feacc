"""Dependency-light (stdlib-only) text processing core.

These modules run inside executor python workers; keeping them free of
pyspark/pandas imports keeps worker cold-start cheap (at 1000 executors the
per-worker import time is a real startup constant).
"""
