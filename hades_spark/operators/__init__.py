"""Composite DataFrame operators (joins, clustering, dedup, similarity)."""
