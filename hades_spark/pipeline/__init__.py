"""End-to-end KG-construction pipeline stages and synthetic corpora."""
