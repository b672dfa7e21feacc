"""Table IO: partitioned parquet (Iceberg-compatible layout) + manifests."""
