"""Table IO abstraction: one module gating every write.

On a runtime with an Iceberg catalog the same calls route to
``df.writeTo(tbl).append()`` / ``MERGE INTO``; in this sandbox they produce
an identical partition layout on plain parquet paths (``tbl/part=.../``),
so the pipeline code is catalog-agnostic (SURVEY §7.0 / §7.4.5).

Key behaviors re-expressed from the reference:
- **idempotent upsert** (``onDuplicate=replace`` NDJSON import,
  ``nl_graph_materialize.py:366-387``): ``upsert_by_key`` = read existing,
  anti-join old rows whose key reappears, union new, atomic swap.
- **salted repartition** (north-rule skew handling; reference is
  single-node so had none — SURVEY §4 O12): spread hot partition keys over
  ``n_salts`` shuffle buckets.
- **partition-pruned reads**: filters on the partition column prune
  directories for free.
"""

from __future__ import annotations

import shutil
import uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, functions as F


def write_table(df: DataFrame, path: str, partition_by: list[str] | None = None,
                mode: str = "overwrite") -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def read_table(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def salted_repartition(df: DataFrame, key_col: str, n_partitions: int,
                       n_salts: int = 8,
                       salt_cols: list[str] | None = None) -> DataFrame:
    """Repartition on (key, salt) so a single hot key spreads over
    ``n_salts`` buckets; drop the salt after the exchange.

    The salt is a hash of row CONTENT (``salt_cols``, default: every
    column), never ``monotonically_increasing_id()``: a content hash gives
    the same partition assignment when an upstream task is retried, so a
    mid-write retry can't duplicate/lose rows (the classic nondeterministic-
    repartition hazard)."""
    cols = salt_cols if salt_cols else df.columns
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in cols]), n_salts)
    )
    return salted.repartition(n_partitions, F.col(key_col), F.col("_salt")) \
                 .drop("_salt")


def upsert_by_key(
    spark: SparkSession,
    new_rows: DataFrame,
    path: str,
    key_cols: list[str],
    partition_by: list[str] | None = None,
) -> None:
    """MERGE-INTO semantics on a parquet path: rows in ``new_rows`` replace
    existing rows with the same key; everything else is kept. Write goes to
    a temp dir then atomically swaps, so a crash mid-write never leaves a
    half table (the tmp-rename pattern of ``state_manager.py:84-117``)."""
    p = Path(path)
    if p.exists() and partition_by:
        _upsert_partition_scoped(spark, new_rows, p, key_cols, partition_by)
        return

    if p.exists():
        existing = spark.read.parquet(path)
        keep = existing.join(
            new_rows.select(*key_cols).dropDuplicates(key_cols),
            key_cols, "left_anti",
        )
        merged = keep.unionByName(new_rows)
    else:
        merged = new_rows

    # the merged plan lazily reads the old files, so write the temp table
    # FIRST (materializing the merge), then swap directories atomically
    tmp = Path(str(p.parent / f".{p.name}.tmp-{uuid.uuid4().hex[:8]}"))
    write_table(merged, str(tmp), partition_by=partition_by)
    bak = Path(str(p.parent / f".{p.name}.bak-{uuid.uuid4().hex[:8]}"))
    if p.exists():
        p.rename(bak)
    tmp.rename(p)
    shutil.rmtree(bak, ignore_errors=True)


def _upsert_partition_scoped(
    spark: SparkSession,
    new_rows,
    p: Path,
    key_cols: list[str],
    partition_by: list[str],
) -> None:
    """MERGE INTO on a partitioned table, touching ONLY the partitions that
    appear in ``new_rows`` (Iceberg dynamic-overwrite semantics; the seam
    where ``df.writeTo(tbl).overwritePartitions()`` plugs in). At 100 TB a
    one-partition upsert reads and rewrites one partition, not the table.

    Steps: (1) semi-join the existing table to the new rows' partition
    values — Catalyst prunes the scan to those directories; (2) anti-join
    out replaced keys, union the new rows; (3) write the merged affected
    partitions to a temp dir; (4) swap ONLY the partition dirs present in
    the temp output (Spark's own dir naming, so escaping/null partitions
    match exactly). Untouched partition directories are never read, never
    rewritten.
    """
    affected = new_rows.select(*partition_by).dropDuplicates(partition_by)
    existing = spark.read.parquet(str(p)).join(
        F.broadcast(affected), partition_by, "left_semi")
    keep = existing.join(
        new_rows.select(*key_cols).dropDuplicates(key_cols),
        key_cols, "left_anti",
    )
    merged = keep.unionByName(new_rows.select(*existing.columns))

    tmp = p.parent / f".{p.name}.tmp-{uuid.uuid4().hex[:8]}"
    write_table(merged, str(tmp), partition_by=partition_by)

    # leaf partition dirs in the temp output, e.g. "pred=uses/lang=en"
    depth = len(partition_by)
    pattern = "/".join(["*=*"] * depth)
    for tmp_leaf in sorted(tmp.glob(pattern)):
        rel = tmp_leaf.relative_to(tmp)
        live_leaf = p / rel
        live_leaf.parent.mkdir(parents=True, exist_ok=True)
        bak = live_leaf.parent / f".{live_leaf.name}.bak-{uuid.uuid4().hex[:8]}"
        if live_leaf.exists():
            live_leaf.rename(bak)
        tmp_leaf.rename(live_leaf)
        shutil.rmtree(bak, ignore_errors=True)
    shutil.rmtree(tmp, ignore_errors=True)


def delete_where(spark: SparkSession, path: str, condition) -> None:
    """Row-level delete (``DELETE FROM tbl WHERE ...`` — S8 semantics):
    rewrite the table without matching rows, atomic swap."""
    p = Path(path)
    if not p.exists():
        return
    # SQL DELETE removes only rows where the predicate is TRUE; rows where
    # it evaluates to NULL are KEPT (NOT NULL is NULL and would be filtered
    # out by a bare ~condition).
    remaining = spark.read.parquet(path).filter(
        ~F.coalesce(condition, F.lit(False)))
    tmp = str(p.parent / f".{p.name}.tmp-{uuid.uuid4().hex[:8]}")
    remaining.write.mode("overwrite").parquet(tmp)
    bak = str(p.parent / f".{p.name}.bak-{uuid.uuid4().hex[:8]}")
    p.rename(bak)
    Path(tmp).rename(p)
    shutil.rmtree(bak, ignore_errors=True)


def drain_batches(df, key_col: str, n_batches: int):
    """I5 paginated draining (``sync.py`` keyset pagination semantics):
    yield ``n_batches`` disjoint, collectively-exhaustive DataFrame slices
    of ``df``, each a predicate on the key — so every batch is an
    independent pushed-down scan, exactly like the reference's
    'start after last key, LIMIT n' drain loop but without a serial cursor.

    Numeric keys get true key-RANGE pages (approxQuantile bounds: each
    batch is a contiguous key interval, the keyset-pagination shape);
    non-numeric keys fall back to deterministic hash buckets
    (``pmod(xxhash64(key), n)`` — same stability guarantee, no ordering).
    Ranges are half-open ``(lo, hi]`` with the first batch left-unbounded,
    so rows are never duplicated or dropped regardless of bound ties.
    """
    dt = dict(df.dtypes)[key_col]
    numeric = dt in ("tinyint", "smallint", "int", "bigint",
                     "float", "double", "decimal")
    if numeric and n_batches > 1:
        qs = [i / n_batches for i in range(1, n_batches)]
        bounds = df.stat.approxQuantile(key_col, qs, 0.001)
        edges = [None] + bounds + [None]
        for i in range(n_batches):
            lo, hi = edges[i], edges[i + 1]
            cond = F.lit(True)
            if lo is not None:
                cond = cond & (F.col(key_col) > F.lit(lo))
            if hi is not None:
                cond = cond & (F.col(key_col) <= F.lit(hi))
            yield df.filter(cond)
    else:
        for i in range(n_batches):
            yield df.filter(
                F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_batches)) == i)
