"""Incremental KG maintenance (stage-2): fold new pages into an existing
canonical map + edge table WITHOUT re-extracting or re-pairing old pages.

Round-2 streaming covered stage-1 only (``streaming/kg_stream.py``); new
pages previously forced a full canonical-map recompute. This module keeps a
persistent state directory and applies the watermark-batch update the
north rule's resumable-pipeline contract implies:

  <state_dir>/raw/     (url, pred, confidence, subj_norm, obj_norm)
                       — batch=<id>/ partitions, exactly-once appends
  <state_dir>/buckets/ (squash, band, bh) persistent LSH bucket store over
                       DISTINCT SQUASHES — batch=<id>/ partitions; updates
                       hash NEW squashes only and read prior signatures
                       from here
  <state_dir>/pairs/   (a, b, band, bh) verified SQUASH alias pairs WITH
                       generating-bucket provenance, one row per bucket
                       that produced the pair; the CC input is the
                       distinct (a, b) of the rows whose bucket is still
                       under the cap ("live")
  <state_dir>/cmap/    (norm, canonical_id)
  <state_dir>/edges/   (subj, pred, obj, edge_key, confidence, url, support)

The LSH unit is the SQUASH (norm with spaces removed), NOT the norm —
mirroring ``canonicalize._distributed_norm_components`` (the full-rebuild
path) exactly: squash-identical norms cluster for free via the squash key
(no pairs needed, immune to the bucket cap), and bucket populations are
counted in DISTINCT SQUASHES, so the cap binds identically in both paths.
Keying by norm instead diverged at scale: a large squash-group inflated
norm-level bucket counts past the cap where the rebuild's squash-level
count stayed under it (800k-base bench, ~280 edge diffs).

``incremental_update``:
  1. extract triples from the NEW pages only (the expensive stage never
     re-runs on old pages);
  2. generate alias pairs TOUCHING a new squash via the bucket store
     (``touching_pairs_from_buckets`` + ``pair_scores``): only buckets
     containing a new squash self-join, shingles come from the squash
     string itself (no raw re-scan), and old-old pairs come from state;
  3. recompute connected components ONLY for affected components (old
     components adjacent to a new or liveness-flipped pair, plus the
     squashes of all new norms — a new norm can MERGE two previously
     separate components, and can lower its component's min-norm
     canonical id even when its squash is already known);
  4. rewrite ONLY the affected edge keys: rows whose norms changed
     canonical id (old components relabeled) plus the new rows — via a
     pred-partitioned ``upsert_by_key`` (only affected pred partitions are
     rewritten) + key-level delete for edges dissolved by a component
     merge (rare; rewrites the table, the price of MERGE without a real
     catalog).

INVARIANT (tested e2e + hash-verified by the ``i2_incremental_kg`` /
``s8_incremental_delete`` oracles): after any sequence of updates AND
deletes, the edge table is byte-identical to a full rebuild over the
surviving pages — INCLUDING when a bucket crosses the LSH cap between
operations (the round-5 800k-base bench caught exactly that divergence:
123 crossing buckets, 275/290 edge diffs). The pairs store keeps
per-bucket provenance and the component recompute filters pairs by
LIVENESS (>= 1 generating bucket still under the cap — a pure function
of the current bucket population, which a full rebuild computes the same
way). Under updates buckets only grow (a squash's minhash signature
never changes), so liveness only turns off and provenance recorded at
generation time is complete forever. ``incremental_delete`` is the one
operation that SHRINKS them: it removes vocabulary-departing squashes
from the store, prunes their pairs (a removed squash can be a
component's bridge), and re-pairs any bucket crossing the cap DOWNWARD
— the one case where a rebuild would emit pairs the store never
generated (they were over-cap at every prior batch).

Reference seams: ``nl_graph_materialize.py:366-387`` (onDuplicate=replace
idempotent load), ``sync.py:496-543`` (watermark + anti-join dedup of new
documents).
"""

from __future__ import annotations

import contextlib
import json
import os
import time
import uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.triples import raw_triples
from ..operators.canonicalize import (MAX_ALIAS_SQUASH_LEN,
                                      normalize_surface_col)
from ..operators.components import alternating_components
from ..operators.lsh import (cap_and_self_join, char_shingles, lsh_buckets,
                             pair_scores, touching_pairs_from_buckets)
from ..sources.io import (delete_by_key, recover_table, replace_table,
                          upsert_by_key, write_table)


_LSH = dict(num_hashes=16, bands=16, max_bucket_size=150)

_RAW_COLS = ["url", "pred", "confidence", "subj_norm", "obj_norm"]

_STORE_COLS = {"raw": _RAW_COLS, "buckets": ["squash", "band", "bh"],
               "crawl_ts": ["url", "warc_ts"]}
# batch-dir stores that append/compact/heal together. crawl_ts is a tiny
# (url, warc_ts) sidecar — one row per url per ingesting batch — consulted
# only by incremental_reingest's newer_only ordering guard (raw rows don't
# carry the crawl timestamp; storing it per-row would bloat every triple).
# Legacy states without the dir just skip the guard.
_BATCH_STORES = ("raw", "buckets", "crawl_ts")


class _StageClock:
    """Driver-side per-stage stopwatch. Segments are measured BETWEEN
    Spark actions (the update's eager checkpoints / table writes), so a
    segment's wall covers exactly the jobs that materialize that stage."""

    def __init__(self) -> None:
        self.secs: dict[str, float] = {}
        self._t = time.perf_counter()

    def mark(self, stage: str) -> None:
        now = time.perf_counter()
        self.secs[stage] = round(self.secs.get(stage, 0.0) + now - self._t, 3)
        self._t = now


def _emit_metrics(state_dir: str, batch_id, op: str,
                  secs: dict, rows: dict) -> dict:
    """Append one JSON line per stage to ``<state_dir>/metrics.jsonl`` —
    the north rule's per-stage throughput/lineage seam for the
    INCREMENTAL path (the batch pipeline's twin is
    ``persist.materialize_kg``, which writes parquet metrics rows). A
    line records (batch, op, stage, sec, rows). JSONL over parquet here
    deliberately: one tiny driver-side append per update instead of a
    small-parquet-file explosion across thousands of watermark batches,
    still trivially loadable (``spark.read.json``)."""
    stages = {st: {"sec": sec, "rows": rows.get(st)}
              for st, sec in secs.items()}
    with open(Path(state_dir) / "metrics.jsonl", "a") as f:
        for st, v in stages.items():
            f.write(json.dumps({"batch": str(batch_id), "op": op,
                                "stage": st, **v}) + "\n")
    return stages


# ---------------------------------------------------------------- meta
# <state_dir>/_meta.json is the tiny driver-side manifest (the stand-in
# for an Iceberg snapshot log): which batch ids COMMITTED end-to-end
# (exactly-once replay detection survives compaction) and which
# compaction records absorbed which batch dirs. Written atomically
# (tmp + os.replace); single-writer per state dir, ENFORCED by the
# _writer.lock O_EXCL file every mutating entry point takes.

class StateLockedError(RuntimeError):
    """Another writer holds the state directory's lock."""


@contextlib.contextmanager
def _state_lock(state_dir: str):
    """SINGLE-WRITER contract, made loud. The state stores commit via
    driver-side tmp+rename and a json manifest — safe against crashes,
    NOT against two concurrent updaters interleaving manifests. Every
    mutating entry point (init / update / compact) takes this O_EXCL
    lock file; a second writer fails immediately with StateLockedError
    instead of corrupting state silently.

    Staleness: the lock records the holder's pid; a lock whose pid is no
    longer alive (same host — the driver is one process even on a
    cluster) is broken and re-acquired. On a setup with drivers on
    DIFFERENT hosts this check cannot see the other driver — there you
    need a real catalog/storage lock (Iceberg's optimistic manifest
    commit); this file is the local stand-in.
    """
    Path(state_dir).mkdir(parents=True, exist_ok=True)
    lock = Path(state_dir) / "_writer.lock"
    for _attempt in (0, 1):
        try:
            fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            break
        except FileExistsError:
            try:
                pid = int(lock.read_text().strip() or "0")
            except (OSError, ValueError):
                pid = 0
            alive = False
            if pid > 0:
                try:
                    os.kill(pid, 0)
                    alive = True
                except ProcessLookupError:
                    alive = False
                except PermissionError:
                    alive = True
            if alive:
                raise StateLockedError(
                    f"{lock} held by live pid {pid}; the incremental KG "
                    f"state supports exactly one writer") from None
            lock.unlink(missing_ok=True)  # stale: holder died
    else:  # pragma: no cover - raced twice
        raise StateLockedError(f"could not acquire {lock}")
    try:
        os.write(fd, str(os.getpid()).encode())
        os.close(fd)
        yield
    finally:
        lock.unlink(missing_ok=True)


def _meta_path(state_dir: str) -> Path:
    return Path(state_dir) / "_meta.json"


def _load_meta(state_dir: str) -> dict:
    p = _meta_path(state_dir)
    if p.exists():
        return json.loads(p.read_text())
    return {"completed": [], "compactions": []}


def _save_meta(state_dir: str, meta: dict) -> None:
    p = _meta_path(state_dir)
    p.parent.mkdir(parents=True, exist_ok=True)
    tmp = p.parent / f".{p.name}.tmp-{uuid.uuid4().hex[:8]}"
    tmp.write_text(json.dumps(meta, indent=1))
    os.replace(tmp, p)


def _mark_completed(state_dir: str, meta: dict, batch_id: str) -> None:
    if batch_id not in meta["completed"]:
        meta["completed"].append(batch_id)
        _save_meta(state_dir, meta)


def _absorbed_ids(meta: dict, store: str) -> set:
    out: set = set()
    for rec in meta["compactions"]:
        out.update(rec.get(store, []))
    return out


def _heal_compactions(state_dir: str, meta: dict) -> None:
    """Idempotently finish every committed compaction record (the commit
    point is the manifest write): rename the staged combined dir in,
    delete the absorbed batch dirs, and sweep staged dirs whose
    compaction never committed. A crash at ANY point inside
    ``compact_state`` converges here on the next call — readers that go
    through ``incremental_update``/``compact_state`` never observe a
    store with both a compact batch and its absorbed sources visible."""
    recorded = {r["id"] for r in meta["compactions"]}
    for rec in meta["compactions"]:
        for store in _BATCH_STORES:
            absorbed = rec.get(store, [])
            if not absorbed:
                continue
            root = Path(state_dir) / store
            dest = root / f"batch={rec['id']}"
            tmp = root / f".compact-{rec['id']}.tmp"
            if not dest.exists() and tmp.exists():
                tmp.rename(dest)
            # delete absorbed dirs only once the combined data is live
            # (or was itself absorbed by a later compaction)
            if dest.exists() or rec["id"] in _absorbed_ids(meta, store):
                import shutil

                for aid in absorbed:
                    shutil.rmtree(root / f"batch={aid}",
                                  ignore_errors=True)
    for store in _BATCH_STORES:
        root = Path(state_dir) / store
        if not root.exists():
            continue
        for tmp in root.glob(".compact-*.tmp"):
            cid = tmp.name[len(".compact-"):-len(".tmp")]
            if cid not in recorded:
                import shutil

                shutil.rmtree(tmp, ignore_errors=True)


def compact_state(spark: SparkSession, state_dir: str,
                  min_batches: int = 2) -> dict:
    """Coalesce committed batch dirs into one baseline batch each; see
    ``_compact_state_locked``. Takes the single-writer lock."""
    with _state_lock(state_dir):
        return _compact_state_locked(spark, state_dir, min_batches)


def _compact_state_locked(spark: SparkSession, state_dir: str,
                          min_batches: int = 2) -> dict:
    """Coalesce committed ``raw/batch=*`` and ``buckets/batch=*`` dirs
    into ONE baseline batch each — the Iceberg-manifest-compaction
    stand-in that keeps thousands of watermark updates from becoming a
    small-file explosion (every ``_read_raw`` lists and footer-reads
    every batch dir).

    Exactly-once is preserved: only batches recorded COMPLETED in the
    manifest are absorbed (a crashed update's pending dir is left alone
    for its resume), absorbed ids stay in the manifest forever, and a
    replayed old batch id still short-circuits in ``incremental_update``
    even though its dir is gone. Crash-safe: combined data is staged to
    hidden ``.compact-<id>.tmp`` dirs (invisible to Spark partition
    discovery), the manifest append is the single commit point, and
    ``_heal_compactions`` finishes the rename+delete on the next call.

    Legacy states (created before the manifest existed) are migrated on
    first call by treating every current batch dir as completed — but
    ONLY if the state passes ``_state_complete`` (all four tables
    present): a legacy state abandoned mid-init has a raw batch whose
    rows never reached edges, and absorbing it as "committed" would bake
    the half-applied batch in forever. Such states raise instead."""
    meta_existed = _meta_path(state_dir).exists()
    meta = _load_meta(state_dir)
    _heal_compactions(state_dir, meta)
    rawroot = Path(state_dir) / "raw"
    if not meta_existed and rawroot.exists():
        if not _state_complete(state_dir):
            raise ValueError(
                f"compact_state: {state_dir} has no manifest and is "
                f"incomplete (a crashed pre-manifest init/update); finish "
                f"the build via incremental_update first, then compact")
        legacy = sorted(d.name.split("=", 1)[1]
                        for d in rawroot.glob("batch=*"))
        meta["completed"] = legacy
        _save_meta(state_dir, meta)
    extra = {"rebuild"} | {r["id"] for r in meta["compactions"]}
    cid = f"c-{uuid.uuid4().hex[:12]}"
    rec: dict = {"id": cid}
    stats: dict = {}
    for store in _BATCH_STORES:
        root = Path(state_dir) / store
        if not root.exists():
            continue
        dirs = {d.name.split("=", 1)[1] for d in root.glob("batch=*")}
        elig = sorted(dirs & (set(meta["completed"]) | extra))
        if len(elig) < min_batches:
            continue
        combined = spark.read.parquet(str(root)) \
            .filter(F.col("batch").cast("string").isin(elig)) \
            .select(*_STORE_COLS[store])
        if store == "crawl_ts":
            # a url re-crawled across absorbed batches keeps only its
            # newest timestamp — exactly what the ordering guard reads
            combined = combined.groupBy("url") \
                .agg(F.max("warc_ts").alias("warc_ts"))
        write_table(combined, str(root / f".compact-{cid}.tmp"))
        rec[store] = elig
        stats[f"{store}_batches_absorbed"] = len(elig)
    if len(rec) == 1:
        return {"compacted": False}
    meta["compactions"].append(rec)
    _save_meta(state_dir, meta)  # COMMIT
    _heal_compactions(state_dir, meta)
    return {"compacted": True, "id": cid, **stats}


def _read_raw(spark: SparkSession, state_dir: str) -> DataFrame:
    """The raw store is laid out as ``raw/batch=<id>/`` partitions (each
    appended with an atomic dir rename — exactly-once); project away the
    batch partition column."""
    return spark.read.parquet(f"{state_dir}/raw").select(*_RAW_COLS)


def _append_batch_dir(df: DataFrame, state_dir: str, sub: str,
                      batch_id: str,
                      absorbed: set | None = None) -> bool:
    """Append one batch under ``<state_dir>/<sub>/batch=<id>`` exactly
    once: write to a hidden tmp dir, then atomically rename it in.
    Returns False (no-op) if the batch dir already exists OR the id was
    absorbed by a compaction (its rows live inside a compact batch) —
    the crash-resume signal that this batch is already in the store."""
    root = Path(state_dir) / sub
    dest = root / f"batch={batch_id}"
    if dest.exists() or batch_id in (absorbed or ()):
        return False
    root.mkdir(parents=True, exist_ok=True)
    tmp = root / f".batch-{batch_id}.tmp-{uuid.uuid4().hex[:8]}"
    write_table(df, str(tmp))
    tmp.rename(dest)
    return True


def _append_raw_batch(spark: SparkSession, new_raw: DataFrame,
                      state_dir: str, batch_id: str,
                      absorbed: set | None = None) -> bool:
    return _append_batch_dir(new_raw.select(*_RAW_COLS), state_dir,
                             "raw", batch_id, absorbed=absorbed)


def _append_crawl_ts(spark: SparkSession, pages: DataFrame,
                     state_dir: str, batch_id: str, meta: dict) -> None:
    """Record the batch's per-url crawl timestamp in the ``crawl_ts``
    sidecar (one tiny row per url; max over in-batch duplicates). Fed by
    init/update/reingest; consulted only by ``incremental_reingest``'s
    newer_only ordering guard. Tolerates ts-less callers (legacy frames)
    — the guard simply has nothing to compare for those urls. Idempotent
    per batch id (same atomic-dir-rename machinery as raw).
    ``incremental_delete`` leaves sidecar entries in place: they are
    inert while the url is absent from raw (the guard only consults
    overlap urls), and they re-arm the guard at the historical max if
    the url is later re-added."""
    if "warc_ts" not in pages.columns:
        return
    _append_batch_dir(
        pages.select("url", "warc_ts").groupBy("url")
        .agg(F.max("warc_ts").alias("warc_ts")),
        state_dir, "crawl_ts", batch_id,
        absorbed=_absorbed_ids(meta, "crawl_ts"))


def _bucket_rows(norms: DataFrame) -> DataFrame:
    """(…, squash) -> (squash, band, bh) minhash-LSH bucket rows over the
    DISTINCT squashes — the unit the persistent bucket store accumulates
    (deterministic per squash, so store rows and freshly computed rows are
    interchangeable). One row per (squash, band): bucket populations are
    counted in distinct squashes, exactly like the full-rebuild path.
    Over-cap squashes (extraction garbage, see MAX_ALIAS_SQUASH_LEN) get
    NO bucket rows — same exclusion the rebuild applies — so they never
    generate candidates, never re-shingle, never count against caps."""
    squashes = norms.select("squash").dropDuplicates(["squash"]) \
        .filter(F.length("squash") <= MAX_ALIAS_SQUASH_LEN)
    return lsh_buckets(
        squashes, "squash", char_shingles(F.col("squash"), 3),
        num_hashes=_LSH["num_hashes"], bands=_LSH["bands"],
    ).select(F.col("_id").alias("squash"), "band", "bh")


def _norm_raw(pages: DataFrame) -> DataFrame:
    return raw_triples(pages).select(
        "url", "pred", "confidence",
        normalize_surface_col(F.col("subj")).alias("subj_norm"),
        normalize_surface_col(F.col("obj")).alias("obj_norm"),
    )


def _norms_of(raw: DataFrame) -> DataFrame:
    return (
        raw.select(F.explode(F.array("subj_norm", "obj_norm")).alias("norm"))
        .dropDuplicates(["norm"])
        .withColumn("squash", F.regexp_replace("norm", " ", ""))
        .filter(F.length("squash") > 0)
    )


def _cmap_from_pairs(norms: DataFrame, pairs: DataFrame) -> DataFrame:
    """(norm, squash) x squash-level pairs -> (norm, canonical_id), the
    exact label semantics of ``_distributed_norm_components``: CC runs
    over squashes, squash-identical norms share a component via the
    squash key itself (even with no pairs at all), and the canonical id
    is the lexicographically-smallest NORM in the component. ``pairs``
    may be provenance rows (a, b, band, bh) — one row per generating
    bucket; CC consumes the distinct pair set."""
    comp = alternating_components(
        pairs.select("a", "b").dropDuplicates(["a", "b"]), "a", "b")
    base = norms.select("norm", "squash")
    lab = (
        base.join(comp, base.squash == comp.node, "left")
        .select("norm",
                F.coalesce("component", F.col("squash")).alias("_comp"))
    )
    canon = lab.groupBy("_comp").agg(F.min("norm").alias("canonical_id"))
    return lab.join(canon, "_comp").select("norm", "canonical_id")


def _touching_rows(raw: DataFrame, norms: DataFrame) -> DataFrame:
    """Rows of ``raw`` whose subj_norm OR obj_norm is in ``norms`` — exact
    row partition (semi + anti∘semi), NEVER dropDuplicates: legitimately
    repeated raw rows must keep their multiplicity or recomputed support
    counts drift from a full rebuild."""
    sn = norms.withColumnRenamed("norm", "subj_norm")
    on = norms.withColumnRenamed("norm", "obj_norm")
    via_subj = raw.join(sn, "subj_norm", "left_semi")
    via_obj_only = raw.join(sn, "subj_norm", "left_anti") \
                      .join(on, "obj_norm", "left_semi")
    return via_subj.unionByName(via_obj_only)


def _edges_for(raw: DataFrame, cmap: DataFrame) -> DataFrame:
    """raw triples + canonical map -> aggregated edge rows (shared
    ``apply_canonical_map`` + ``distinct_edges`` contract)."""
    from .kg import apply_canonical_map, distinct_edges

    return distinct_edges(apply_canonical_map(raw, cmap))


def _contributor_rows(raw: DataFrame, key_edges: DataFrame,
                      cmap: DataFrame) -> DataFrame:
    """Prune ``raw`` to the rows that can contribute to one of
    ``key_edges``' keys under ``cmap`` — NEVER the whole corpus: a
    contributor of key (S, P, O) has canonical(subj_norm) = S, i.e.
    subj_norm is a norm of an affected subject component (or IS the
    canonical itself, the cmap-miss case), and likewise for obj. A
    semi-join superset is safe: groupBy aggregates per (subj, pred, obj)
    group are unaffected by other groups' rows, and the caller's
    edge_key semi-join drops the extras."""
    def norms_of_canon(canon_col: str) -> DataFrame:
        canons = key_edges.select(F.col(canon_col).alias("canonical_id")) \
            .dropDuplicates(["canonical_id"])
        return cmap.join(canons, "canonical_id", "left_semi") \
            .select("norm") \
            .unionByName(canons.select(F.col("canonical_id").alias("norm"))) \
            .dropDuplicates(["norm"])

    return raw \
        .join(norms_of_canon("subj").withColumnRenamed("norm", "subj_norm"),
              "subj_norm", "left_semi") \
        .join(norms_of_canon("obj").withColumnRenamed("norm", "obj_norm"),
              "obj_norm", "left_semi")


def _state_complete(state_dir: str) -> bool:
    """True when every state table committed (a crash mid-init leaves a
    raw/ dir without pairs/cmap/edges — that state must re-init, not take
    the update path and fail reading missing tables)."""
    return all(Path(state_dir, t).exists()
               for t in ("raw", "pairs", "cmap", "edges")) and \
        any(Path(state_dir, "raw").glob("batch=*"))


def init_state(spark: SparkSession, pages: DataFrame, state_dir: str,
               threshold: float = 0.8, batch_id: str = "init") -> None:
    """Full build of the state directory from an initial page batch.
    Idempotent under re-runs with the same ``batch_id`` (the append
    no-ops once committed; pairs/cmap swap atomically; the edge write is
    last), so a crashed init converges by re-running it. Takes the
    single-writer lock."""
    with _state_lock(state_dir):
        _init_state_locked(spark, pages, state_dir, threshold, batch_id)


def _init_state_locked(spark: SparkSession, pages: DataFrame,
                       state_dir: str, threshold: float = 0.8,
                       batch_id: str = "init") -> None:
    meta = _load_meta(state_dir)
    _heal_compactions(state_dir, meta)
    Path(state_dir, "raw").mkdir(parents=True, exist_ok=True)
    # sweep half-written append tmp dirs from a crashed previous attempt
    for tmp in Path(state_dir, "raw").glob(".batch-*.tmp-*"):
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
    clock = _StageClock()
    appended = _append_raw_batch(spark, _norm_raw(pages), state_dir,
                                 batch_id,
                                 absorbed=_absorbed_ids(meta, "raw"))
    _append_crawl_ts(spark, pages, state_dir, batch_id, meta)
    clock.mark("extract")
    batch_dir = Path(state_dir) / "raw" / f"batch={batch_id}"
    if not appended and batch_dir.exists():
        # the batch id is already in the store: legit idempotent resume
        # means SAME pages — verify (cheaply, by row count) instead of
        # silently dropping different pages under a reused id
        stored = spark.read.parquet(str(batch_dir)).count()
        fresh = _norm_raw(pages).count()
        if stored != fresh:
            raise ValueError(
                f"init_state: raw/batch={batch_id} already holds {stored} "
                f"rows but the given pages produce {fresh} — a batch id "
                f"was reused with different content; pass a fresh "
                f"batch_id (new pages are NOT silently dropped)")
    raw = _read_raw(spark, state_dir)
    norms = _norms_of(raw)
    # seed the persistent bucket store (updates extend it per batch and
    # never re-hash the full vocabulary)
    _append_batch_dir(_bucket_rows(norms), state_dir, "buckets", batch_id,
                      absorbed=_absorbed_ids(meta, "buckets"))
    clock.mark("hash")
    # verified SQUASH pairs WITH bucket provenance (a, b, band, bh): the
    # store keeps one row per generating bucket so later updates can
    # re-evaluate the cap as buckets grow (liveness = some generating
    # bucket still <= cap). Same deferred-dedup broadcast tail as
    # verified_pairs; all rows written here are live by construction
    # (cap_and_self_join already dropped over-cap buckets).
    keyed = norms.select("squash").dropDuplicates(["squash"]) \
        .filter(F.length("squash") <= MAX_ALIAS_SQUASH_LEN).select(
        F.col("squash").alias("_id"),
        char_shingles(F.col("squash"), 3).alias("sh")) \
        .filter(F.size("sh") > 0).localCheckpoint(eager=False)
    cand_prov = cap_and_self_join(
        lsh_buckets(keyed, "_id", "sh", num_hashes=_LSH["num_hashes"],
                    bands=_LSH["bands"]),
        _LSH["max_bucket_size"], distinct=False, keep_bucket=True)
    pairs = pair_scores(cand_prov, keyed, threshold, "containment",
                        pairs_distinct=False, keep_cols=("band", "bh")) \
        .select("a", "b", "band", "bh")
    replace_table(pairs, f"{state_dir}/pairs")
    clock.mark("verify")
    pairs = spark.read.parquet(f"{state_dir}/pairs")
    cmap = _cmap_from_pairs(norms, pairs)
    replace_table(cmap, f"{state_dir}/cmap")
    clock.mark("components")
    cmap = spark.read.parquet(f"{state_dir}/cmap")
    write_table(_edges_for(raw, cmap), f"{state_dir}/edges",
                partition_by=["pred"])
    clock.mark("edges")
    # the batch is now fully reflected in edges — record it so an
    # exactly-once replay short-circuits even after compaction removed
    # its batch dir
    _mark_completed(state_dir, meta, batch_id)
    clock.mark("commit")
    # counts from the written parquet: footer metadata, not recomputes
    _emit_metrics(state_dir, batch_id, "init", clock.secs, {
        "verify": pairs.count(),
        "components": cmap.count(),
        "edges": spark.read.parquet(f"{state_dir}/edges").count(),
    })


def incremental_update(spark: SparkSession, new_pages: DataFrame,
                       state_dir: str, threshold: float = 0.8,
                       batch_id: str | None = None,
                       compact_every_n_batches: int | None = 32) -> dict:
    """Fold ``new_pages`` into the state; returns update stats.

    ``batch_id`` makes the update EXACTLY-ONCE resumable: the raw append
    is an atomic ``raw/batch=<id>`` dir rename, so a crash anywhere in
    the update (before or after the edge upsert, before or after the
    append) converges on re-run with the same batch_id — the batch's rows
    are counted once whether they sit in the store or in ``new_pages``.
    Without a batch_id, re-running the same batch double-counts (the
    caller owns dedup, e.g. via the watermark manifest).

    AUTO-COMPACTION: once the raw store holds
    ``compact_every_n_batches`` batch dirs (default 32), the update ends
    by compacting them into one baseline batch, so an unattended
    thousand-update stream keeps O(1) dirs without anyone remembering to
    call ``compact_state``. Pass ``None`` to disable (callers that
    schedule compaction themselves). The compaction is a separate commit
    AFTER this batch's completed-marker — a crash between the two leaves
    a committed update and a no-op'd compaction, nothing half-done.

    Takes the single-writer lock for the whole update (two concurrent
    updaters raise StateLockedError instead of interleaving manifests).
    """
    with _state_lock(state_dir):
        stats = _incremental_update_locked(spark, new_pages, state_dir,
                                           threshold, batch_id)
        if compact_every_n_batches is not None and not stats.get("replayed"):
            n_dirs = len(list(
                (Path(state_dir) / "raw").glob("batch=*")))
            if n_dirs >= compact_every_n_batches:
                stats["compaction"] = _compact_state_locked(
                    spark, state_dir, min_batches=2)
        return stats


def _incremental_update_locked(spark: SparkSession, new_pages: DataFrame,
                               state_dir: str, threshold: float = 0.8,
                               batch_id: str | None = None) -> dict:
    # heal any crash window from a previous run's atomic swaps AND any
    # half-applied compaction BEFORE deciding the path (a restored
    # pairs/cmap flips the state complete; an unfinished compaction
    # could double-expose absorbed batch dirs)
    meta = _load_meta(state_dir)
    _heal_compactions(state_dir, meta)
    recover_table(f"{state_dir}/pairs")
    recover_table(f"{state_dir}/cmap")
    if not _state_complete(state_dir):
        # fresh state OR a crashed init: (re-)run the full build under the
        # CALLER'S batch id, so a later resume of this same batch is
        # recognized by the append's batch=<id> marker instead of being
        # double-counted under a second id. A caller-less init gets a
        # UNIQUE id — a fixed "init" id could collide with a half-built
        # raw/batch=init left by a crashed earlier init with DIFFERENT
        # pages, silently dropping the new pages (ADVICE r3).
        _init_state_locked(spark, new_pages, state_dir, threshold,
                           batch_id=batch_id or
                           f"init-{uuid.uuid4().hex[:12]}")
        n = spark.read.parquet(f"{state_dir}/edges").count()
        return {"initialized": True, "edges": n}
    if batch_id is not None and batch_id in meta["completed"]:
        # exactly-once replay of a FULLY COMMITTED batch: the state
        # already reflects it (its dir may have been compacted away, so
        # the dir-based resume below can't run) — converged, no-op
        return {"initialized": False, "replayed": True,
                "edges": spark.read.parquet(f"{state_dir}/edges").count()}
    cur_batch = batch_id or f"b-{uuid.uuid4().hex[:12]}"
    clock = _StageClock()
    new_raw = _norm_raw(new_pages).localCheckpoint(eager=True)
    clock.mark("extract")
    already_appended = (
        batch_id is not None
        and (Path(state_dir) / "raw" / f"batch={batch_id}").exists())
    old_raw = _read_raw(spark, state_dir)
    if already_appended:
        # crash-resume: the batch is in the store; exclude it from the
        # "old" side so the recompute sees each row exactly once. The
        # batch partition column is compared AS STRING: Hive inference
        # types an all-numeric id set as int, and an int-vs-string
        # comparison would NULL out and drop every row (ADVICE r3).
        old_raw = spark.read.parquet(f"{state_dir}/raw") \
            .filter(F.col("batch").cast("string") != F.lit(str(batch_id))) \
            .select(*_RAW_COLS)
    old_pairs = spark.read.parquet(f"{state_dir}/pairs")
    if "band" not in old_pairs.columns:
        raise ValueError(
            f"{state_dir}/pairs lacks bucket provenance (band, bh) — a "
            f"state built by a pre-provenance version. Its pairs cannot "
            f"be re-evaluated against the cap as buckets grow (the "
            f"incremental == full-rebuild invariant needs that); rebuild "
            f"the state with init_state over the full corpus once.")
    old_cmap = spark.read.parquet(f"{state_dir}/cmap")

    # 2. alias pairs touching a NEW squash, generated from the PERSISTENT
    # bucket store: minhash signatures are computed for squashes never
    # seen before ONLY — the store carries every previous batch's bucket
    # rows, so an update is O(new vocab + touched buckets), never a
    # full-vocabulary re-hash. Old-old pairs come from state. A new norm
    # whose squash is already stored adds NOTHING to the bucket
    # population (populations count distinct squashes, like the rebuild),
    # so it can neither create pairs nor flip liveness — it only joins
    # its squash's component and competes in the min-norm relabel.
    new_norms = _norms_of(new_raw) \
        .join(old_cmap.select("norm"), "norm", "left_anti") \
        .localCheckpoint(eager=True)
    clock.mark("norms")
    bdir = Path(state_dir) / "buckets"
    if not bdir.exists() or not any(bdir.glob("batch=*")):
        # pre-bucket-store state: one-time rebuild of the old vocabulary
        _append_batch_dir(_bucket_rows(_norms_of(old_raw)), state_dir,
                          "buckets", "rebuild")
    store_raw = spark.read.parquet(str(bdir))
    if "squash" not in store_raw.columns:
        raise ValueError(
            f"{state_dir}/buckets is keyed by norm — a state built by a "
            f"pre-squash-level version. Its bucket populations and pairs "
            f"use different cap semantics than the full rebuild (the "
            f"incremental == full-rebuild invariant needs squash-level "
            f"counts); rebuild the state with init_state over the full "
            f"corpus once.")
    store_old = store_raw \
        .filter(F.col("batch").cast("string") != F.lit(str(cur_batch))) \
        .select("squash", "band", "bh")
    new_squashes = new_norms.select("squash").dropDuplicates(["squash"]) \
        .join(store_old.select("squash"), "squash", "left_anti") \
        .localCheckpoint(eager=True)
    new_bk = _bucket_rows(new_squashes).localCheckpoint(eager=True)
    clock.mark("hash")
    all_bk = store_old.unionByName(new_bk) \
        .select(F.col("squash").alias("_id"), "band", "bh")
    cand = touching_pairs_from_buckets(
        all_bk, new_squashes.select(F.col("squash").alias("_id")),
        _LSH["max_bucket_size"], keep_bucket=True)
    # verify shingles come from the squash STRING itself — no raw
    # re-scan; only squashes involved in a candidate pair re-shingle
    involved = cand.select(F.explode(F.array("a", "b")).alias("squash")) \
                   .dropDuplicates(["squash"])
    keyed = (
        involved
        .select(F.col("squash").alias("_id"),
                char_shingles(F.col("squash"), 3).alias("sh"))
        .filter(F.size("sh") > 0)
        .localCheckpoint(eager=False)
    )
    # verified rows keep their generating (band, bh) — the pairs store is
    # provenance rows, so the cap can be re-evaluated as buckets grow
    touching_prov = pair_scores(cand, keyed, threshold, "containment",
                                keep_cols=("band", "bh")) \
        .select("a", "b", "band", "bh")
    if not (bdir / f"batch={cur_batch}").exists():
        _append_batch_dir(new_bk, state_dir, "buckets", cur_batch)
    merged_pairs = old_pairs.unionByName(touching_prov) \
        .dropDuplicates(["a", "b", "band", "bh"]).localCheckpoint(eager=True)
    clock.mark("verify")
    touching = touching_prov.select("a", "b").dropDuplicates(["a", "b"])

    # CAP CROSSINGS: a touched bucket whose population (distinct
    # squashes) crosses max_bucket_size with this batch would contribute
    # NO pairs in a full rebuild — its previously generated pairs must
    # lose that bucket's support (they stay alive only via some other
    # still-under-cap bucket). Only touched buckets change size, so the
    # scan is O(touched bucket contents); buckets only ever grow
    # (squashes are never removed), so a bucket that crossed never comes
    # back.
    cap = _LSH["max_bucket_size"]
    touched_keys = new_bk.select("band", "bh").dropDuplicates(["band", "bh"])
    n_before = store_old.join(touched_keys, ["band", "bh"], "left_semi") \
        .groupBy("band", "bh").agg(F.count("*").alias("n_before"))
    n_add = new_bk.groupBy("band", "bh").agg(F.count("*").alias("n_add"))
    crossing = (
        n_add.join(n_before, ["band", "bh"], "left")
        .fillna(0, subset=["n_before"])
        .filter((F.col("n_before") <= cap)
                & (F.col("n_before") + F.col("n_add") > cap))
        .select("band", "bh")
    )
    # pairs whose liveness may have flipped: their components need the
    # same recompute a new pair triggers
    dimmed = old_pairs.join(crossing, ["band", "bh"], "left_semi") \
        .select("a", "b").dropDuplicates(["a", "b"])

    # 3. recompute ONLY affected components: old components adjacent to a
    # new pair OR a liveness-flipped pair (either endpoint — live pairs
    # never span components), plus the components of every new norm's
    # squash (a new norm can lower its component's min-norm canonical id
    # even when its squash — and therefore the pair set — is unchanged).
    # squash -> old component is derivable from cmap alone: squash is a
    # pure function of norm, and squash-identical norms always share a
    # component, so any norm of the squash witnesses its canonical id.
    old_sq_cmap = old_cmap.select(
        F.regexp_replace("norm", " ", "").alias("squash"), "canonical_id") \
        .dropDuplicates(["squash"])
    ids_of_new_pairs = touching.unionByName(dimmed).select(
        F.explode(F.array("a", "b")).alias("squash")) \
        .unionByName(new_norms.select("squash")) \
        .dropDuplicates(["squash"])
    affected_ids = old_sq_cmap.join(ids_of_new_pairs, "squash", "left_semi") \
        .select("canonical_id").dropDuplicates(["canonical_id"])
    affected_old = old_cmap.join(affected_ids, "canonical_id", "left_semi") \
        .select("norm",
                F.regexp_replace("norm", " ", "").alias("squash"))
    sub_norms = affected_old.unionByName(new_norms.select("norm", "squash")) \
        .dropDuplicates(["norm"]).localCheckpoint(eager=True)
    clock.mark("scope")
    sub_squashes = sub_norms.select("squash").dropDuplicates(["squash"])
    sub_prov = merged_pairs.join(
        sub_squashes.withColumnRenamed("squash", "a"), "a", "left_semi")
    # LIVENESS: a pair feeds CC only while >= 1 of its generating buckets
    # is still under the cap — exactly the pairs a full rebuild over the
    # CURRENT bucket population would generate. Sizes are computed for
    # the referenced buckets only (O(referenced bucket contents)).
    ref_keys = sub_prov.select("band", "bh").dropDuplicates(["band", "bh"])
    live_keys = (
        all_bk.join(ref_keys, ["band", "bh"], "left_semi")
        .groupBy("band", "bh").agg(F.count("*").alias("_n"))
        .filter(F.col("_n") <= cap)
        .select("band", "bh")
    )
    sub_pairs = sub_prov.join(live_keys, ["band", "bh"], "left_semi") \
        .select("a", "b").dropDuplicates(["a", "b"])
    sub_cmap = _cmap_from_pairs(sub_norms, sub_pairs)

    new_cmap = (
        old_cmap.join(sub_norms, "norm", "left_anti")
        .unionByName(sub_cmap)
        .localCheckpoint(eager=True)
    )
    clock.mark("components")

    # 4. rewrite only affected edge keys: rows touching a norm whose
    # canonical changed (old relabeled components) or a new norm, plus
    # every row mapping onto one of those NEW keys (support must count
    # ALL contributors)
    changed = (
        old_cmap.withColumnRenamed("canonical_id", "_old")
        .join(new_cmap.withColumnRenamed("canonical_id", "_new"), "norm")
        .filter(~F.col("_old").eqNullSafe(F.col("_new")))
        .select("norm")
        .unionByName(new_norms.select("norm"))
        .dropDuplicates(["norm"])
        .localCheckpoint(eager=True)
    )
    all_raw = old_raw.unionByName(new_raw)
    touching_rows = _touching_rows

    # key sources: rows touching a relabeled norm PLUS every new raw row —
    # a new row over entirely-old norms still increments the support of an
    # existing edge key, so that key must be re-aggregated too. The OLD-map
    # edges of the same trigger rows ride along as recompute candidates:
    # when a cap-crossing SPLITS a component, part of it keeps the old
    # label, and an old key whose trigger contributors relabeled away may
    # STILL be derivable from its label-stable remaining contributors —
    # without the old edges in the candidate set that key would never be
    # recomputed and would be wrongly classified dead (the 800k delete
    # bench caught exactly this shape on the delete path).
    key_source = touching_rows(all_raw, changed).unionByName(new_raw)
    old_edges = _edges_for(touching_rows(old_raw, changed), old_cmap) \
        .localCheckpoint(eager=True)
    key_edges = _edges_for(key_source, new_cmap).unionByName(old_edges) \
        .localCheckpoint(eager=True)
    scope_keys = key_edges.select("edge_key").dropDuplicates(["edge_key"])
    # recompute those keys over ALL their contributor rows (support counts
    # every contributor) — but never over the whole corpus: the semi-join
    # pruning keeps this stage O(affected rows), not O(corpus). Every key
    # in scope_keys is FULLY covered: aff_rows pulls all rows whose norms
    # map (under the NEW cmap) into any scoped key's subj/obj canonical,
    # so recomputed values equal a full rebuild's for those keys.
    aff_rows = _contributor_rows(all_raw, key_edges, new_cmap)
    recomputed = _edges_for(aff_rows, new_cmap) \
        .join(scope_keys, "edge_key", "left_semi") \
        .localCheckpoint(eager=True)

    # old keys derived from the same rows under the OLD map that no longer
    # exist must be deleted (a merge relabels subj/obj -> new edge_key)
    old_keys = old_edges.select("edge_key").dropDuplicates(["edge_key"])
    # dead keys stay a DATAFRAME end-to-end: a large component merge (the
    # boilerplate-anchor storm SURVEY §7.4.3 warns about) can relabel many
    # norms at once, and a driver collect + isin literal list would blow
    # the driver/plan exactly then (VERDICT r3 #1). Anti against the
    # RECOMPUTED keys (like the delete path): an old key still derivable
    # from label-stable contributors was recomputed above and must live
    dead = old_keys.join(
        recomputed.select("edge_key").dropDuplicates(["edge_key"]),
        "edge_key", "left_anti").localCheckpoint(eager=True)
    n_dead = dead.count()
    n_recomputed = recomputed.count()
    # delete + upsert folded into ONE partition-scoped table pass (the
    # dead keys ride the same anti-join). The key-match joins broadcast
    # only when the MEASURED key count is small (sha256 keys are ~100 B a
    # row, so 500k keys ≈ 50 MB — a safe driver envelope); a component-
    # merge storm's arbitrarily large key set falls back to shuffle joins
    upsert_by_key(spark, recomputed, f"{state_dir}/edges", ["edge_key"],
                  partition_by=["pred"],
                  delete_keys=dead if n_dead else None,
                  broadcast_keys=(n_recomputed + n_dead) <= 500_000)
    clock.mark("edges")

    # persist the grown state (atomic batch append under the SAME id the
    # bucket append used; atomic swaps for pairs/cmap)
    if not already_appended:
        _append_raw_batch(spark, new_raw, state_dir, cur_batch)
    # outside the guard: a crash between the raw append and this line
    # resumes with already_appended=True and must still record the ts
    _append_crawl_ts(spark, new_pages, state_dir, cur_batch, meta)
    # ATOMIC swaps (write-tmp + rename), never a bare overwrite: a crash
    # mid-write must leave the OLD pairs/cmap readable — losing old-old
    # pairs would split components forever (touching-pair generation
    # never regenerates them)
    replace_table(merged_pairs, f"{state_dir}/pairs")
    replace_table(new_cmap, f"{state_dir}/cmap")
    # LAST: the completed marker — everything above is idempotent, so a
    # crash before this line resumes via the batch-dir path, and a crash
    # after it short-circuits as a replay
    _mark_completed(state_dir, meta, cur_batch)
    clock.mark("commit")
    # row counts AFTER the stopwatch: every frame below is an eager
    # checkpoint, so these are block-scan counts, not recomputes
    stages = _emit_metrics(state_dir, cur_batch, "update", clock.secs, {
        "extract": new_raw.count(),
        "norms": new_norms.count(),
        "hash": new_bk.count(),
        "verify": merged_pairs.count(),
        "scope": sub_norms.count(),
        "components": new_cmap.count(),
        "edges": n_recomputed,
    })
    return {
        "initialized": False,
        "new_norms": new_norms.count(),
        "changed_norms": changed.count(),
        "edges_rewritten": n_recomputed,
        "edges_deleted": n_dead,
        "stages": stages,
    }


def incremental_delete(spark: SparkSession, urls, state_dir: str,
                       threshold: float = 0.8,
                       delete_id: str | None = None) -> dict:
    """PURGE every triple contributed by ``urls`` from the standing state —
    the incremental twin of the per-doc purge (S8, reference
    ``nl_graph_materialize.py``'s delete-on-reingest seam) with the SAME
    invariant as ``incremental_update``: after the delete, the edge table
    is byte-identical to a full rebuild over the remaining pages.

    Deletion is the HARD direction for the LSH state, because the
    vocabulary can SHRINK — three effects a naive raw-purge misses:

    - a squash left with no surviving norm leaves the vocabulary: its
      bucket rows disappear, pairs with it as an endpoint must stop
      feeding CC (a removed squash can be the BRIDGE of a component — the
      component must split exactly like a rebuild without it), and its
      components' min-norm canonical may change;
    - bucket populations only shrink, so a bucket can cross the cap
      DOWNWARD: a rebuild over the remaining corpus WOULD pair its
      members, but the store never generated those pairs (they were
      over-cap at every previous batch) — crossing buckets re-pair their
      CURRENT membership and the verified pairs merge into the store
      (previously stored-but-dimmed pairs re-light via the same rows);
    - edge keys lose contributors: support re-aggregates for every key a
      removed row contributed to, and keys with no remaining contributor
      are deleted (folded into the same partition-scoped table pass).

    EXACTLY-ONCE: pass a ``delete_id`` — a completed delete replays as a
    no-op, and a crashed one converges on re-run: the removed rows are
    STAGED (atomic rename) before the raw purge starts, so a re-run after
    a partial purge still sees the full removed set; the raw purge,
    bucket purge, and edge upsert are idempotent; pairs/cmap swap
    atomically AFTER the edge fix; the completed marker is last.

    ``urls`` is a DataFrame with a ``url`` column or an iterable of url
    strings. Deleting the ENTIRE corpus raises — remove the state dir
    instead (an empty state has no readable tables).
    """
    with _state_lock(state_dir):
        return _incremental_delete_locked(spark, urls, state_dir,
                                          threshold, delete_id)


def _incremental_delete_locked(spark: SparkSession, urls, state_dir: str,
                               threshold: float,
                               delete_id: str | None) -> dict:
    import shutil

    meta = _load_meta(state_dir)
    _heal_compactions(state_dir, meta)
    recover_table(f"{state_dir}/pairs")
    recover_table(f"{state_dir}/cmap")
    if not _state_complete(state_dir):
        raise ValueError(
            f"incremental_delete: {state_dir} is not a complete state "
            f"(crashed init?); finish the build via incremental_update "
            f"before deleting")
    if delete_id is not None and delete_id in meta["completed"]:
        return {"replayed": True,
                "edges": spark.read.parquet(f"{state_dir}/edges").count()}
    del_id = delete_id or f"del-{uuid.uuid4().hex[:12]}"
    clock = _StageClock()
    if isinstance(urls, DataFrame):
        urls_df = urls.select("url").dropDuplicates(["url"])
    else:
        urls_df = spark.createDataFrame([(u,) for u in urls],
                                        "url string") \
            .dropDuplicates(["url"])
    urls_df = urls_df.localCheckpoint(eager=True)

    # STAGE the removed rows FIRST (atomic rename): the raw purge below is
    # per-partition — a crash mid-purge loses the purged rows from the
    # store, and a re-run must still see the FULL removed set to scope the
    # vocabulary/pair/edge fixes
    stage = Path(state_dir) / f"_del-{del_id}"
    removed_path = stage / "removed"
    if not removed_path.exists():
        stage.mkdir(parents=True, exist_ok=True)
        tmp = stage / f".removed.tmp-{uuid.uuid4().hex[:8]}"
        write_table(_read_raw(spark, state_dir)
                    .join(urls_df, "url", "left_semi"), str(tmp))
        tmp.rename(removed_path)
    removed = spark.read.parquet(str(removed_path)) \
        .localCheckpoint(eager=True)
    n_removed = removed.count()
    clock.mark("stage")
    if n_removed == 0:
        if delete_id is not None:
            _mark_completed(state_dir, meta, del_id)
        shutil.rmtree(stage, ignore_errors=True)
        return {"deleted_rows": 0, "replayed": False,
                "edges": spark.read.parquet(f"{state_dir}/edges").count()}

    # refuse BEFORE purging anything: an emptied store has no readable
    # tables (and destroying data before raising would strand the state)
    if _read_raw(spark, state_dir).join(urls_df, "url", "left_anti") \
            .isEmpty():
        raise ValueError(
            f"incremental_delete: removing these urls empties "
            f"{state_dir}; delete the state directory instead")
    # purge the raw store (idempotent per-batch-partition swaps; only
    # batch dirs holding a removed url are rewritten)
    delete_by_key(spark, f"{state_dir}/raw", urls_df, ["url"],
                  partition_by=["batch"], broadcast_keys=True)
    remaining = _read_raw(spark, state_dir)
    clock.mark("purge")

    old_pairs = spark.read.parquet(f"{state_dir}/pairs")
    if "band" not in old_pairs.columns:
        raise ValueError(
            f"{state_dir}/pairs lacks bucket provenance (band, bh); "
            f"rebuild the state with init_state once before deleting")
    old_cmap = spark.read.parquet(f"{state_dir}/cmap")
    store_raw = spark.read.parquet(f"{state_dir}/buckets")
    if "squash" not in store_raw.columns:
        raise ValueError(
            f"{state_dir}/buckets is keyed by norm (pre-squash-level "
            f"state); rebuild the state with init_state once before "
            f"deleting")
    store_rows = store_raw.select("squash", "band", "bh")
    cap = _LSH["max_bucket_size"]

    # norms that leave the vocabulary: candidates are the removed rows'
    # norms (small); a candidate survives iff some REMAINING row still
    # uses it (column-pruned corpus scan, semi-joined to the candidates)
    cand_norms = _norms_of(removed)
    present = remaining \
        .select(F.explode(F.array("subj_norm", "obj_norm")).alias("norm")) \
        .join(cand_norms.select("norm"), "norm", "left_semi") \
        .dropDuplicates(["norm"])
    removed_norms = cand_norms.join(present, "norm", "left_anti") \
        .localCheckpoint(eager=True)
    # squashes that leave: no surviving norm squashes to them (cmap holds
    # the full pre-delete vocabulary, so the check is vocab-sized)
    cand_sq = removed_norms.select("squash").dropDuplicates(["squash"])
    surviving_sq = (
        old_cmap.select(
            F.regexp_replace("norm", " ", "").alias("squash"), "norm")
        .join(cand_sq, "squash", "left_semi")
        .join(removed_norms.select("norm"), "norm", "left_anti")
        .select("squash").dropDuplicates(["squash"])
    )
    removed_sq = cand_sq.join(surviving_sq, "squash", "left_anti") \
        .localCheckpoint(eager=True)
    clock.mark("norms")

    # DOWNWARD cap crossings: a bucket losing a removed squash whose
    # population drops from > cap to <= cap would pair its members in a
    # rebuild — but the store never generated those pairs. Re-pair the
    # bucket's CURRENT membership (<= cap rows each, O(touched buckets)).
    dead_bk = store_rows.join(removed_sq, "squash", "left_semi")
    pop_gone = dead_bk.groupBy("band", "bh").agg(F.count("*").alias("_ng"))
    touched = dead_bk.select("band", "bh").dropDuplicates(["band", "bh"])
    pop_before = store_rows.join(touched, ["band", "bh"], "left_semi") \
        .groupBy("band", "bh").agg(F.count("*").alias("_nb"))
    crossing = (
        pop_before.join(pop_gone, ["band", "bh"])
        .filter((F.col("_nb") > cap) & (F.col("_nb") - F.col("_ng") <= cap))
        .select("band", "bh")
    )
    cur_store = store_rows.join(removed_sq, "squash", "left_anti")
    members = cur_store.join(crossing, ["band", "bh"], "left_semi") \
        .select(F.col("squash").alias("_id"), "band", "bh")
    cand_pairs = cap_and_self_join(members, cap, distinct=False,
                                   keep_bucket=True)
    involved = cand_pairs \
        .select(F.explode(F.array("a", "b")).alias("squash")) \
        .dropDuplicates(["squash"])
    keyed = involved.select(
        F.col("squash").alias("_id"),
        char_shingles(F.col("squash"), 3).alias("sh")) \
        .filter(F.size("sh") > 0).localCheckpoint(eager=False)
    regen = pair_scores(cand_pairs, keyed, threshold, "containment",
                        keep_cols=("band", "bh")) \
        .select("a", "b", "band", "bh")
    # pairs with a removed endpoint leave the store PERMANENTLY (a removed
    # squash may be the bridge of a component — keeping the pair would
    # keep the component merged where a rebuild splits it)
    pruned_pairs = old_pairs \
        .join(removed_sq.withColumnRenamed("squash", "a"), "a",
              "left_anti") \
        .join(removed_sq.withColumnRenamed("squash", "b"), "b",
              "left_anti")
    merged_pairs = pruned_pairs.unionByName(regen) \
        .dropDuplicates(["a", "b", "band", "bh"]).localCheckpoint(eager=True)
    clock.mark("verify")

    # affected components: every removed norm's squash (splits, min-norm
    # relabels) + every re-paired squash (downward crossings can MERGE).
    # Live pairs never span components, so pulling whole components into
    # scope keeps the sub-recompute's min-norm labels globally correct.
    old_sq_cmap = old_cmap.select(
        F.regexp_replace("norm", " ", "").alias("squash"), "canonical_id") \
        .dropDuplicates(["squash"])
    seed_sq = removed_norms.select("squash") \
        .unionByName(regen.select(F.explode(F.array("a", "b"))
                                  .alias("squash"))) \
        .dropDuplicates(["squash"])
    affected_ids = old_sq_cmap.join(seed_sq, "squash", "left_semi") \
        .select("canonical_id").dropDuplicates(["canonical_id"])
    affected_members = old_cmap \
        .join(affected_ids, "canonical_id", "left_semi").select("norm") \
        .localCheckpoint(eager=True)
    sub_norms = affected_members \
        .join(removed_norms.select("norm"), "norm", "left_anti") \
        .select("norm", F.regexp_replace("norm", " ", "").alias("squash")) \
        .localCheckpoint(eager=True)
    clock.mark("scope")

    sub_squashes = sub_norms.select("squash").dropDuplicates(["squash"])
    sub_prov = merged_pairs.join(
        sub_squashes.withColumnRenamed("squash", "a"), "a", "left_semi")
    ref_keys = sub_prov.select("band", "bh").dropDuplicates(["band", "bh"])
    # liveness against the POST-delete population (the bucket-store purge
    # happens later in the commit order; subtract at the DataFrame level)
    live_keys = (
        cur_store.join(ref_keys, ["band", "bh"], "left_semi")
        .groupBy("band", "bh").agg(F.count("*").alias("_n"))
        .filter(F.col("_n") <= cap)
        .select("band", "bh")
    )
    sub_pairs = sub_prov.join(live_keys, ["band", "bh"], "left_semi") \
        .select("a", "b").dropDuplicates(["a", "b"])
    sub_cmap = _cmap_from_pairs(sub_norms, sub_pairs)
    new_cmap = old_cmap.join(affected_members, "norm", "left_anti") \
        .unionByName(sub_cmap).localCheckpoint(eager=True)
    clock.mark("components")

    # edge fix: keys whose support changed = keys of rows touching a
    # relabeled norm (new map) + keys the removed rows contributed to
    # (their remaining contributors re-aggregate; keys with none die)
    changed = (
        old_cmap.withColumnRenamed("canonical_id", "_old")
        .join(new_cmap.withColumnRenamed("canonical_id", "_new"), "norm")
        .filter(~F.col("_old").eqNullSafe(F.col("_new")))
        .select("norm").localCheckpoint(eager=True)
    )
    # candidate OLD edges: same source rows under the OLD map (the removed
    # rows existed then). These ride in the recompute candidate set too:
    # a removal can SPLIT a component so that the trigger contributors of
    # an old key relabel away while its label-stable REMAINING
    # contributors still derive it — without the old edges as candidates
    # that key is never recomputed and gets wrongly deleted (caught by
    # the 800k delete bench: 50 missing edges, all in one split
    # component's stable half).
    old_edges = _edges_for(
        _touching_rows(remaining, changed).unionByName(removed), old_cmap) \
        .localCheckpoint(eager=True)
    key_edges = _edges_for(_touching_rows(remaining, changed), new_cmap) \
        .unionByName(_edges_for(removed, new_cmap)) \
        .unionByName(old_edges) \
        .localCheckpoint(eager=True)
    scope_keys = key_edges.select("edge_key").dropDuplicates(["edge_key"])
    aff_rows = _contributor_rows(remaining, key_edges, new_cmap)
    recomputed = _edges_for(aff_rows, new_cmap) \
        .join(scope_keys, "edge_key", "left_semi") \
        .localCheckpoint(eager=True)
    # dead = old candidates the recompute did NOT produce — anti against
    # the RECOMPUTED key set, not the candidate set: a key whose every
    # contributor was removed has no recomputed row at all
    old_keys = old_edges.select("edge_key").dropDuplicates(["edge_key"])
    rec_keys = recomputed.select("edge_key").dropDuplicates(["edge_key"])
    dead = old_keys.join(rec_keys, "edge_key", "left_anti") \
        .localCheckpoint(eager=True)
    n_dead = dead.count()
    n_recomputed = recomputed.count()
    upsert_by_key(spark, recomputed, f"{state_dir}/edges", ["edge_key"],
                  partition_by=["pred"],
                  delete_keys=dead if n_dead else None,
                  broadcast_keys=(n_recomputed + n_dead) <= 500_000)
    clock.mark("edges")

    # commit: pairs/cmap swap AFTER the edge fix (a crash in between
    # re-runs the whole delete against the OLD maps — the edge upsert is
    # idempotent), bucket purge after the swaps (crossing detection and
    # liveness already used post-delete populations), marker last
    replace_table(merged_pairs, f"{state_dir}/pairs")
    replace_table(new_cmap, f"{state_dir}/cmap")
    delete_by_key(spark, f"{state_dir}/buckets", removed_sq, ["squash"],
                  partition_by=["batch"], broadcast_keys=True)
    _mark_completed(state_dir, meta, del_id)
    shutil.rmtree(stage, ignore_errors=True)
    clock.mark("commit")
    stages = _emit_metrics(state_dir, del_id, "delete", clock.secs, {
        "stage": n_removed,
        "norms": removed_norms.count(),
        "verify": merged_pairs.count(),
        "scope": sub_norms.count(),
        "components": new_cmap.count(),
        "edges": n_recomputed,
    })
    return {
        "replayed": False,
        "deleted_rows": n_removed,
        "removed_norms": removed_norms.count(),
        "removed_squashes": removed_sq.count(),
        "changed_norms": changed.count(),
        "edges_rewritten": n_recomputed,
        "edges_deleted": n_dead,
        "stages": stages,
    }


def incremental_reingest(spark: SparkSession, pages: DataFrame,
                         state_dir: str, threshold: float = 0.8,
                         batch_id: str | None = None,
                         skip_unchanged: bool = True,
                         newer_only: bool = True,
                         compact_every_n_batches: int | None = 32) -> dict:
    """RE-CRAWL semantics: fold ``pages`` into the state where a url may
    already be present — the reference's delete-on-reingest contract
    (``nl_graph_materialize.py`` onDuplicate=replace): the url's OLD
    triples are purged and the new page's triples take their place, so
    the state equals a rebuild in which each url contributes its LATEST
    crawl only. A plain ``incremental_update`` would double-count
    (the old raw rows stay in the store).

    ``skip_unchanged=True`` short-circuits per url on the EXTRACTED
    triple set (I4 change detection at the semantic level): a re-crawled
    page whose normalized triples are identical to the stored ones is
    dropped before the purge — boilerplate-only recrawls (the common
    case on a real crawl cadence) cost one anti-join, not a
    delete+insert cycle. Byte-level fingerprint checks belong UPSTREAM
    (cheaper, catches unchanged HTML before extraction); this guard
    catches changed-HTML-same-triples.

    ``newer_only=True`` enforces latest-crawl ORDERING on out-of-order
    delivery (a crawl fleet's batches arrive in completion order, not
    crawl order): within the batch only each url's newest ``warc_ts``
    row survives, and a url whose batch timestamp is STRICTLY older than
    the state's recorded crawl ts (the ``crawl_ts`` sidecar store) is
    dropped before any extraction — replaying last week's batch after
    today's cannot regress a url to stale content. Equal timestamps fall
    through to the fingerprint guard (a re-delivery of the same crawl is
    unchanged by definition). Legacy states without the sidecar skip the
    check and start recording from the next batch.

    EXACTLY-ONCE: with a ``batch_id``, the purge commits under
    ``<batch_id>-purge`` and the insert under ``batch_id`` — each leg
    replays/resumes independently through the same machinery as
    update/delete, so a crash between the legs converges on re-run.
    Auto-compaction fires after the insert leg under the same
    ``compact_every_n_batches`` contract as ``incremental_update``.
    Returns the merged stats dict ({"purge": ..., "update": ...}).
    """
    purge_id = f"{batch_id}-purge" if batch_id else None
    with _state_lock(state_dir):
        meta = _load_meta(state_dir)
        if not _state_complete(state_dir):
            _init_state_locked(spark, pages, state_dir, threshold,
                               batch_id=batch_id or
                               f"init-{uuid.uuid4().hex[:12]}")
            n = spark.read.parquet(f"{state_dir}/edges").count()
            return {"initialized": True, "edges": n}
        if batch_id is not None and batch_id in meta["completed"]:
            return {"replayed": True, "edges":
                    spark.read.parquet(f"{state_dir}/edges").count()}
        t_guard = time.perf_counter()
        if newer_only and "warc_ts" in pages.columns:
            # within-batch latest-crawl: keep each url's newest row only
            # (batch-bounded window — never corpus-sized)
            from pyspark.sql.window import Window

            w = Window.partitionBy("url").orderBy(F.col("warc_ts").desc())
            pages = pages.withColumn("_rn", F.row_number().over(w)) \
                .filter(F.col("_rn") == 1).drop("_rn")
        page_urls = pages.select("url").dropDuplicates(["url"])
        stored_urls = _read_raw(spark, state_dir) \
            .select("url").dropDuplicates(["url"])
        overlap = page_urls.join(stored_urls, "url", "left_semi") \
            .localCheckpoint(eager=True)
        ts_root = Path(state_dir) / "crawl_ts"
        if (newer_only and "warc_ts" in pages.columns
                and ts_root.exists() and not overlap.isEmpty()):
            # cross-batch ordering: drop recrawls STRICTLY older than the
            # state's recorded crawl ts — before the (expensive)
            # fingerprint extraction ever sees them. The sidecar scan is
            # two tiny columns semi-joined to the batch's overlap urls.
            stored_ts = spark.read.parquet(str(ts_root)) \
                .join(overlap, "url", "left_semi") \
                .groupBy("url").agg(F.max("warc_ts").alias("_stored"))
            stale = pages.select("url", "warc_ts") \
                .join(stored_ts, "url") \
                .filter(F.col("warc_ts") < F.col("_stored")) \
                .select("url").localCheckpoint(eager=True)
            n_stale = stale.count()
            overlap = overlap.join(stale, "url", "left_anti") \
                .localCheckpoint(eager=True)
            # stale urls must not reach the insert leg either: they are
            # neither brand-new (they're stored) nor in overlap now
            pages = pages.join(stale, "url", "left_anti")
            page_urls = pages.select("url").dropDuplicates(["url"])
        else:
            n_stale = 0
        if skip_unchanged and not overlap.isEmpty():
            # a url is UNCHANGED when its stored triple multiset equals
            # the fresh extraction: one order-insensitive per-url
            # fingerprint on each side (sorted row-hash list, so
            # multiplicity counts), inner-joined on url. Only OVERLAP
            # pages are extracted here — brand-new urls skip straight to
            # the insert leg, so the batch's dominant extraction cost is
            # paid once, not twice, on the mostly-new-urls crawl shape.
            new_raw = _norm_raw(
                pages.join(overlap, "url", "left_semi")) \
                .localCheckpoint(eager=True)

            def _fp(rows: DataFrame) -> DataFrame:
                h = F.xxhash64("pred", "confidence", "subj_norm",
                               "obj_norm")
                return rows.join(overlap, "url", "left_semi") \
                    .select("url", h.alias("_h")) \
                    .groupBy("url") \
                    .agg(F.xxhash64(F.sort_array(F.collect_list("_h")))
                         .alias("_fp"))

            old_fp = _fp(_read_raw(spark, state_dir)) \
                .withColumnRenamed("_fp", "_old")
            new_fp = _fp(new_raw).withColumnRenamed("_fp", "_new")
            # LEFT joins from overlap, null-safe compare: a url whose
            # fresh crawl extracts ZERO triples has no new_fp row at all
            # — an inner join would silently drop it as "unchanged" when
            # it must be purged (null fp != stored fp)
            diff_urls = overlap.join(old_fp, "url", "left") \
                .join(new_fp, "url", "left") \
                .filter(~F.col("_old").eqNullSafe(F.col("_new"))) \
                .select("url")
            overlap = overlap.join(diff_urls, "url", "left_semi") \
                .localCheckpoint(eager=True)
        stats: dict = {"initialized": False, "replayed": False}
        n_over = overlap.count()
        stats["reingested_urls"] = n_over
        stats["stale_dropped"] = n_stale
        if batch_id is not None:
            # record the WHOLE surviving batch's crawl timestamps now —
            # including unchanged-skipped recrawls, which never reach the
            # insert leg: their newer ts must still arm the guard, or a
            # delayed middle-aged crawl with different content would later
            # replace content a newer crawl already confirmed. The insert
            # leg's own append no-ops on the existing batch dir. Replay
            # safety: an own-batch ts in the store compares EQUAL, and the
            # stale filter is strictly-less-than, so a crash-and-rerun
            # still reaches the fingerprint guard and converges.
            _append_crawl_ts(spark, pages, state_dir, batch_id, meta)
        # the insert url set MATERIALIZES BEFORE the purge: the purge
        # swaps raw partition files, and a lazy plan over the pre-purge
        # read would fail FILE_NOT_EXIST when evaluated afterwards. Both
        # sets are batch-bounded (small), never corpus-sized.
        keep = page_urls.join(stored_urls, "url", "left_anti") \
            .unionByName(overlap).dropDuplicates(["url"]) \
            .localCheckpoint(eager=True)
        stats["guard_sec"] = round(time.perf_counter() - t_guard, 3)
        if n_over:
            t0 = time.perf_counter()
            stats["purge"] = _incremental_delete_locked(
                spark, overlap, state_dir, threshold, purge_id)
            stats["purge_sec"] = round(time.perf_counter() - t0, 3)
        # insert: BRAND-NEW urls + the changed re-crawls (their old rows
        # are gone now). Unchanged re-crawls are dropped entirely.
        to_insert = pages.join(keep, "url", "left_semi")
        if to_insert.isEmpty():
            if batch_id is not None:
                # RELOAD the manifest: the purge leg may have appended
                # its own completed-marker since ``meta`` was read —
                # saving the stale dict would clobber it
                _mark_completed(state_dir, _load_meta(state_dir), batch_id)
            stats["update"] = {"skipped": True, "reason": "no changes"}
            return stats
        t0 = time.perf_counter()
        stats["update"] = _incremental_update_locked(
            spark, to_insert, state_dir, threshold, batch_id)
        stats["update_sec"] = round(time.perf_counter() - t0, 3)
        # same auto-compaction contract as incremental_update: an
        # unattended recrawl stream keeps O(1) raw dirs without anyone
        # remembering to call compact_state
        if compact_every_n_batches is not None:
            n_dirs = len(list(
                (Path(state_dir) / "raw").glob("batch=*")))
            if n_dirs >= compact_every_n_batches:
                stats["compaction"] = _compact_state_locked(
                    spark, state_dir, min_batches=2)
        return stats
