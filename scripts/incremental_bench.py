"""Incremental-KG maintenance throughput at bench scale.

The north rule's resumable-pipeline clause has e2e correctness tests
(tests/test_incremental_kg.py) but, until round 5, no MEASURED number:
what does folding a new crawl batch into a standing canonical map + edge
table cost vs rebuilding from scratch? This script measures exactly
that, at the same vocab-150k corpus family as the scaling campaigns:

  1. init_state over the BASE corpus (page indices [0, base));
  2. N_UPDATES incremental_update calls of UPDATE_PAGES each —
     consecutive index ranges of the SAME (seed, richness, vocab)
     generator, i.e. genuinely new urls from the same distribution (the
     "next crawl batch" shape);
  3. one full canonical_triples+distinct_edges rebuild over
     [0, base + N*upd) for the baseline wall;
  4. correctness gate: state edges == rebuild edges via two exceptAll
     counts (the e2e invariant, at bench scale).

Prints one JSON line: per-update seconds, update pages/sec, rebuild
pages/sec, and the marginal speedup of maintaining vs rebuilding.

    BENCH_BASE=200000 BENCH_UPDATE=5000 BENCH_N_UPDATES=5 \
    SPARK_GRAFT_CPUS=8 python scripts/incremental_bench.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    from hades_spark.pipeline.corpus import pages_df_distributed
    from hades_spark.pipeline.incremental_kg import (incremental_update,
                                                     init_state)
    from hades_spark.pipeline.kg import canonical_triples, distinct_edges
    from hades_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    base = int(os.environ.get("BENCH_BASE", "200000"))
    upd = int(os.environ.get("BENCH_UPDATE", "5000"))
    n_updates = int(os.environ.get("BENCH_N_UPDATES", "5"))
    richness = int(os.environ.get("BENCH_RICHNESS", "30"))
    vocab = int(os.environ.get("BENCH_VOCAB", "150000"))
    root = os.environ.get("BENCH_CORPUS_DIR", "/tmp/hades_bench_corpus")
    state_dir = os.environ.get("BENCH_STATE_DIR",
                               "/tmp/hades_inc_bench_state")

    spark = get_spark("incremental_bench", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8),
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    gen = dict(seed=42, partitions=64, richness=richness,
               vocab_size=vocab)

    # corpora on disk first (untimed), so the timed sections measure the
    # pipeline, not synthesis. Base reuses the scaling-campaign corpus.
    base_dir = f"{root}/pages_v3_n{base}_r{richness}_s42_vocab{vocab}"
    if not Path(base_dir, "_SUCCESS").exists():
        pages_df_distributed(spark, base, **gen) \
            .write.mode("overwrite").parquet(base_dir)
    upd_dirs = []
    for k in range(n_updates):
        d = (f"{root}/pages_v3_upd{k}_n{upd}_r{richness}_s42"
             f"_vocab{vocab}_start{base + k * upd}")
        if not Path(d, "_SUCCESS").exists():
            pages_df_distributed(spark, upd, start=base + k * upd,
                                 **gen).write.mode("overwrite").parquet(d)
        upd_dirs.append(d)

    shutil.rmtree(state_dir, ignore_errors=True)

    out: dict = {"metric": "incremental_kg_bench", "cpus": cpus,
                 "base_pages": base, "update_pages": upd,
                 "n_updates": n_updates}

    t0 = time.perf_counter()
    init_state(spark, spark.read.parquet(base_dir), state_dir)
    out["init_sec"] = round(time.perf_counter() - t0, 2)

    upd_secs = []
    stage_acc: dict = {}
    for k, d in enumerate(upd_dirs):
        t0 = time.perf_counter()
        st = incremental_update(spark, spark.read.parquet(d), state_dir,
                                batch_id=f"upd{k}")
        upd_secs.append(round(time.perf_counter() - t0, 2))
        for stage, v in (st.get("stages") or {}).items():
            stage_acc.setdefault(stage, []).append(v["sec"])
    out["update_secs"] = upd_secs
    # per-stage attribution of the update wall (metrics.jsonl seam)
    out["update_stage_secs"] = {
        s: round(sum(v) / len(v), 2) for s, v in stage_acc.items()}
    out["update_pages_per_sec"] = round(
        upd * n_updates / max(sum(upd_secs), 1e-9), 1)

    # full-rebuild baseline over the identical final corpus
    full = spark.read.parquet(base_dir, *upd_dirs)
    t0 = time.perf_counter()
    caches: list = []
    # local_threshold=0 pins the DISTRIBUTED canonicalization path at any
    # corpus size: the incremental state always runs distributed, and the
    # driver-local small-vocab path's candidate index is a documented
    # SUPERSET of banded LSH's (it containment-merges pathological giant
    # norms LSH never pairs) — gating against it would flag phantom
    # diffs at smoke scale. At bench scale (vocab >> 20k) the rebuild is
    # distributed either way, so the timing baseline is unaffected.
    triples = canonical_triples(full, caches=caches, local_threshold=0)
    edges_full = distinct_edges(triples).localCheckpoint()
    n_edges_full = edges_full.count()
    out["rebuild_sec"] = round(time.perf_counter() - t0, 2)
    out["rebuild_pages_per_sec"] = round(
        (base + upd * n_updates) / max(out["rebuild_sec"], 1e-9), 1)
    for c in caches:
        c.unpersist()

    # correctness gate at bench scale: the e2e invariant (state edges ==
    # full rebuild), checked distributed — no driver collect of 600k rows
    cols = ["subj", "pred", "obj", "edge_key", "confidence", "url",
            "support"]
    state_edges = spark.read.parquet(f"{state_dir}/edges").select(*cols)
    full_edges = edges_full.select(*cols)
    missing = full_edges.exceptAll(state_edges).count()
    extra = state_edges.exceptAll(full_edges).count()
    out["edges"] = n_edges_full
    out["edges_match"] = (missing == 0 and extra == 0)
    out["edges_missing"] = missing
    out["edges_extra"] = extra

    # the headline: how much cheaper is maintaining than rebuilding,
    # per NEW page folded in
    mean_upd = sum(upd_secs) / len(upd_secs)
    out["mean_update_sec"] = round(mean_upd, 2)
    out["update_vs_rebuild_speedup"] = round(
        out["rebuild_sec"] / max(mean_upd, 1e-9), 1)

    # "latest crawl" view of the corpus — the reingest phase swaps
    # bodies in place, so every later gate rebuilds from THIS frame
    corpus_latest = spark.read.parquet(base_dir, *upd_dirs)

    # optional REINGEST phase (BENCH_REINGEST_PAGES > 0): re-crawl that
    # many base urls — half with CHANGED bodies (donor html from a
    # disjoint base sample; url/ts/lang kept), half verbatim (the
    # unchanged-skip guard must drop them before any purge) — then
    # verify state == rebuild-over-latest. This measures the
    # delete-on-reingest path at real bucket populations AND the cost
    # of the semantic change guard on a boilerplate-heavy recrawl.
    n_re = int(os.environ.get("BENCH_REINGEST_PAGES", "0"))
    if n_re:
        from pyspark.sql import functions as F
        from pyspark.sql.window import Window

        from hades_spark.pipeline.incremental_kg import incremental_reingest

        stride_r = max(base // n_re, 1)
        h = F.abs(F.xxhash64("url")) % stride_r
        base_pages = spark.read.parquet(base_dir)
        # pair sample-1 urls with sample-2 bodies by rank (both samples
        # are bench-bounded ~n_re rows, so the windows are trivial)
        w = Window.orderBy("url")
        a_rn = base_pages.filter(h == 1) \
            .select("url", "warc_ts", "lang",
                    F.row_number().over(w).alias("rn"))
        b_rn = base_pages.filter(h == 2) \
            .select(F.col("html").alias("new_html"),
                    F.row_number().over(w).alias("rn"))
        changed = a_rn.join(b_rn, "rn").select(
            "url", "warc_ts", F.col("new_html").alias("html"),
            F.lit(None).cast("string").alias("text"), "lang") \
            .localCheckpoint()
        unchanged = base_pages.filter(h == 3).localCheckpoint()
        n_changed, n_unch = changed.count(), unchanged.count()
        t0 = time.perf_counter()
        rstats = incremental_reingest(
            spark, changed.unionByName(unchanged), state_dir,
            batch_id="bench-re")
        out["reingest_sec"] = round(time.perf_counter() - t0, 2)
        out["reingest_changed_sent"] = n_changed
        out["reingest_unchanged_sent"] = n_unch
        out["reingest_detected_changed"] = rstats.get("reingested_urls")
        out["reingest_leg_secs"] = {
            k: rstats.get(k) for k in
            ("guard_sec", "purge_sec", "update_sec")}
        out["reingest_purge_stage_secs"] = {
            s: v["sec"] for s, v in
            (rstats.get("purge", {}).get("stages") or {}).items()}
        corpus_latest = corpus_latest \
            .join(changed.select("url"), "url", "left_anti") \
            .unionByName(changed)
        t0 = time.perf_counter()
        caches3: list = []
        tr3 = canonical_triples(corpus_latest, caches=caches3,
                                local_threshold=0)
        edges_lat = distinct_edges(tr3).localCheckpoint()
        n_edges_lat = edges_lat.count()
        out["reingest_rebuild_sec"] = round(time.perf_counter() - t0, 2)
        for c in caches3:
            c.unpersist()
        state_edges3 = spark.read.parquet(f"{state_dir}/edges") \
            .select(*cols)
        r_missing = edges_lat.select(*cols).exceptAll(state_edges3).count()
        r_extra = state_edges3.exceptAll(edges_lat.select(*cols)).count()
        out["reingest_edges"] = n_edges_lat
        out["reingest_edges_match"] = (r_missing == 0 and r_extra == 0)
        out["reingest_edges_missing"] = r_missing
        out["reingest_edges_extra"] = r_extra

    # optional DELETE phase (BENCH_DELETE_PAGES > 0): purge that many of
    # the base corpus's urls from the state and verify delete ==
    # rebuild-over-remaining — the downward-cap-crossing and
    # pair-pruning machinery only bites at real bucket populations (the
    # update-path divergence was likewise invisible below ~800k pages)
    n_del = int(os.environ.get("BENCH_DELETE_PAGES", "0"))
    if n_del:
        from pyspark.sql import functions as F

        from hades_spark.pipeline.incremental_kg import incremental_delete

        # a deterministic ~n_del-url scatter over the base corpus: hash
        # sampling (no sort, no window — order-free and reproducible)
        stride = max(base // n_del, 1)
        gone = spark.read.parquet(base_dir).select("url") \
            .filter(F.abs(F.xxhash64("url")) % stride == 0) \
            .localCheckpoint()
        n_gone = gone.count()
        t0 = time.perf_counter()
        dstats = incremental_delete(spark, gone, state_dir,
                                    delete_id="bench-del")
        out["delete_sec"] = round(time.perf_counter() - t0, 2)
        out["delete_urls"] = n_gone
        out["delete_stage_secs"] = {
            s: v["sec"] for s, v in (dstats.get("stages") or {}).items()}
        out["delete_edges_rewritten"] = dstats.get("edges_rewritten")
        out["delete_edges_deleted"] = dstats.get("edges_deleted")
        remaining = corpus_latest.join(gone, "url", "left_anti")
        t0 = time.perf_counter()
        caches2: list = []
        tr2 = canonical_triples(remaining, caches=caches2,
                                local_threshold=0)
        edges_rem = distinct_edges(tr2).localCheckpoint()
        n_edges_rem = edges_rem.count()
        out["delete_rebuild_sec"] = round(time.perf_counter() - t0, 2)
        for c in caches2:
            c.unpersist()
        state_edges2 = spark.read.parquet(f"{state_dir}/edges") \
            .select(*cols)
        d_missing = edges_rem.select(*cols).exceptAll(state_edges2).count()
        d_extra = state_edges2.exceptAll(edges_rem.select(*cols)).count()
        out["delete_edges"] = n_edges_rem
        out["delete_edges_match"] = (d_missing == 0 and d_extra == 0)
        out["delete_edges_missing"] = d_missing
        out["delete_edges_extra"] = d_extra

    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
