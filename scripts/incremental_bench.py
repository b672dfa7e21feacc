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
    triples = canonical_triples(full, caches=caches, local_threshold=20000)
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

    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
