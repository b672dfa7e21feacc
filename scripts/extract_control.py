"""Spark-free control for the extract stage's strong scaling.

Round-5 decomposition shows `extract` (mapInArrow html->text->SVO, pure
python per page) dominating the 800k wall and, with `pairs`, carrying the
2-vs-8-core gap. Before attributing that to the engine, measure the SAME
python work with NO Spark: read a slice of the bench corpus with pyarrow,
run the identical route_extract + extract_triples over it in a
multiprocessing pool at 2 and at 8 processes, and report the speedup.

If this control scales ~4x, the engine leaves parallelism on the table;
if it scales like the Spark stage, the ceiling is the host's per-core
throughput under load (clock/memory-bandwidth), not the plan. Round 1 ran
the same control on a different host and measured 0.98 efficiency at 8
procs; hosts differ — measure, don't assume.

    BENCH_FILES=8 python scripts/extract_control.py
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _work(rows):
    """Identical per-page work to functions.triples._arrow_extract_batches."""
    from hades_spark.textcore.route import extract_text as _route_extract
    from hades_spark.textcore.svo import extract_triples as _ext

    n = 0
    for u, h, t in rows:
        if t is None:
            t = _route_extract(u, h)
        n += len(_ext(t))
    return n


def cpu_sample():
    v = [int(x) for x in open("/proc/stat").readline().split()[1:]]
    return v[7], sum(v)


def main() -> None:
    import pyarrow.parquet as pq

    corpus = os.environ.get(
        "BENCH_CORPUS",
        "/tmp/hades_bench_corpus/pages_v3_n800000_r30_s42_vocab150000")
    n_files = int(os.environ.get("BENCH_FILES", "8"))
    files = sorted(Path(corpus).glob("part-*.parquet"))[:n_files]
    rows = []
    for f in files:
        t = pq.read_table(f, columns=["url", "html", "text"])
        rows.extend(zip(t.column("url").to_pylist(),
                        t.column("html").to_pylist(),
                        t.column("text").to_pylist()))
    # same chunking discipline as Spark tasks: many chunks per proc so
    # pool imbalance can't masquerade as a scaling ceiling
    chunks = [rows[i::64] for i in range(64)]
    out = {"metric": "extract_control", "pages": len(rows),
           "files": n_files, "runs": []}
    for procs in (8, 2, 8, 2):
        s0, t0c = cpu_sample()
        t0 = time.perf_counter()
        with mp.get_context("spawn").Pool(procs) as pool:
            total = sum(pool.map(_work, chunks))
        sec = time.perf_counter() - t0
        s1, t1c = cpu_sample()
        out["runs"].append({
            "procs": procs, "sec": round(sec, 2), "triples": total,
            "pages_per_sec": round(len(rows) / sec, 1),
            "steal_pct": round(100.0 * (s1 - s0) / max(t1c - t0c, 1), 2)})
        print(json.dumps(out["runs"][-1]), flush=True)
    best = {p: min(r["sec"] for r in out["runs"] if r["procs"] == p)
            for p in (2, 8)}
    out["best_speedup"] = round(best[2] / best[8], 2)
    out["best_efficiency"] = round(best[2] / best[8] / 4, 3)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
