"""Steal-aware interleaved strong-scaling measurement.

The sandbox VM shares a host: /proc/stat steal fluctuates 0-5% of total
capacity, which on a 2-core run is up to ~60% of the busy cores — enough
to swamp a 2-vs-8-core efficiency ratio measured from two single runs
minutes apart. This harness:

  - alternates local[8] / local[2] KG-pipeline runs (fresh JVM per run,
    same pre-generated vocab corpus),
  - records the VM-wide steal share and wall around EACH run,
  - prints one JSON line per run plus a summary with the best (min-wall)
    pair and the lowest-steal pair.

Usage:
    BENCH_PAGES=200000 python scripts/scaling_pairs.py [reps=3]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from hades_spark.session import get_spark
from hades_spark.pipeline.kg import canonical_triples, distinct_edges

cpus = int(sys.argv[1]); corpus = sys.argv[2]
spark = get_spark("scaling_pair", master=f"local[{{cpus}}]",
                  shuffle_partitions=max(cpus, 8),
                  extra_conf={{"spark.ui.showConsoleProgress": "false"}})
spark.sparkContext.setLogLevel("ERROR")
pages = spark.read.parquet(corpus)
t0 = time.perf_counter()
caches = []
triples = canonical_triples(pages, caches=caches, local_threshold=20000)
n_edges = distinct_edges(triples).count()
sec = time.perf_counter() - t0
n_triples = triples.count()
# whole-JVM GC time via JMX (local mode: driver JVM == the executor, so
# this is the complete picture) — the 2-vs-8-core legs share one heap
# size, and long 2-core runs can spend a materially different fraction
# of wall in GC; report it so efficiency ratios carry their context
gc_ms = 0
try:
    beans = spark.sparkContext._jvm.java.lang.management \
        .ManagementFactory.getGarbageCollectorMXBeans()
    gc_ms = sum(b.getCollectionTime() for b in beans)
except Exception:
    pass
print(json.dumps({{"sec": round(sec, 2), "triples": n_triples,
                   "edges": n_edges, "gc_sec": round(gc_ms / 1000.0, 1),
                   "gc_pct_of_wall": round(100.0 * gc_ms / 1000.0 / sec,
                                           1) if sec else 0.0}}),
      flush=True)
spark.stop()
"""


def cpu_sample() -> tuple[int, int]:
    f = open("/proc/stat").readline().split()
    vals = [int(x) for x in f[1:]]
    return vals[7], sum(vals)  # steal, total


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    n_pages = int(os.environ.get("BENCH_PAGES", "200000"))
    corpus = (f"/tmp/hades_bench_corpus/pages_v3_n{n_pages}"
              f"_r30_s42_vocab150000")
    child = CHILD.format(repo=str(REPO))
    runs: list[dict] = []
    for rep in range(reps):
        for cpus in (8, 2):
            s0, t0 = cpu_sample()
            w0 = time.time()
            out = subprocess.run(
                [sys.executable, "-c", child, str(cpus), corpus],
                capture_output=True, text=True, cwd=str(REPO))
            s1, t1 = cpu_sample()
            line = [ln for ln in out.stdout.splitlines()
                    if ln.startswith("{")]
            if not line:
                print(json.dumps({"rep": rep, "cpus": cpus, "error":
                                  out.stderr[-400:]}), flush=True)
                continue
            rec = json.loads(line[-1])
            rec.update(rep=rep, cpus=cpus,
                       steal_pct=round(100.0 * (s1 - s0) / max(t1 - t0, 1),
                                       2),
                       wall=round(time.time() - w0, 1))
            runs.append(rec)
            print(json.dumps(rec), flush=True)
    by = {c: [r for r in runs if r["cpus"] == c] for c in (8, 2)}
    if by[8] and by[2]:
        best8 = min(by[8], key=lambda r: r["sec"])
        best2 = min(by[2], key=lambda r: r["sec"])
        quiet = [r for r in runs if r["steal_pct"] <= 0.5]
        qby = {c: [r for r in quiet if r["cpus"] == c] for c in (8, 2)}
        summary = {
            "phase": "summary", "pages": n_pages,
            "best2_sec": best2["sec"], "best8_sec": best8["sec"],
            "best_speedup": round(best2["sec"] / best8["sec"], 2),
            "best_efficiency": round(best2["sec"] / best8["sec"] / 4, 3),
            "runs2": [r["sec"] for r in by[2]],
            "runs8": [r["sec"] for r in by[8]],
            "steal2": [r["steal_pct"] for r in by[2]],
            "steal8": [r["steal_pct"] for r in by[8]],
        }
        if qby[8] and qby[2]:
            q8 = min(qby[8], key=lambda r: r["sec"])
            q2 = min(qby[2], key=lambda r: r["sec"])
            summary["quiet_efficiency"] = round(q2["sec"] / q8["sec"] / 4, 3)
        print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
