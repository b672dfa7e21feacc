"""Verify-tail residual-serial-term probe at web-scale vocabulary.

Synthesizes an N-squash vocabulary (deterministic, alias-pair-bearing),
runs the production ``verified_pairs`` tail, and attributes the wall:

- per-BroadcastExchange SQL metrics (collectTime / buildTime /
  broadcastTime / dataSize) pulled from the executed plan, so the twin
  vocabulary-relation builds are measured directly;
- per-job submission/completion intervals from the event log, so
  OVERLAP between the two builds (AQE materializes leaf broadcast
  stages concurrently or not) is observable rather than assumed.

Usage: python scripts/verify_tail_scale_probe.py [n_squashes]
"""
from __future__ import annotations

import glob
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def walk(plan, out):
    name = plan.nodeName()
    if "BroadcastExchange" in name:
        m = {}
        it = plan.metrics().iterator()
        while it.hasNext():
            kv = it.next()
            m[kv._1()] = kv._2().value()
        out.append((name, m))
    for i in range(plan.children().length()):
        walk(plan.children().apply(i), out)
    # adaptive/stage wrappers hide children behind plan()/broadcast()
    for attr in ("plan", "broadcast", "executedPlan"):
        try:
            walk(getattr(plan, attr)(), out)
            break
        except Exception:
            pass


def main(n: int) -> None:
    from pyspark.sql import functions as F

    from hades_spark.operators.lsh import char_shingles, verified_pairs
    from hades_spark.session import get_spark

    evdir = "/tmp/hades_eventlog_probe"
    os.makedirs(evdir, exist_ok=True)
    for f in glob.glob(f"{evdir}/*"):
        os.remove(f)
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        "verify_tail_probe", master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
        })
    spark.sparkContext.setLogLevel("ERROR")

    # synthetic vocabulary: hex squashes; every 10th id also emits a
    # near-duplicate alias (same squash + 2-char suffix) so the verify
    # tail has real pairs to confirm
    base = spark.range(0, n).select(
        F.md5(F.col("id").cast("string")).alias("squash"))
    alias = spark.range(0, n, 10).select(
        F.concat(F.md5(F.col("id").cast("string")), F.lit("zz"))
         .alias("squash"))
    vocab = base.unionByName(alias).dropDuplicates(["squash"]) \
        .localCheckpoint(eager=True)
    n_vocab = vocab.count()

    t0 = time.perf_counter()
    vp = verified_pairs(vocab, "squash", char_shingles(F.col("squash"), 3),
                        threshold=0.8, metric="containment",
                        num_hashes=16, bands=16, max_bucket_size=150)
    qe = vp._jdf.queryExecution()
    n_pairs = qe.toRdd().count()
    wall = time.perf_counter() - t0

    exch = []
    walk(qe.executedPlan(), exch)
    print(json.dumps({"n_vocab": n_vocab, "n_pairs": n_pairs,
                      "wall": round(wall, 2)}))
    for name, m in exch:
        slim = {k: v for k, v in m.items()
                if any(s in k for s in ("collect", "build", "broadcast",
                                        "rows", "data"))}
        print(json.dumps({"exchange": name, **slim}))

    spark.stop()
    # job intervals from the event log
    time.sleep(1.0)
    logs = sorted(glob.glob(f"{evdir}/*"), key=os.path.getmtime)
    jobs = {}
    if logs:
        with open(logs[-1], errors="replace") as fh:
            for line in fh:
                try:
                    ev = json.loads(line)
                except Exception:
                    continue
                if ev.get("Event") == "SparkListenerJobStart":
                    jobs[ev["Job ID"]] = {
                        "t0": ev["Submission Time"],
                        "desc": ev.get("Properties", {}).get(
                            "spark.job.description", "")[:90]}
                elif ev.get("Event") == "SparkListenerJobEnd":
                    if ev["Job ID"] in jobs:
                        jobs[ev["Job ID"]]["t1"] = ev["Completion Time"]
    if jobs:
        t_base = min(j["t0"] for j in jobs.values())
        for jid in sorted(jobs):
            j = jobs[jid]
            print(json.dumps({
                "job": jid,
                "start_s": round((j["t0"] - t_base) / 1000, 2),
                "end_s": round((j.get("t1", j["t0"]) - t_base) / 1000, 2),
                "desc": j["desc"]}))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000)
