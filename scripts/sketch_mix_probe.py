"""Scale probe: CMS heavy hitters + deterministic sampling at 10^8 rows.

Measures, at local[N] over a deterministic zipf-ish synthetic stream:

1. `cms_heavy_hitters` wall vs the exact groupBy/count top-k wall, and
   whether the sketch's top-k SET and estimated counts match exact (the
   one-sided error is provably bounded; the probe shows where the
   default depth/width operating point actually sits on real skew);
2. `deterministic_sample` + `stratified_mix` scan-rate (rows/s through
   the pushed-down gate, no shuffle) vs `DataFrame.sample` as the
   baseline it replaces.

Rows are generated from spark.range — hash-derived keys, no data files —
so the probe isolates operator cost from IO. Usage:

    python scripts/sketch_mix_probe.py [rows] [cores]
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from hades_spark.operators.sampling import (deterministic_sample,  # noqa: E402
                                            stratified_mix)
from hades_spark.operators.sketch import cms_heavy_hitters  # noqa: E402
from hades_spark.session import get_spark  # noqa: E402


def zipfish_keys(n_rows: int):
    """Deterministic skewed key column: u = xxhash64(id) normalized to
    (0,1], key = floor(u^-0.85) capped — Zipf-like tail, hot key 1."""
    u = (F.xxhash64("id") + F.lit(float(2**63)) + F.lit(1.0)) \
        / F.lit(float(2**64))
    return F.least(F.floor(F.pow(u, F.lit(-0.85))),
                   F.lit(1_000_000)).cast("long")


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    spark = get_spark("sketch_mix_probe", master=f"local[{cores}]",
                      shuffle_partitions=cores * 4)
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"rows": rows, "cores": cores}

    stream = spark.range(rows).select(zipfish_keys(rows).alias("key"))

    t0 = time.monotonic()
    exact = (stream.groupBy("key").count()
             .orderBy(F.desc("count"), F.asc("key")).limit(10).collect())
    out["exact_topk_sec"] = round(time.monotonic() - t0, 2)

    t0 = time.monotonic()
    approx = cms_heavy_hitters(stream, "key", k=10,
                               depth=4, width=8192).collect()
    out["cms_topk_sec"] = round(time.monotonic() - t0, 2)
    ex = {r["key"]: r["count"] for r in exact}
    ap = {r["val"]: r["est_count"] for r in approx}
    out["topk_set_match"] = set(ex) == set(ap)
    out["max_overestimate"] = max(ap[k] - ex.get(k, 0) for k in ap)
    out["never_under"] = all(ap[k] >= ex.get(k, 0) for k in ap)

    # sampling scan-rate: count() forces the full scan through the gate
    docs = spark.range(rows).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 5).cast("string").alias("lang"))
    t0 = time.monotonic()
    kept = deterministic_sample(docs, "doc_id", 0.1, seed=1).count()
    dt = time.monotonic() - t0
    out["hash_sample_sec"] = round(dt, 2)
    out["hash_sample_rows_per_sec"] = int(rows / dt)
    out["hash_sample_kept"] = kept

    t0 = time.monotonic()
    docs.sample(fraction=0.1, seed=1).count()
    out["rng_sample_sec"] = round(time.monotonic() - t0, 2)

    t0 = time.monotonic()
    mixed = stratified_mix(
        docs, "doc_id", "lang",
        {"0": 0.5, "1": 0.25, "2": 0.1}, default_fraction=0.02,
        seed=1).count()
    dt = time.monotonic() - t0
    out["stratified_mix_sec"] = round(dt, 2)
    out["stratified_mix_rows_per_sec"] = int(rows / dt)
    out["stratified_mix_kept"] = mixed

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
