"""X5 cost story at bench scale (VERDICT r4 #7): embed >=100k chunks
through the CHECKPOINT-LOADING numpy transformer backend on local[8],
reporting chunks/sec, tokens/sec and the number of model inits (must be
<= worker count: the executor-global singleton loads once per worker,
never once per task/batch).

Usage: python scripts/numpy_embed_bench.py [replicas=8]
Prints one JSON line.
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    from hades_spark.functions.numpy_model import (_INIT_LOG,
                                                   NumpyTokenTransformer)
    from hades_spark.operators.chunking import chunks_table
    from hades_spark.functions.embedding import pooled_embed_chunks
    from hades_spark.session import get_spark

    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    cpus = int(os.environ.get("BENCH_CPUS", "8"))
    spark = get_spark("numpy_embed_bench", master=f"local[{cpus}]",
                      shuffle_partitions=cpus,
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet") \
        .select("doc_id", "text")
    reps = spark.range(replicas).select(F.col("id").alias("rep"))
    blown = docs.crossJoin(reps).select(
        F.concat_ws("-", F.col("doc_id").cast("string"),
                    F.col("rep")).alias("doc_id"), "text")
    chunks = chunks_table(blown, chunk_size=100, overlap=0) \
        .repartition(cpus * 4).localCheckpoint()  # untimed input build
    n_chunks = chunks.count()

    init_lines0 = 0
    if Path(_INIT_LOG).exists():
        init_lines0 = len(Path(_INIT_LOG).read_text().splitlines())

    t0 = time.perf_counter()
    emb = pooled_embed_chunks(chunks, NumpyTokenTransformer, dim=64,
                              model_name="numpy-tiny-d64")
    agg = emb.agg(F.count("*").alias("n"),
                  F.sum("n_tokens").alias("tok")).collect()[0]
    wall = time.perf_counter() - t0

    init_lines1 = init_lines0
    if Path(_INIT_LOG).exists():
        init_lines1 = len(Path(_INIT_LOG).read_text().splitlines())
    inits = init_lines1 - init_lines0

    out = {
        "metric": "numpy_embed_chunks_per_sec",
        "value": round(agg["n"] / wall, 1),
        "unit": "chunks/sec",
        "chunks": agg["n"],
        "tokens": int(agg["tok"]),
        "tokens_per_sec": round(agg["tok"] / wall, 1),
        "wall_sec": round(wall, 2),
        "cpus": cpus,
        "model_inits": inits,
        "inits_ok": bool(0 < inits <= cpus),
    }
    assert agg["n"] >= 100_000 or replicas < 8, agg["n"]
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
