"""Pre-generate the bench page corpora (untimed) so scaling runs start warm."""
import os, sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

def main():
    from hades_spark.pipeline.corpus import pages_df_distributed
    from hades_spark.session import get_spark
    root = os.environ.get("BENCH_CORPUS_DIR", "/tmp/hades_bench_corpus")
    spark = get_spark("pregen", master="local[8]", shuffle_partitions=8,
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    jobs = [(20000, 30, 0), (20000, 30, 150000),
            (200000, 30, 150000), (800000, 30, 150000)]
    for n, r, vocab in jobs:
        d = f"{root}/pages_v3_n{n}_r{r}_s42_vocab{vocab}" if vocab else \
            f"{root}/pages_v2_n{n}_r{r}_s42"
        if Path(d, "_SUCCESS").exists():
            print("exists", d); continue
        pages_df_distributed(spark, n, seed=42, partitions=64,
                             richness=r, vocab_size=vocab) \
            .write.mode("overwrite").parquet(d)
        print("wrote", d, flush=True)
    spark.stop()

if __name__ == "__main__":
    main()
