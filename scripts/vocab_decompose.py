"""Per-stage decomposition of the distributed canonicalization path
(vocab bench shape: 45k distinct norms -> LSH + verify + CC + relabel).

Usage: python scripts/vocab_decompose.py [repeats]
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(repeats=2):
    from pyspark.sql import functions as F

    from hades_spark.functions.triples import raw_triples
    from hades_spark.operators.canonicalize import (
        MAX_ALIAS_SQUASH_LEN, normalize_surface_col)
    from hades_spark.operators.components import alternating_components
    from hades_spark.operators.lsh import (
        cap_and_self_join, char_shingles, lsh_buckets, pair_scores)
    from hades_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark('vocab_decompose', master=f'local[{cpus}]',
                      shuffle_partitions=max(cpus, 8),
                      extra_conf={'spark.ui.showConsoleProgress': 'false'})
    spark.sparkContext.setLogLevel('ERROR')
    sc = spark.sparkContext
    vdir = '/tmp/hades_bench_corpus/pages_v3_n20000_r30_s42_vocab150000'
    pages = spark.read.parquet(vdir)
    pages.count()

    for rep in range(repeats):
        st = {}
        t_all = time.perf_counter()

        sc.setJobDescription(f'r{rep}: extract+cache')
        t0 = time.perf_counter()
        raw = (raw_triples(pages)
               .select('url', 'pred', 'confidence',
                       normalize_surface_col(F.col('subj')).alias('subj_norm'),
                       normalize_surface_col(F.col('obj')).alias('obj_norm'))
               .cache())
        raw.count()
        st['extract_cache'] = time.perf_counter() - t0

        sc.setJobDescription(f'r{rep}: keyed checkpoint+count')
        t0 = time.perf_counter()
        norms = raw.select(F.explode(F.array('subj_norm', 'obj_norm')).alias('norm'))
        keyed = (norms.select(F.col('norm'))
                 .dropDuplicates(['norm'])
                 .withColumn('squash', F.regexp_replace('norm', ' ', ''))
                 .filter(F.length('squash') > 0)
                 .localCheckpoint(eager=False))
        n_norms = keyed.count()
        st['keyed_count'] = time.perf_counter() - t0

        sc.setJobDescription(f'r{rep}: squash distinct + shingle checkpoint')
        t0 = time.perf_counter()
        squashes = keyed.select('squash').dropDuplicates(['squash']) \
            .filter(F.length('squash') <= MAX_ALIAS_SQUASH_LEN)
        keyed2 = squashes.select(F.col('squash').alias('_id'),
                                 char_shingles(F.col('squash'), 3).alias('sh')) \
            .filter(F.size('sh') > 0).localCheckpoint(eager=False)
        n_sq = keyed2.count()
        st['shingled_count'] = time.perf_counter() - t0

        sc.setJobDescription(f'r{rep}: lsh buckets + candidate pairs')
        t0 = time.perf_counter()
        buckets = lsh_buckets(keyed2, '_id', 'sh', num_hashes=16, bands=16)
        pairs = cap_and_self_join(buckets, 150, distinct=False)
        # materialize candidates via noop to time candidate gen alone
        pairs.write.format('noop').mode('overwrite').save()
        st['candidates_noop'] = time.perf_counter() - t0

        sc.setJobDescription(f'r{rep}: pair_scores verify')
        t0 = time.perf_counter()
        vp = pair_scores(pairs, keyed2, 0.8, 'containment',
                         pairs_distinct=False)
        vp = vp.select('a', 'b').localCheckpoint(eager=False)
        n_pairs = vp.count()
        st['verify'] = time.perf_counter() - t0

        sc.setJobDescription(f'r{rep}: components')
        t0 = time.perf_counter()
        comp = alternating_components(vp, 'a', 'b', max_iter=50)
        n_comp = comp.count()
        st['components'] = time.perf_counter() - t0

        sc.setJobDescription(f'r{rep}: relabel tail')
        t0 = time.perf_counter()
        lab = (keyed.join(comp, keyed.squash == comp.node, 'left')
               .select('norm', F.coalesce('component', F.col('squash')).alias('_comp')))
        canon = lab.groupBy('_comp').agg(F.min('norm').alias('canonical_id'))
        cmap = lab.join(canon, '_comp').select('norm', 'canonical_id')
        n_map = cmap.count()
        st['relabel'] = time.perf_counter() - t0

        st['total'] = time.perf_counter() - t_all
        raw.unpersist(True)
        print(json.dumps({'rep': rep, 'n_norms': n_norms, 'n_squash': n_sq,
                          'n_pairs': n_pairs, 'n_comp': n_comp, 'n_map': n_map,
                          **{k: round(v, 2) for k, v in st.items()}}),
              flush=True)
    spark.stop()


if __name__ == '__main__':
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 2)
