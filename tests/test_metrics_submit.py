"""Per-stage metrics + spark-submit deployment evidence."""

import json
import subprocess
import sys

import pytest
from pyspark.sql import functions as F


class TestStageMetrics:
    def test_metered_pipeline_matches_plain(self, spark, tmp_path):
        from hades_spark.pipeline.corpus import pages_df
        from hades_spark.pipeline.kg import canonical_triples, distinct_edges
        from hades_spark.pipeline.metrics import run_kg_pipeline_metered

        pages = pages_df(spark, 60, seed=5, with_text=False)
        edges, metrics = run_kg_pipeline_metered(
            spark, pages, metrics_path=str(tmp_path / "m"))
        plain = distinct_edges(canonical_triples(pages))
        a = {tuple(r) for r in
             edges.select("subj", "pred", "obj", "support").collect()}
        b = {tuple(r) for r in
             plain.select("subj", "pred", "obj", "support").collect()}
        assert a == b
        # one metrics row per stage, rows and throughput populated
        assert set(metrics) == {"extract_triples", "canonicalize",
                                "materialize_edges"}
        for v in metrics.values():
            assert v["rows"] > 0 and v["seconds"] > 0 \
                and v["rows_per_sec"] > 0
        tbl = spark.read.parquet(str(tmp_path / "m"))
        assert tbl.count() == 3
        assert {r["stage"] for r in tbl.select("stage").collect()} == \
            set(metrics)

    def test_metrics_append_across_runs(self, spark, tmp_path):
        from hades_spark.pipeline.metrics import StageMetrics

        p = str(tmp_path / "m2")
        for run in ["r1", "r2"]:
            m = StageMetrics(spark, p, run_id=run)
            with m.stage("s") as s:
                s.rows = 5
            m.flush()
        tbl = spark.read.parquet(p)
        assert tbl.count() == 2
        assert {r["run_id"] for r in tbl.collect()} == {"r1", "r2"}


class TestSparkSubmit:
    @pytest.mark.slow
    def test_submit_with_py_files_zip(self, tmp_path):
        """North-rule deployment shape: spark-submit --py-files over the
        packaged library, no repo on sys.path inside the job."""
        import os
        import shutil

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        zip_path = subprocess.run(
            ["bash", f"{repo}/scripts/package.sh", str(tmp_path / "dist")],
            capture_output=True, text=True, cwd=repo, check=True,
        ).stdout.strip()
        spark_submit = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"
        out_dir = str(tmp_path / "edges")
        met_dir = str(tmp_path / "metrics")
        env = dict(os.environ)
        env.pop("PYTHONPATH", None)  # the zip must be self-sufficient
        r = subprocess.run(
            [spark_submit, "--master", "local[2]",
             "--conf", "spark.ui.enabled=false",
             "--py-files", zip_path if os.path.isabs(zip_path)
             else f"{repo}/{zip_path}",
             f"{repo}/scripts/submit_kg.py",
             "--pages", "60", "--output", out_dir,
             "--metrics", met_dir, "--run-id", "t1"],
            capture_output=True, text=True, timeout=420, env=env,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        line = [ln for ln in r.stdout.splitlines()
                if ln.startswith("{")][-1]
        payload = json.loads(line)
        assert payload["edges"] > 0
        assert set(payload["stages"]) == {"extract_triples", "canonicalize",
                                          "materialize_edges"}
        import glob
        assert glob.glob(f"{out_dir}/pred=*/*.parquet")
        assert glob.glob(f"{met_dir}/*.parquet")
