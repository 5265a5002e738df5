"""End-to-end pipeline + checkpoint/resume tests (FIXTURES.md §4:
kill after stage k, rerun with same config hash → identical output)."""

import json
import os

import pytest
from pyspark.sql import functions as F

from gnames_spark.config import DedupConfig
from gnames_spark.corpus import generate_pages
from gnames_spark.pipeline import DedupPipeline

CFG = DedupConfig(shuffle_partitions=8, bucket_cap=300)
SEED = 11
N = 300


@pytest.fixture(scope="module")
def pages(spark):
    return generate_pages(spark, N, seed=SEED).cache()


def _components_dict(res):
    return {
        r["doc_id"]: r["component_id"] for r in res["components"].collect()
    }


class TestPipeline:
    def test_end_to_end_no_checkpoint(self, spark, pages):
        pipe = DedupPipeline(spark, CFG)
        res = pipe.run(pages)
        comps = _components_dict(res)
        assert len(comps) == N
        n_clusters = len(set(comps.values()))
        assert 0 < n_clusters < N  # dups exist, not everything merged
        reps = res["representatives"]
        assert reps.filter("is_representative").count() == n_clusters
        # html must be gone from docs (column pruning contract)
        assert "html" not in res["docs"].columns

    def test_checkpoint_and_resume(self, spark, pages, tmp_path):
        root = str(tmp_path / "ckpt")
        pipe1 = DedupPipeline(spark, CFG, checkpoint_root=root)
        res1 = pipe1.run(pages)
        c1 = _components_dict(res1)
        stages = [m.stage for m in pipe1.metrics.stages]
        assert stages == ["docs", "signatures", "candidate_pairs", "verified_pairs", "components"]
        assert not any(m.reused for m in pipe1.metrics.stages)

        # simulate kill after stage 2: wipe downstream stages
        pipe_kill = DedupPipeline(spark, CFG, checkpoint_root=root)
        pipe_kill.io.invalidate("verified_pairs")
        pipe_kill.io.invalidate("components")
        res2 = pipe_kill.run(pages)
        c2 = _components_dict(res2)
        reused = {m.stage: m.reused for m in pipe_kill.metrics.stages}
        assert reused["docs"] and reused["signatures"] and reused["candidate_pairs"]
        assert not reused["verified_pairs"] and not reused["components"]
        assert c1 == c2  # identical final components (order-insensitive)

    def test_config_change_invalidates(self, spark, pages, tmp_path):
        root = str(tmp_path / "ckpt2")
        DedupPipeline(spark, CFG, checkpoint_root=root).run(pages)
        other = CFG.with_overrides(shingle_k=7)
        pipe2 = DedupPipeline(spark, other, checkpoint_root=root)
        pipe2.run(pages)
        assert not any(m.reused for m in pipe2.metrics.stages)

    def test_manifest_contents(self, spark, pages, tmp_path):
        root = str(tmp_path / "ckpt3")
        pipe = DedupPipeline(spark, CFG, checkpoint_root=root)
        pipe.run(pages)
        with open(os.path.join(root, "signatures", "_manifest.json")) as f:
            m = json.load(f)
        assert m["complete"] and m["config_hash"] == CFG.config_hash()
        assert m["rows"] > 0 and "minhash" in m["schema"]

    def test_metrics_throughput_recorded(self, spark, pages, tmp_path):
        root = str(tmp_path / "ckpt4")
        pipe = DedupPipeline(spark, CFG, checkpoint_root=root)
        pipe.run(pages)
        docs_m = [m for m in pipe.metrics.stages if m.stage == "docs"][0]
        assert docs_m.docs_per_sec > 0
        out = json.loads(pipe.metrics.to_json())
        assert out["run_id"] and len(out["stages"]) == 5

    def test_exact_members_inherit_component(self, spark, pages):
        """Non-representative exact copies land in the same component as
        their representative (the early-exit cascade must not lose them)."""
        pipe = DedupPipeline(spark, CFG)
        res = pipe.run(pages)
        docs = res["docs"].select("doc_id", "content_sha")
        comps = res["components"]
        j = docs.join(comps, "doc_id")
        n_violations = (
            j.groupBy("content_sha")
            .agg(F.countDistinct("component_id").alias("n"))
            .filter("n > 1")
            .count()
        )
        assert n_violations == 0
