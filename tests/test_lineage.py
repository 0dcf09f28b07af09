"""Checkpoint-resume + lineage metrics behavior."""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, "/root/repo")

from python_fmask_spark.plans.lineage import StageRunner, classify_checkpointed  # noqa: E402
from python_fmask_spark.sources import register_views  # noqa: E402


def test_stage_runner_resume(spark, sf_small):
    register_views(spark, sf_small)
    with tempfile.TemporaryDirectory() as wd:
        runner = StageRunner(spark, wd, "t1")
        calls = []

        def build():
            calls.append(1)
            return spark.sql("SELECT doc_id, lang FROM documents")

        df1 = runner.run("s1", "fp-a", build)
        n1 = df1.count()
        # resume: same fingerprint -> no rebuild
        df2 = runner.run("s1", "fp-a", build)
        assert df2.count() == n1
        assert len(calls) == 1
        # changed fingerprint -> rebuild
        runner.run("s1", "fp-b", build)
        assert len(calls) == 2
        lin = runner.lineage().collect()
        assert {r.stage for r in lin} == {"s1"}
        assert all(r.rows_out == n1 for r in lin)
        assert all(r.max_partition_rows >= r.median_partition_rows for r in lin)


def test_classify_checkpointed_resume(spark, sf_small):
    register_views(spark, sf_small)
    with tempfile.TemporaryDirectory() as wd:
        out1 = classify_checkpointed(spark, "documents", wd).collect()
        # second run resumes from the final stage table: identical rows
        out2 = classify_checkpointed(spark, "documents", wd).collect()
        k = lambda r: (r.url,)  # noqa: E731
        assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))
        assert len(out1) == 500
