"""Structured Streaming ingest: micro-batch pass-1 counts equal the
batch result on the same data."""

from __future__ import annotations

import shutil
import sys
import tempfile

sys.path.insert(0, "/root/repo")

from python_fmask_spark import oracle  # noqa: E402
from python_fmask_spark.dialect import SPARK  # noqa: E402
from python_fmask_spark.sources import register_views  # noqa: E402
from python_fmask_spark.streaming import ingest  # noqa: E402


def test_stream_pass1_equals_batch(spark, sf_small):
    with tempfile.TemporaryDirectory() as d:
        shutil.copy(f"{sf_small}/documents.parquet", f"{d}/part1.parquet")
        counts = ingest.pass1_stream_counts(spark, d, window="24 hours")
        ingest.run_available_now(counts, "p1stream")
        got = {(r.cell_id, r.n_docs, r.n_pcp, r.n_water, r.n_snow)
               for r in spark.sql("SELECT * FROM p1stream").collect()}

    register_views(spark, sf_small)
    batch = spark.sql(oracle.q_pass1_cell_counts(SPARK)).collect()
    want = {(r.cell_id, r.n_docs, r.n_pcp, r.n_water, r.n_snow)
            for r in batch}
    assert got == want
