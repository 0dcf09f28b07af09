#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "tiles/sec", "value": N, "unit": "...", "queries": {...}, "sf": ...}

The authoritative metric (BASELINE.json) is tiles/sec — H3 cells fully
classified (pass1..shadow-match..finalize) per second. Other headline
queries are reported as per-query seconds.

Scaling protocol (BASELINE.md): run with SPARK_GRAFT_CPUS=8 and =32 on
identical input; efficiency = (T32/T8)/4. See bench_scaling.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from python_fmask_spark import oracle, pipeline  # noqa: E402
from python_fmask_spark.dialect import SPARK  # noqa: E402
from python_fmask_spark.session import get_spark  # noqa: E402
from python_fmask_spark.sources import register_views  # noqa: E402


def run_bench(spark, sf_dir: str, replicate: int = 1) -> dict:
    register_views(spark, sf_dir)
    queries: dict[str, float] = {}
    n_cells = 0

    # q1: pass1 classification counts (scan -> project -> filter -> agg)
    t0 = time.perf_counter()
    spark.sql(oracle.q_pass1_cell_counts(SPARK)).collect()
    queries["q1_pass1_counts"] = time.perf_counter() - t0

    # q2: thresholds (histogram percentile aggregation per cell,
    # via the materialized pass-1 leaf)
    t0 = time.perf_counter()
    view = pipeline.materialize_pass1(spark)
    spark.sql(pipeline.tail_sql_from_pass1(
        view, "thresholds", "SELECT * FROM thresholds")).collect()
    queries["q2_thresholds"] = time.perf_counter() - t0

    # q3: interim class via the tiled-kernel path (halo exchange)
    t0 = time.perf_counter()
    pipeline.interim_class_kernel(spark).count()
    queries["q3_interim_class_kernel"] = time.perf_counter() - t0

    # q4 (headline): FULL classify incl. shadow chain, kernel path
    t0 = time.perf_counter()
    out = pipeline.classify(spark)
    rows = out.groupBy("cell_id").count().collect()
    queries["q4_full_classify"] = time.perf_counter() - t0
    n_cells = len(rows)

    # q5: minhash-LSH dedup pairs
    from python_fmask_spark.functions import dedup, similarity
    t0 = time.perf_counter()
    spark.sql(dedup.q_minhash_pairs(SPARK)).count()
    queries["q5_minhash_pairs"] = time.perf_counter() - t0

    # q6: brute-force cosine top-k over embeddings
    t0 = time.perf_counter()
    spark.sql(similarity.q_ann_bruteforce(SPARK)).count()
    queries["q6_ann_bruteforce"] = time.perf_counter() - t0

    tiles_per_sec = n_cells / queries["q4_full_classify"]
    return {
        "metric": "tiles/sec (H3 cell classify+join throughput)",
        "value": round(tiles_per_sec, 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in queries.items()},
        "sf": sf_dir,
        "n_cells": n_cells,
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="fmask-bench")
    try:
        result = run_bench(spark, sf_dir)
        print(json.dumps(result))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
