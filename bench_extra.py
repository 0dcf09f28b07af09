#!/usr/bin/env python
"""Side benchmark + plan capture for optimization rounds (guide §1).

NOT the driver's bench: bench.py stays frozen. This file isolates each
headline query with the noop sink (times the computation, not collect),
labels jobs, and dumps .explain("formatted") per query to plans/r06/.

Usage:
  python bench_extra.py [--plans SUFFIX] [--repeat N] [--only q5,q6]
    --plans before   -> writes plans/r06/<query>_before.txt
    --plans after    -> writes plans/r06/<query>_after.txt
    (no --plans: timing only)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from python_fmask_spark import oracle, pipeline  # noqa: E402
from python_fmask_spark.dialect import SPARK  # noqa: E402
from python_fmask_spark.session import get_spark  # noqa: E402
from python_fmask_spark.sources import register_views  # noqa: E402


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--plans", default=None)
    ap.add_argument("--repeat", type=int, default=2)
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="fmask-bench-extra")
    from python_fmask_spark.functions import dedup, similarity

    register_views(spark, sf_dir)
    view = pipeline.materialize_pass1(spark)
    pipeline.materialize_thresholds(spark)

    def q1():
        return spark.sql(oracle.q_pass1_cell_counts(SPARK))

    def q2():
        return spark.sql(pipeline.tail_sql_from_pass1(
            view, "thresholds", "SELECT * FROM thresholds"))

    def q3():
        return pipeline.interim_class_kernel(spark)

    def q4():
        return pipeline.classify(spark)

    def q5():
        return spark.sql(dedup.q_minhash_pairs(SPARK))

    def q6():
        return spark.sql(similarity.q_ann_bruteforce(SPARK))

    benches = {
        "q1_pass1_counts": q1,
        "q2_thresholds": q2,
        "q3_interim_class_kernel": q3,
        "q4_full_classify": q4,
        "q5_minhash_pairs": q5,
        "q6_ann_bruteforce": q6,
    }
    if args.only:
        keep = {k.strip() for k in args.only.split(",")}
        benches = {k: v for k, v in benches.items()
                   if k in keep or k.split("_")[0] in keep}

    plans_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "plans", "r06")
    if args.plans:
        os.makedirs(plans_dir, exist_ok=True)

    out: dict[str, list[float]] = {}
    for name, fn in benches.items():
        if args.plans:
            df = fn()
            p = os.path.join(plans_dir,
                             f"{name}_{args.plans}.txt")
            with open(p, "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        walls = []
        for i in range(args.repeat + 1):
            spark.sparkContext.setJobDescription(f"{name} run{i}")
            t0 = time.perf_counter()
            noop(fn())
            walls.append(round(time.perf_counter() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out[name] = walls  # [cold, steady...]
        print(json.dumps({name: walls}), flush=True)
    print(json.dumps({"noop_walls": out, "sf": sf_dir}))
    spark.stop()


if __name__ == "__main__":
    main()
