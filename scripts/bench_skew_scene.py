"""Straggler evidence for the clump-parallel classify (VERDICT r2 #3).

Builds a deliberately skewed input — cell_deg=90 collapses the corpus
into a handful of mega-cells — and runs (a) the whole-cell scene kernel
(pipeline.classify plan shape: one task per cell) and (b)
classify_distributed (bounded task grain), reporting wall time and the
scene-stage max task time from the event log for each.

Usage: python scripts/bench_skew_scene.py [replicate]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REP = sys.argv[1] if len(sys.argv) > 1 else "256"

WORKER = r'''
import json, os, sys, time
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
mode, rep, evdir = sys.argv[1], int(sys.argv[2]), sys.argv[3]
os.environ["SPARK_GRAFT_EVENTLOG"] = evdir
from python_fmask_spark.session import get_spark, ensure_package_on_executors
from python_fmask_spark.sources import load_documents_wide
from python_fmask_spark import derive, pipeline
from python_fmask_spark.dialect import SPARK
from python_fmask_spark.operators.scene import (FmaskParams,
                                                SCENE_OUT_SCHEMA,
                                                classify_scene)

spark = get_spark(app_name=f"skew-{mode}")
ensure_package_on_executors(spark)
docs = load_documents_wide(spark, "/root/testdata/sf0.01", replicate=rep)
docs.createOrReplaceTempView("documents_wide_src")
# cell_deg=90 -> <=8 mega-cells for the whole corpus (Zipf extreme)
spark.sql("DROP VIEW IF EXISTS documents")
ctes = ",\n".join([
    derive.features_sql(SPARK, "SELECT * FROM documents_wide_src",
                        cell_deg=90.0),
    derive.pass1_sql(SPARK), derive.thresholds_sql(SPARK),
    derive.pass2_sql(SPARK), derive.pass3_sql(SPARK),
])
cols = ", ".join((*pipeline._KERNEL_COLS, "cell_rows"))
p3 = spark.sql("WITH " + ctes + f" SELECT {cols} FROM pass3") \
    .localCheckpoint()
p3.createOrReplaceTempView("_skew_p3")
n = p3.count()

spark.sparkContext.setJobGroup("scene", "scene")
t0 = time.perf_counter()
if mode == "wholecell":
    params = FmaskParams()
    out = (p3.groupBy("cell_id")
           .applyInPandas(lambda pdf: classify_scene(pdf, params),
                          schema=SCENE_OUT_SCHEMA))
    n_out = out.count()
elif mode == "distributed":
    from python_fmask_spark.operators.scene_dist import classify_distributed
    digests = spark.sql("SELECT url, 'x' AS text_sha256 FROM _skew_p3")
    out = classify_distributed(spark, p3=p3, digests=digests)
    n_out = out.count()
else:  # auto: cost-based dispatch (pipeline.classify_auto p3 path)
    digests = spark.sql("SELECT url, 'x' AS text_sha256 FROM _skew_p3")
    out = pipeline.classify_auto(spark, p3=p3, digests=digests)
    n_out = out.count()
wall = time.perf_counter() - t0
spark.stop()

import importlib.util
spec = importlib.util.spec_from_file_location(
    "stage_metrics", "/root/repo/scripts/stage_metrics.py")
sm = importlib.util.module_from_spec(spec); spec.loader.exec_module(sm)
stages = sm.parse_event_log(sm.newest_log(evdir))
scene = [s for s in stages if s["group"] == "scene"]
max_task = max((s["max_task_ms"] for s in scene), default=0)
print(json.dumps({"mode": mode, "rows": n, "out": n_out,
                  "wall_sec": round(wall, 2),
                  "scene_max_task_ms": max_task,
                  "scene_stages": len(scene)}))
'''


def main() -> None:
    results = {}
    for mode in ("wholecell", "distributed", "auto"):
        with tempfile.TemporaryDirectory() as ev:
            out = subprocess.run(
                [sys.executable, "-c", WORKER, mode, REP, ev],
                capture_output=True, text=True, timeout=2400,
                cwd="/root/repo", env={**os.environ,
                                       "SPARK_GRAFT_DRIVER_MEM": "24g"})
            if out.returncode != 0:
                raise RuntimeError(out.stderr[-3000:])
            line = [ln for ln in out.stdout.splitlines()
                    if ln.startswith("{")][-1]
            results[mode] = json.loads(line)
    print(json.dumps({
        "metric": "scene-stage max task ms, mega-cell skew "
                  "(wholecell vs clump-parallel vs auto dispatch)",
        "wholecell": results["wholecell"],
        "distributed": results["distributed"],
        "auto": results["auto"],
        "max_task_ratio": round(
            results["wholecell"]["scene_max_task_ms"]
            / max(1, results["distributed"]["scene_max_task_ms"]), 2),
    }))


if __name__ == "__main__":
    main()
