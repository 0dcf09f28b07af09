#!/usr/bin/env python
"""Two-parallelism scaling evidence (BASELINE.md protocol).

Phase 0 (untimed, shared): derive pass-3 pixel columns for a
deterministic xREPLICATE expansion of the documents table and
materialize them to parquet — this is the serial Catalyst-planning-heavy
part and is identical input for both runs.

Phase 1 (timed, per level): on a fresh JVM at local[N], run the tiled
morphology + scene classification over the materialized pixels and
count the output. Throughput = tiles/sec; efficiency = (T_lo/T_hi) /
(hi/lo). This mirrors a cluster resize: same data, same plan, only the
executor count changes.

Usage: python bench_scaling.py [--sf DIR] [--replicate 64]
       [--levels 8,32] [--write-md]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

PREP = r'''
import sys, time
sys.path.insert(0, "/root/repo")
from python_fmask_spark.session import get_spark
from python_fmask_spark.sources import load_documents_wide
from python_fmask_spark import derive
from python_fmask_spark.dialect import SPARK

sf, rep, out = sys.argv[1], int(sys.argv[2]), sys.argv[3]
cell_deg = float(sys.argv[4])
spark = get_spark(master="local[16]", app_name="scaleprep")
docs = load_documents_wide(spark, sf, replicate=rep)
docs.createOrReplaceTempView("documents_wide")
ctes = ",\n".join([
    derive.features_sql(SPARK, "SELECT * FROM documents_wide",
                        cell_deg=cell_deg),
    derive.pass1_sql(SPARK), derive.thresholds_sql(SPARK),
    derive.pass2_sql(SPARK), derive.pass3_sql(SPARK),
])
spark.sql("WITH " + ctes + """
  SELECT url, cell_id, r, c, sha2(text, 256) AS text_sha256, nir, bt, nullmask, water_test, snow,
         cloud_raw, g_tlow, g_thigh, g_b4_17,
         sun_az, sun_zen, sat_az, sat_zen, sat_az_cdn, sat_zen_cdn
  FROM pass3""").write.mode("overwrite").parquet(out)
spark.stop()
print("PREP_DONE")
'''

WORKER = r'''
import json, os, sys, time
sys.path.insert(0, "/root/repo")
if len(sys.argv) > 3 and sys.argv[3]:
    os.environ["SPARK_GRAFT_EVENTLOG"] = sys.argv[3]
from python_fmask_spark.session import get_spark
from python_fmask_spark import tiling
from python_fmask_spark.operators import kernels
from python_fmask_spark.operators.scene import (DIM_COLS, FmaskParams,
                                                PX_EXCHANGE_SQL,
                                                SCENE_OUT_SCHEMA_SLIM,
                                                scene_cogroup_kernel)
from python_fmask_spark import constants as C
import pyspark.sql.functions as F

cpus, path = int(sys.argv[1]), sys.argv[2]
mode = sys.argv[4] if len(sys.argv) > 4 else "local"
if mode == "cluster":
    # multi-executor resize on one box: N separate executor JVMs x 8
    # cores, each with its own heap/GC domain — the shape of a real
    # N -> 4N cluster resize (vs local[N], where 4x concurrency shares
    # ONE JVM and GC/allocator contention inflates per-task CPU).
    n_exec = max(1, cpus // 8)
    exec_mem = os.environ.get("SPARK_GRAFT_EXEC_MEM_MB", "16384")
    master = f"local-cluster[{n_exec},8,{exec_mem}]"
else:
    master = f"local[{cpus}]"
spark = get_spark(master=master, app_name=f"scal{cpus}",
                  shuffle_partitions=max(cpus * 4, 32))
p3 = spark.read.parquet(path)
# warmup: spin up ALL python workers + JIT with a small haloed kernel
# pass over a sample, so worker startup is excluded from the timing
from python_fmask_spark import tiling as _t
from python_fmask_spark.operators import kernels as _k
_t.tiled_neighborhood(p3.sample(0.02, seed=1), _k.majority3_buffer,
                      "cloud_raw", "w", radius=1).count()

params = FmaskParams()
spark.sparkContext.setJobGroup("morph", "tiled morphology")
t0 = time.perf_counter()
# tiled morphology: ONE fused halo pass (majority + mask + dilation),
# mirroring pipeline.interim_class_kernel's plan
def fused(slabs):
    maj = kernels.majority3_buffer(slabs["cloud_raw"])
    cloud_m = maj & ~slabs["nullmask"]
    return {"cloudbuf": maj, "cloud_m": cloud_m,
            "clouddil": kernels.dilate(cloud_m, params.cloud_buffer_px)}
# carry_url=False: url (the largest exchanged column, pure passthrough
# here) no longer rides the halo sort — the mask product stays keyed by
# (cell_id, r, c); the pipeline's per-url export join is measured in
# the scene stage below, where it replaces the old url-keyed digest
# join (measured cost-neutral; a 41M-row identity SMJ added here on
# top of the kernel would instead DOUBLE morph wall — tried, rejected)
dil = tiling.tiled_neighborhood_multi(
    p3.drop("text_sha256", "url"), fused,
    in_cols=("cloud_raw", "nullmask"),
    out_cols=("cloudbuf", "cloud_m", "clouddil"),
    radius=1 + int(params.cloud_buffer_px),
    passthrough=("water_test", "snow"),
    carry_url=False)
n_morph = dil.count()
wall_morph = time.perf_counter() - t0
# descriptive stats outside the timed region
stats = dil.selectExpr(
    "count(*) AS n_rows",
    "count(distinct cell_id) AS n_cells",
    # reporting unit: 32-row tiles (stable across rounds even though the
    # execution tile grain C.TILE_SIZE may differ)
    "count(distinct concat(cell_id, '#', cast(r div 32 as string))) AS n_tiles",
).collect()[0]

# full scene classify (shadow chain) from the same input via the SLIM
# exchange (pipeline.classify plan shape): 8-field bit-packed pixel
# frame through the groupBy sort, per-cell constants cogrouped as a
# 1-row dim, url + digest joined back JVM-side on (cell_id, r, c)
spark.sparkContext.setJobGroup("scene", "scene classify")
t1 = time.perf_counter()
p3.createOrReplaceTempView("p3bench")
px = spark.sql("SELECT " + PX_EXCHANGE_SQL + " FROM p3bench")
dims = spark.sql(
    "SELECT cell_id, "
    + ", ".join("first({0}) AS {0}".format(k) for k in DIM_COLS)
    + " FROM p3bench GROUP BY cell_id")
scene_out = (px.groupBy("cell_id")
             .cogroup(dims.groupBy("cell_id"))
             .applyInPandas(scene_cogroup_kernel(params),
                            schema=SCENE_OUT_SCHEMA_SLIM)
             .join(p3.select("cell_id", "r", "c", "url", "text_sha256"),
                   ["cell_id", "r", "c"]))
n_out = scene_out.count()
wall_scene = time.perf_counter() - t1

wall = wall_morph + wall_scene
print(json.dumps({"cpus": cpus, "wall_sec": round(wall, 3),
                  "wall_morph_sec": round(wall_morph, 3),
                  "wall_scene_sec": round(wall_scene, 3),
                  "n_rows": stats.n_rows, "n_cells": stats.n_cells,
                  "n_tiles": stats.n_tiles, "n_out": n_out,
                  "tiles_per_sec": round(stats.n_tiles / wall, 3)}))
spark.stop()
evdir = os.environ.get("SPARK_GRAFT_EVENTLOG")
if evdir:
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "stage_metrics", "/root/repo/scripts/stage_metrics.py")
    sm = importlib.util.module_from_spec(spec); spec.loader.exec_module(sm)
    log = sm.newest_log(evdir)
    if log:
        print("STAGES " + json.dumps(sm.parse_event_log(log)[:10]))
'''


def _run(code: str, args: list[str], timeout: int = 2400,
         taskset_cpus: int | None = None) -> str:
    """Run a worker subprocess; taskset pins it to the first N CPUs so a
    local[N] run is bounded like a real N-core executor (otherwise GC,
    shuffle IO and Python workers silently use every core and the
    low-parallelism run is unrealistically fast)."""
    cmd = [sys.executable, "-c", code, *args]
    if taskset_cpus is not None:
        cmd = ["taskset", "-c", f"0-{taskset_cpus - 1}", *cmd]
    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_EXEC_MEM_MB", str(EXEC_MEM_MB[0]))
    # local mode: executors live in the driver JVM — window sorts over
    # 40M+ rows need real heap. Cluster mode: tasks run in executor
    # JVMs; an oversized driver only steals page cache from them.
    env.setdefault("SPARK_GRAFT_DRIVER_MEM",
                   "12g" if "cluster" in args else "48g")
    out = subprocess.run(cmd,
                         capture_output=True, text=True, timeout=timeout,
                         cwd="/root/repo", env=env)
    if out.returncode != 0:
        # local-cluster teardown is racy: the Worker's shutdown RPC can
        # crash the JVM AFTER the measurement JSON was printed. Accept
        # the run when its result line made it out; fail otherwise.
        if any(ln.startswith("{") for ln in out.stdout.splitlines()):
            return out.stdout
        raise RuntimeError(f"subprocess failed: {out.stderr[-2000:]}")
    return out.stdout


EXEC_MEM_MB = [16384]  # set from --exec-mem-mb in main()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--replicate", type=int, default=256)
    ap.add_argument("--cell-deg", type=float, default=10.0)
    ap.add_argument("--levels", default="8,32")
    ap.add_argument("--repeats", type=int, default=1,
                    help="block design: runs per level, min wall kept "
                         "(the box is multi-tenant — min is the least-"
                         "contended run). --interleave: number of "
                         "(lo,hi) PAIRS; each reported leg is the "
                         "single run from the median-efficiency pair")
    ap.add_argument("--write-md", action="store_true")
    ap.add_argument("--prep-cache", default="",
                    help="directory to cache the (sf, replicate, "
                         "cell_deg)-keyed pass-3 materialization across "
                         "invocations (prep is deterministic)")
    ap.add_argument("--exec-mem-mb", type=int, default=16384,
                    help="per-executor memory in cluster mode")
    ap.add_argument("--mode", choices=("local", "cluster"),
                    default="local",
                    help="'cluster' = local-cluster[N,8,16g]: N separate "
                         "executor JVMs (true executor-count resize, "
                         "per-executor GC domains); 'local' = local[N] "
                         "single shared JVM")
    ap.add_argument("--stage-metrics", action="store_true",
                    help="attach per-stage task metrics (shuffle bytes, "
                         "spill, GC, task-time histogram) from the Spark "
                         "event log to each run")
    ap.add_argument("--interleave", action="store_true",
                    help="ABBA design: run the two levels in ADJACENT "
                         "alternating pairs (lo,hi / hi,lo / ...) and "
                         "report per-pair efficiency plus the median. "
                         "The box's bus window decorrelates on roughly "
                         "one run's timescale (r5 probes), so the "
                         "default block design — all lo runs, then all "
                         "hi runs — compares legs from DIFFERENT "
                         "windows; pairing in time removes that "
                         "nuisance covariate and the order flip "
                         "cancels first-order drift within each pair")
    args = ap.parse_args()
    EXEC_MEM_MB[0] = args.exec_mem_mb
    if args.prep_cache:
        os.makedirs(args.prep_cache, exist_ok=True)
    lo, hi = (int(x) for x in args.levels.split(","))

    with tempfile.TemporaryDirectory() as td:
        if args.prep_cache:
            key = (f"{os.path.basename(args.sf)}_r{args.replicate}"
                   f"_d{args.cell_deg}")
            p3path = os.path.join(args.prep_cache, key)
            if not os.path.exists(os.path.join(p3path, "_SUCCESS")):
                _run(PREP, [args.sf, str(args.replicate), p3path,
                            str(args.cell_deg)])
        else:
            p3path = os.path.join(td, "pass3")
            _run(PREP, [args.sf, str(args.replicate), p3path,
                        str(args.cell_deg)])
        def one_run(cpus: int, tag: str) -> dict:
            evdir = (os.path.join(td, f"ev_{tag}")
                     if args.stage_metrics else "")
            stdout = _run(WORKER, [str(cpus), p3path, evdir, args.mode],
                          taskset_cpus=cpus)
            line = [ln for ln in stdout.splitlines()
                    if ln.startswith("{")]
            run = json.loads(line[-1])
            st = [ln for ln in stdout.splitlines()
                  if ln.startswith("STAGES ")]
            if st:
                run["stages"] = json.loads(st[-1][len("STAGES "):])
            return run

        pairs = []
        if args.interleave:
            for pair_i in range(args.repeats):
                order = (lo, hi) if pair_i % 2 == 0 else (hi, lo)
                got = {c: one_run(c, f"{c}_{pair_i}") for c in order}
                pairs.append({
                    "order": f"{order[0]},{order[1]}",
                    "lo": got[lo], "hi": got[hi],
                    "efficiency": round(
                        got[lo]["wall_sec"] / got[hi]["wall_sec"]
                        / (hi / lo), 3),
                })
            # true median efficiency (mean of the two middle pairs when
            # the count is even — upper-median would systematically pick
            # the better pair and reintroduce the drift bias the ABBA
            # order flip cancels)
            effs = sorted(p["efficiency"] for p in pairs)
            n = len(effs)
            med_eff = (effs[n // 2] if n % 2 == 1
                       else round((effs[n // 2 - 1] + effs[n // 2]) / 2, 3))
            # representative legs for the summary row: the pair whose
            # efficiency is closest to the median (time-adjacent, same
            # bus window); n_runs=1 — each leg is that single run, NOT
            # a min-of-N
            mid = min(pairs, key=lambda p: abs(p["efficiency"] - med_eff))
            results = {lo: dict(mid["lo"], n_runs=1),
                       hi: dict(mid["hi"], n_runs=1)}
        else:
            results = {}
            for cpus in (lo, hi):
                best = None
                for rep_i in range(args.repeats):
                    run = one_run(cpus, f"{cpus}_{rep_i}")
                    if best is None or run["wall_sec"] < best["wall_sec"]:
                        best = run
                best["n_runs"] = args.repeats
                results[cpus] = best

    ratio = results[lo]["wall_sec"] / results[hi]["wall_sec"]
    eff = ratio / (hi / lo)
    result = {
        "metric": f"scaling efficiency (T{lo}/T{hi})/{hi // lo}",
        "value": round(eff, 3),
        "unit": "ratio",
        "runs": {str(k): v for k, v in results.items()},
        "speedup": round(ratio, 3),
        "sf": args.sf,
        "replicate": args.replicate,
        "mode": args.mode,
    }
    if args.interleave:
        result["design"] = "interleaved-ABBA"
        result["pair_efficiencies"] = [p["efficiency"] for p in pairs]
        result["pair_orders"] = [p["order"] for p in pairs]
        result["value"] = med_eff
    print(json.dumps(result))
    if args.write_md:
        os.makedirs("/root/repo/BENCH", exist_ok=True)
        md = "/root/repo/BENCH/BASELINE.md"
        new = not os.path.exists(md)
        with open(md, "a") as f:
            if new:
                f.write("# BENCH/BASELINE — two-parallelism scaling "
                        "evidence\n\n"
                        "| levels | tiles/sec | speedup | efficiency | "
                        "config |\n|---|---|---|---|---|\n")
            design = ""
            if args.interleave:
                design = ("design=interleaved-ABBA pair_effs="
                          + ",".join(str(p["efficiency"]) for p in pairs)
                          + " (median pair shown) ")
            f.write(
                f"| local[{lo}] vs local[{hi}] | "
                f"{results[lo]['tiles_per_sec']} vs "
                f"{results[hi]['tiles_per_sec']} | {ratio:.2f}x | "
                f"{result['value']:.3f} | {design}mode={args.mode} sf={args.sf} rep={args.replicate} cell_deg={args.cell_deg} "
                f"tiles={results[hi]['n_tiles']} "
                f"rows={results[hi]['n_rows']} "
                f"morph={results[lo]['wall_morph_sec']}/"
                f"{results[hi]['wall_morph_sec']}s "
                f"scene={results[lo]['wall_scene_sec']}/"
                f"{results[hi]['wall_scene_sec']}s |\n")


if __name__ == "__main__":
    main()
