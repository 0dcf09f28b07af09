"""Stage-level profile of the q4 headline (full classify) at sf0.1.

Times: pass-1 materialization, pass-3 tail (with/without angle DN
columns), kernel stage, and the text_sha256 url join-back vs carrying
the digest through the kernel.
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from python_fmask_spark import pipeline  # noqa: E402
from python_fmask_spark.operators.scene import (  # noqa: E402
    SCENE_OUT_SCHEMA,
    FmaskParams,
    classify_scene,
)
from python_fmask_spark.session import ensure_package_on_executors, get_spark  # noqa: E402
from python_fmask_spark.sources import register_views  # noqa: E402

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(app_name="profile-q4")
register_views(spark, sf_dir)
ensure_package_on_executors(spark)


def t(label, fn):
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    print(f"{label:45s} {dt:7.2f}s  {out}")
    return dt


# warm the JVM + parquet footer caches once
spark.sql("SELECT count(*) FROM documents").collect()

t("A. materialize_pass1 (plan+exec+checkpoint)",
  lambda: pipeline.materialize_pass1(spark))

t("B. pass3_df full collect-count",
  lambda: pipeline.pass3_df(spark).count())

params = FmaskParams()


def kernel(pdf):
    return classify_scene(pdf, params)


def classify_nojoin():
    p3 = pipeline.pass3_df(spark)
    out = (p3.drop("text_sha256").groupBy("cell_id")
           .applyInPandas(kernel, schema=SCENE_OUT_SCHEMA))
    return out.groupBy("cell_id").count().count()


def classify_join():
    out = pipeline.classify(spark)
    return out.groupBy("cell_id").count().count()


t("C. kernel stage only (no join-back)", classify_nojoin)
t("D. full classify (with url join-back)", classify_join)
t("D2. full classify again (warm)", classify_join)
spark.stop()
