"""End-to-end fmask classification pipeline, Spark-first.

Plan shape:
  parquet scan (pruned columns)
    -> declarative pass1/pass2/pass3 (single Catalyst plan; per-cell
       threshold dim tables joined back — no driver collect barrier)
    -> shuffle by cell_id -> applyInPandas scene kernel (Arrow batches)

The three reference "passes" are one Catalyst plan here: Spark's optimizer
sees through the CTE chain, pushes the parquet column pruning, and keeps
all scalar math in whole-stage codegen. Only the genuinely spatial tail
(fill-minima, clumps, shadow match) runs in NumPy kernels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import derive
from .dialect import SPARK
from .operators.scene import SCENE_OUT_SCHEMA, FmaskParams, classify_scene
from .session import ensure_package_on_executors

# Columns the scene kernel needs (everything else is pruned before the
# shuffle — keep the exchanged bytes minimal).
# text itself is NOT shuffled through the kernels — its sha256 is
# computed JVM-side before the exchange (byte-identity travels as a
# 64-char digest instead of the full document body).
_KERNEL_COLS = ("url", "cell_id", "r", "c",
                "sha2(text, 256) AS text_sha256", "nir", "bt",
                "nullmask", "water_test", "snow", "cloud_raw",
                "g_tlow", "g_thigh", "g_b4_17",
                "sun_az", "sun_zen", "sat_az", "sat_zen",
                "sat_az_cdn", "sat_zen_cdn")


def pass3_sql(table: str = "documents") -> str:
    ctes = ",\n".join([
        derive.features_sql(SPARK, derive.documents_wide_sql(SPARK, table)),
        derive.pass1_sql(SPARK),
        derive.thresholds_sql(SPARK),
        derive.pass2_sql(SPARK),
        derive.pass3_sql(SPARK),
    ])
    cols = ", ".join(_KERNEL_COLS)
    return f"WITH {ctes} SELECT {cols} FROM pass3"


def materialize_pass1(spark: SparkSession, table: str = "documents") -> str:
    """Materialize pass 1 behind a leaf view and return the view name.

    Catalyst inlines deterministic CTEs per reference; the thresholds +
    pass2 + pass3 chain references pass1 six-plus times, so a single
    giant plan's optimization time explodes combinatorially.
    localCheckpoint truncates the lineage to a LogicalRDD leaf — the
    reference's own inter-pass temp-raster pattern
    (fmask/fmask.py:206-216 / SURVEY S12) — making every downstream plan
    small and linear to optimize."""
    view = f"_pass1_mat_{table}"
    p1_ctes = ",\n".join([
        derive.features_sql(SPARK, derive.documents_wide_sql(SPARK, table)),
        derive.pass1_sql(SPARK),
    ])
    p1 = spark.sql(f"WITH {p1_ctes} SELECT * FROM pass1").localCheckpoint()
    p1.createOrReplaceTempView(view)
    return view


def tail_sql_from_pass1(pass1_view: str, upto: str, select: str) -> str:
    """Thresholds/pass2/pass3 CTE chain over a materialized pass-1 view."""
    builders = [f"pass1 AS (SELECT * FROM {pass1_view})",
                derive.thresholds_sql(SPARK)]
    if upto in ("pass2", "pass3"):
        builders.append(derive.pass2_sql(SPARK))
    if upto == "pass3":
        builders.append(derive.pass3_sql(SPARK))
    ctes = ",\n".join(builders)
    return f"WITH {ctes} {select}"


def pass3_df(spark: SparkSession, table: str = "documents") -> DataFrame:
    view = materialize_pass1(spark, table)
    cols = ", ".join(_KERNEL_COLS)
    return spark.sql(tail_sql_from_pass1(
        view, "pass3", f"SELECT {cols} FROM pass3"))


def interim_class_kernel(spark: SparkSession, table: str = "documents",
                         params: FmaskParams | None = None) -> DataFrame:
    """Interim classification (no shadow chain) via the tiled-kernel path:
    pass3 columns -> tiled 3x3 majority (halo 1) -> tiled circular
    dilation (halo = buffer radius) -> precedence CASE. Matches the
    declarative SQL oracle bit-for-bit (driver-checked) while running the
    morphology tile-parallel — the 100-TB plan shape."""
    from pyspark.sql import functions as F

    from . import tiling
    from .operators import kernels

    params = params or FmaskParams()
    # persist: with_halo unions three projections of its input — without
    # a materialization point Spark recomputes the whole pass-1..3
    # derivation once per branch (and 9x after the second kernel stage).
    p3 = pass3_df(spark, table).select(
        "url", "cell_id", "r", "c", "text_sha256", "nullmask",
        "water_test", "snow", "cloud_raw").localCheckpoint()

    maj = tiling.tiled_neighborhood(
        p3, kernels.majority3_buffer, "cloud_raw", "cloudbuf", radius=1,
        passthrough=("text_sha256", "nullmask", "water_test", "snow"))
    maj = maj.withColumn("cloud_m",
                         F.expr("cloudbuf AND NOT nullmask"))

    rad = int(params.cloud_buffer_px)

    def dil(a):
        return kernels.dilate(a, params.cloud_buffer_px)

    dilated = tiling.tiled_neighborhood(
        maj, dil, "cloud_m", "clouddil", radius=rad,
        passthrough=("text_sha256", "nullmask", "water_test", "snow",
                     "cloud_raw"))
    return dilated.select(
        "url", "cell_id", "r", "c", "cloud_raw", "cloud_m", "clouddil",
        "nullmask", "water_test", "snow", "text_sha256",
        F.expr(f"""cast(case
            when nullmask then {0}
            when clouddil then {2}
            when snow then {4}
            when water_test then {5}
            else {1} end as int)""").alias("fmask_class"))


def classify(spark: SparkSession, table: str = "documents",
             params: FmaskParams | None = None) -> DataFrame:
    """Full classification: returns (url, cell_id, r, c, fmask_class,
    cloud_id, text). ``table`` must be a registered view with the raw
    documents schema."""
    params = params or FmaskParams()
    ensure_package_on_executors(spark)
    p3 = pass3_df(spark, table)

    def kernel(pdf):
        return classify_scene(pdf, params)

    return p3.groupBy("cell_id").applyInPandas(kernel, schema=SCENE_OUT_SCHEMA)
