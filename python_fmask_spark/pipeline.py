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
# text (and its sha256 digest) is NOT shuffled through the kernels —
# the digest is joined back afterwards from the materialized pass-1
# stage table (see text_digests), so byte-identity never rides the
# Arrow exchange at all.
_KERNEL_COLS = ("url", "cell_id", "r", "c", "nir", "bt",
                "nullmask", "water_test", "snow", "cloud_raw",
                "g_tlow", "g_thigh", "g_b4_17",
                "sun_az", "sun_zen", "sat_az", "sat_zen",
                "sat_az_cdn", "sat_zen_cdn")

# the pass-1-LEVEL subset of _KERNEL_COLS (cloud_raw / g_* are computed
# by pass 2/3; the rest either ride through or are formula deps added
# by tail_sql_from_pass1 itself)
_KERNEL_P1_COLS = ("url", "r", "c", "nir", "snow",
                   "sun_az", "sun_zen", "sat_az", "sat_zen",
                   "sat_az_cdn", "sat_zen_cdn")


def pass1_sql_text(table: str = "documents", sensor: str = "LANDSAT8",
                   s2_offsets: dict[str, int] | None = None,
                   tile_meta=None,
                   nir_snow_thresh: float | None = None,
                   green_snow_thresh: float | None = None) -> str:
    """The rendered pass-1 SQL (features + pass1 CTEs). Also serves as
    the logic component of resumable-stage fingerprints: any change to
    the derive formulas, sensor dispatch, offsets, or the Eqn-20 snow
    knobs changes this text and therefore invalidates StageRunner stage
    tables."""
    p1_ctes = ",\n".join([
        derive.features_sql(SPARK, derive.documents_wide_sql(SPARK, table),
                            tile_meta=tile_meta),
        derive.pass1_sql(SPARK, sensor=sensor, s2_offsets=s2_offsets,
                         nir_snow_thresh=nir_snow_thresh,
                         green_snow_thresh=green_snow_thresh),
    ])
    return f"WITH {p1_ctes} SELECT * FROM pass1"


def stage_fingerprint(spark: SparkSession, logic: str) -> str:
    """Fingerprint for StageRunner stage tables: sha256 over the logic
    identity (rendered SQL / params repr) PLUS the session's registered
    input identity (sources.registered_input_identity — sf_dir +
    per-file mtime/size). Resuming in the same workdir after either the
    logic or the input data changed re-runs the stage instead of
    silently reusing a stale table."""
    import hashlib

    from .sources import registered_input_identity
    ident = registered_input_identity(spark)
    return hashlib.sha256(f"{ident}||{logic}".encode()).hexdigest()[:16]


def text_digests(spark: SparkSession, table: str = "documents") -> DataFrame:
    """(url, text_sha256) — the byte-identity invariant, computed from
    the materialized pass-1 stage table (a LogicalRDD leaf), NOT by
    re-running the threshold/pass2/pass3 tail a second time."""
    view = materialize_pass1(spark, table)
    return spark.sql(
        f"SELECT url, sha2(text, 256) AS text_sha256 FROM {view}")


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


# session -> {table: materialized view name}. The pass-1 stage table
# is immutable for a given registered input, so every query in a session
# shares ONE materialization (the reference's temp-raster reuse,
# fmask/fmask.py:206-216); sources.register_views invalidates it when
# the underlying input changes (including a rewrite of the parquet files
# at the same path — the register identity folds in file mtimes/sizes).
# WeakKeyDictionary on the session object: id(spark) integers can be
# recycled after a session is garbage-collected.
import weakref

_PASS1_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict[str, str]]" =     weakref.WeakKeyDictionary()


def invalidate_pass1_cache(spark: SparkSession) -> None:
    """Drop this session's materialized pass-1 views (called when the
    registered input tables change underneath them)."""
    for view in _PASS1_CACHE.pop(spark, {}).values():
        try:
            spark.catalog.dropTempView(view)
        except Exception:
            pass


def _snow_skey(nir_snow_thresh: float | None,
               green_snow_thresh: float | None) -> str:
    """Cache-key/view-name suffix for non-default Eqn-20 snow knobs: a
    knobbed pass-1 leaf must never alias the default one (the snow
    column differs row-by-row)."""
    if nir_snow_thresh is None and green_snow_thresh is None:
        return ""
    tag = f"_snow{nir_snow_thresh}x{green_snow_thresh}"
    return (tag.replace(".", "p").replace("-", "m")
            .replace("+", "e").replace("None", "d"))


def _offs_skey(s2_offsets: dict[str, int] | None) -> str:
    """Cache-key/view-name suffix for non-zero Sentinel-2 radiometric
    offsets: a leaf built with product-XML offsets must never alias the
    zero-offset leaf (every reflectance differs row-by-row). Empty for
    None/all-zero so the existing zero-offset view names are stable."""
    if not s2_offsets or not any(s2_offsets.values()):
        return ""
    import hashlib
    key = ",".join(f"{k}={s2_offsets[k]}" for k in sorted(s2_offsets))
    return "_off" + hashlib.sha256(key.encode()).hexdigest()[:8]


def materialize_pass1(spark: SparkSession, table: str = "documents",
                      reuse: bool = True, runner=None,
                      sensor: str = "LANDSAT8",
                      s2_offsets: dict[str, int] | None = None,
                      s2_cdi: bool = False,
                      tile_meta=None,
                      nir_snow_thresh: float | None = None,
                      green_snow_thresh: float | None = None) -> str:
    """Materialize pass 1 behind a leaf view and return the view name.

    Catalyst inlines deterministic CTEs per reference; the thresholds +
    pass2 + pass3 chain references pass1 six-plus times, so a single
    giant plan's optimization time explodes combinatorially.
    localCheckpoint truncates the lineage to a LogicalRDD leaf — the
    reference's own inter-pass temp-raster pattern
    (fmask/fmask.py:206-216 / SURVEY S12) — making every downstream plan
    small and linear to optimize.

    ``reuse=True`` returns the session's existing materialization when
    the registered input hasn't changed (register_views invalidates on
    change): the interim/classify/threshold queries all branch from the
    same stage table instead of re-deriving pass 1 per query.

    ``runner`` (a plans.lineage.StageRunner): write the materialization
    through a parquet/Iceberg stage table with lineage + fingerprint
    instead of localCheckpoint — the 100-TB shape (localCheckpoint pins
    executor memory/disk and dies with the session; a stage table
    survives restarts and makes classify resumable mid-pipeline). Both
    forms register the same leaf view name, so every downstream plan is
    identical either way."""
    skey = sensor + ("_cdi" if s2_cdi else "") \
        + ("_grid" if tile_meta is not None else "") \
        + _offs_skey(s2_offsets) \
        + _snow_skey(nir_snow_thresh, green_snow_thresh)
    suffix = "" if skey == "LANDSAT8" else f"_{skey.lower()}"
    view = f"_pass1_mat_{table}{suffix}"
    cache = _PASS1_CACHE.setdefault(spark, {})
    if reuse and runner is None and cache.get((table, skey)) == view \
            and spark.catalog.tableExists(view):
        return view
    if s2_cdi:
        # The reference applies the CDI displacement test INSIDE pass 1
        # when setSen2displacementTest is on (fmask/fmask.py:395-412):
        # pcp becomes the CDI-filtered PCP and everything downstream
        # (clear_land, the thresholds histograms, pass 2/3) consumes
        # it. Build the raw S2 pass-1 leaf, run the per-cell CDI kernel
        # over it, and replace pcp + its one dependent column.
        from pyspark.sql import functions as F

        from .sen2meta import require_s2_offsets
        if sensor != "SENTINEL2":
            raise ValueError("s2_cdi requires sensor='SENTINEL2' "
                             "(fmask/config.py:388-394)")
        offs = require_s2_offsets(s2_offsets)
        ensure_package_on_executors(spark)
        raw_view = materialize_pass1(spark, table, reuse=reuse,
                                     sensor=sensor, s2_offsets=s2_offsets,
                                     tile_meta=tile_meta,
                                     nir_snow_thresh=nir_snow_thresh,
                                     green_snow_thresh=green_snow_thresh)
        kout = (spark.sql(
            f"SELECT {_cdi_src_select(offs)} FROM {raw_view}")
            .groupBy("cell_id").applyInPandas(
                _cdi_kernel, schema=_CDI_OUT_SCHEMA)
            .select("cell_id", "r", "c",
                    F.expr("cast(pcp_final as boolean) AS _pcp_cdi")))
        mod = (spark.table(raw_view)
               .join(kout, ["cell_id", "r", "c"])
               .withColumn("pcp", F.col("_pcp_cdi"))
               .withColumn("clear_land", F.expr(
                   "NOT nullmask AND NOT pcp AND NOT water_test"))
               .drop("_pcp_cdi"))
        mod.localCheckpoint().createOrReplaceTempView(view)
        cache[(table, skey)] = view
        return view
    sql = pass1_sql_text(table, sensor=sensor, s2_offsets=s2_offsets,
                         tile_meta=tile_meta,
                         nir_snow_thresh=nir_snow_thresh,
                         green_snow_thresh=green_snow_thresh)
    if runner is not None:
        fp = stage_fingerprint(spark, f"{table}:{sql}")
        p1 = runner.run("pass1", fp, lambda: spark.sql(sql))
        p1.createOrReplaceTempView(view)
        # do NOT keep the session reuse cache pointing at this view: the
        # stage table lives in the runner's workdir, whose lifetime the
        # session does not control — a later cache hit would read a
        # deleted parquet. Evicting forces the next plain call to
        # rebuild its own localCheckpoint leaf.
        cache.pop((table, skey), None)
        return view
    p1 = spark.sql(sql).localCheckpoint()
    p1.createOrReplaceTempView(view)
    cache[(table, skey)] = view
    return view


# pass-1 columns the pass-2/pass-3 CTE formulas themselves consume
# (derive.pass2_sql / pass3_sql); everything else the caller doesn't
# name in ``pass1_cols`` can be projected away at the leaf.
_PASS23_DEPS = frozenset((
    "cell_id", "bt", "ref_swir1", "ref_cirrus", "variability_prob_pcnt",
    "clear_land", "pcp", "water_test", "nullmask"))


def tail_sql_from_pass1(pass1_view: str, upto: str, select: str,
                        sensor: str = "LANDSAT8",
                        thresholds_view: str | None = None,
                        eqn17_cloud_prob_thresh: float | None = None,
                        pass1_cols: tuple[str, ...] | None = None
                        ) -> str:
    """Thresholds/pass2/pass3 CTE chain over a materialized pass-1 view.

    ``thresholds_view`` substitutes a materialized thresholds leaf for
    the (textually large) thresholds CTE — Catalyst re-analyzes the
    window-function stack per consumer otherwise, which dominates wall
    time at small scale and is pure waste at any scale (thresholds is a
    per-cell dim, rows == cells). The Eqn-17 knob renders into the
    pass-2 landthr CTE fresh per query, so a non-default value composes
    with the session-cached pass-1/thresholds leaves (which it does not
    depend on).

    ``pass1_cols`` (r6): the pass-1-level columns the caller's final
    ``select`` needs. When given, the pass1 CTE projects to
    pass1_cols | _PASS23_DEPS instead of ``SELECT *`` — the pass-1 leaf
    is ~70 columns wide and every pass-2/3 layer re-projects ``p.*``,
    so the analyzer/optimizer otherwise drags the full width through
    every layer of every consumer's plan (guide §2.3 "project before
    the exchange" applied at plan-construction time). Requires ``upto``
    in (pass2, pass3); a name the formulas don't cover fails loudly at
    analysis."""
    if pass1_cols:
        need = set(pass1_cols) | _PASS23_DEPS
        if thresholds_view is None:
            # the inline thresholds CTE aggregates these off pass1
            need |= {"clear_sky_water", "scaled_bt_bin", "scaled_b4_bin"}
        p1_select = ", ".join(sorted(need))
    else:
        p1_select = "*"
    builders = [f"pass1 AS (SELECT {p1_select} FROM {pass1_view})",
                (f"thresholds AS (SELECT * FROM {thresholds_view})"
                 if thresholds_view
                 else derive.thresholds_sql(SPARK, sensor=sensor))]
    if upto in ("pass2", "pass3"):
        builders.append(derive.pass2_sql(
            SPARK, sensor=sensor,
            eqn17_cloud_prob_thresh=eqn17_cloud_prob_thresh))
    if upto == "pass3":
        builders.append(derive.pass3_sql(SPARK, sensor=sensor))
    ctes = ",\n".join(builders)
    return f"WITH {ctes} {select}"


def materialize_thresholds(spark: SparkSession, table: str = "documents",
                           sensor: str = "LANDSAT8",
                           s2_offsets: dict[str, int] | None = None,
                           s2_cdi: bool = False,
                           tile_meta=None,
                           nir_snow_thresh: float | None = None,
                           green_snow_thresh: float | None = None) -> str:
    """Materialize the per-cell thresholds dim (rows == cells, tiny)
    behind a leaf view, session-cached like pass 1. Every tail consumer
    (pass2/pass3/dims) then references a leaf instead of re-analyzing
    the 6-window-function thresholds CTE."""
    skey = sensor + ("_cdi" if s2_cdi else "") \
        + ("_grid" if tile_meta is not None else "") \
        + _offs_skey(s2_offsets) \
        + _snow_skey(nir_snow_thresh, green_snow_thresh)
    suffix = "" if skey == "LANDSAT8" else f"_{skey.lower()}"
    view = f"_thr_mat_{table}{suffix}"
    cache = _PASS1_CACHE.setdefault(spark, {})
    key = ("thr", table, skey)
    if cache.get(key) == view and spark.catalog.tableExists(view):
        return view
    p1view = materialize_pass1(spark, table, sensor=sensor,
                               s2_offsets=s2_offsets, s2_cdi=s2_cdi,
                               tile_meta=tile_meta,
                               nir_snow_thresh=nir_snow_thresh,
                               green_snow_thresh=green_snow_thresh)
    sql = (f"WITH pass1 AS (SELECT * FROM {p1view}), "
           f"{derive.thresholds_sql(SPARK, sensor=sensor)} "
           f"SELECT * FROM thresholds")
    spark.sql(sql).localCheckpoint().createOrReplaceTempView(view)
    cache[key] = view
    return view


def pass3_df(spark: SparkSession, table: str = "documents",
             sensor: str = "LANDSAT8",
             s2_offsets: dict[str, int] | None = None,
             s2_cdi: bool = False,
             eqn17_cloud_prob_thresh: float | None = None,
             nir_snow_thresh: float | None = None,
             green_snow_thresh: float | None = None) -> DataFrame:
    view = materialize_pass1(spark, table, sensor=sensor,
                             s2_offsets=s2_offsets, s2_cdi=s2_cdi,
                             nir_snow_thresh=nir_snow_thresh,
                             green_snow_thresh=green_snow_thresh)
    thr = materialize_thresholds(spark, table, sensor=sensor,
                                 s2_offsets=s2_offsets, s2_cdi=s2_cdi,
                                 nir_snow_thresh=nir_snow_thresh,
                                 green_snow_thresh=green_snow_thresh)
    cols = ", ".join(_KERNEL_COLS)
    return spark.sql(tail_sql_from_pass1(
        view, "pass3", f"SELECT {cols} FROM pass3", sensor=sensor,
        thresholds_view=thr,
        eqn17_cloud_prob_thresh=eqn17_cloud_prob_thresh,
        pass1_cols=_KERNEL_P1_COLS))


def interim_class_kernel(spark: SparkSession, table: str = "documents",
                         params: FmaskParams | None = None,
                         sensor: str = "LANDSAT8",
                         s2_offsets: dict[str, int] | None = None,
                         s2_cdi: bool = False) -> DataFrame:
    """Interim classification (no shadow chain) via the tiled-kernel path:
    pass3 columns -> ONE fused tile pass (3x3 majority + mask + circular
    dilation, halo = 1 + buffer radius) -> precedence CASE. Matches the
    declarative SQL oracle bit-for-bit (driver-checked) while running the
    morphology tile-parallel — the 100-TB plan shape.

    Plan notes: the two morphology stages are fused into a single halo
    shuffle (tiling.tiled_neighborhood_multi) — halo grows from 1+5 to
    6 rows while shuffle count and Arrow round trips halve; the text
    digest is joined back JVM-side instead of riding through the Python
    kernels (it was the largest column in the exchange)."""
    from pyspark.sql import functions as F

    from . import tiling
    from .operators import kernels

    params = params or FmaskParams()
    # persist: with_halo explodes its input — without a materialization
    # point Spark recomputes the whole pass-1..3 derivation per consumer.
    # (r6 A/B KEPT this: dropping the checkpoint looked like "one fewer
    # job" but measured 0.93 s -> 1.5 s/call at sf0.1 — the halo map
    # stage then carries the whole pass-2/3 tail + dim broadcasts above
    # a Generate, defeating stage fusion; the narrow 8-column
    # checkpoint is the faster shape on repeat calls.)
    p3 = pass3_df(spark, table, sensor=sensor, s2_offsets=s2_offsets,
                  s2_cdi=s2_cdi,
                  eqn17_cloud_prob_thresh=params.eqn17_cloud_prob_thresh,
                  **params.snow_kwargs()
                  ).select(
        "url", "cell_id", "r", "c", "nullmask",
        "water_test", "snow", "cloud_raw").localCheckpoint()

    rad = int(params.cloud_buffer_px)

    def fused(slabs: dict) -> dict:
        maj = kernels.majority3_buffer(slabs["cloud_raw"])
        cloud_m = maj & ~slabs["nullmask"]
        dil = kernels.dilate(cloud_m, params.cloud_buffer_px)
        return {"cloudbuf": maj, "cloud_m": cloud_m, "clouddil": dil}

    # carry_url=False: url (the largest exchanged column) stays out of
    # the halo sort and joins back on (cell_id, r, c) below, together
    # with the digest — one JVM-side join instead of a fatter exchange.
    out = tiling.tiled_neighborhood_multi(
        p3.drop("url"), fused,
        in_cols=("cloud_raw", "nullmask"),
        out_cols=("cloudbuf", "cloud_m", "clouddil"),
        radius=1 + rad,
        passthrough=("water_test", "snow"),
        carry_url=False)
    out = out.select(
        "cell_id", "r", "c", "cloud_raw", "cloud_m", "clouddil",
        "nullmask", "water_test", "snow",
        F.expr(f"""cast(case
            when nullmask then {0}
            when clouddil then {2}
            when snow then {4}
            when water_test then {5}
            else {1} end as int)""").alias("fmask_class"))
    # same snow knobs -> reuses the leaf p3 already materialized
    view = materialize_pass1(spark, table, sensor=sensor,
                             s2_offsets=s2_offsets, s2_cdi=s2_cdi,
                             **params.snow_kwargs())
    ident = spark.sql(
        f"""SELECT cell_id, r, c, url, sha2(text, 256) AS text_sha256
            FROM {view}""")
    return (out.join(ident, ["cell_id", "r", "c"])
            .select("url", "cell_id", "r", "c", "cloud_raw", "cloud_m",
                    "clouddil", "nullmask", "water_test", "snow",
                    "fmask_class", "text_sha256"))


def _cdi_src_select(offs: dict[str, int]) -> str:
    """Per-pixel columns the CDI kernel consumes (cdi0 in the oracle)."""
    from . import constants as C

    ref8a = derive._ref("nir8a", offs.get("nir8a", 0))
    ref7 = derive._ref("nir7", offs.get("nir7", 0))
    return f"""url, cell_id, r, c, nullmask,
  (basic_test AND whiteness0 < {C.EQN2_WHITENESS_THRESH}
   AND haze_test AND b45_test) AS pcp6,
  cirrus_band_test, sat_and_bright,
  cast(cast(ref_nir / {ref8a} as float) as double) AS r88,
  cast(cast({ref7} / {ref8a} as float) as double) AS r87"""


def _cdi_kernel(pdf):
    """One cell's CDI chain (calcCDI, fmask/fmask.py:1412-1429 +
    application :398-406): 7x7 focal variances of the float32 band
    ratios, CDI with zero-denominator guard, confident selection
    eroded then region-grown to fixpoint, PCP restricted to the grown
    selection before the cirrus/saturation OR."""
    import numpy as np
    import pandas as pd

    from . import constants as C
    from .operators import kernels

    H = int(pdf["r"].max()) + 1
    W = C.SCENE_WIDTH
    rr = pdf["r"].to_numpy()
    cc = pdf["c"].to_numpy()

    def rast(col, fill, dtype):
        a = np.full((H, W), fill, dtype=dtype)
        a[rr, cc] = pdf[col].to_numpy().astype(dtype)
        return a

    r88 = rast("r88", 0.0, np.float64)
    r87 = rast("r87", 0.0, np.float64)
    pcp6 = rast("pcp6", False, bool)
    null = rast("nullmask", True, bool)
    cirrus = rast("cirrus_band_test", False, bool)
    sat = rast("sat_and_bright", False, bool)

    v88 = kernels.focal_variance(r88, 7)
    v87 = kernels.focal_variance(r87, 7)
    cdi = np.zeros((H, W), dtype=np.float32)
    ok = (v87 + v88) != 0
    cdi[ok] = (v87[ok] - v88[ok]) / (v87[ok] + v88[ok])

    pcp_cdi = kernels.cdi_pcp_filter(pcp6, cdi)
    pcp_final = ~null & (pcp_cdi | cirrus | sat)
    c64 = cdi.astype(np.float64)
    cdi_milli = np.where(
        c64 >= 0, np.floor(c64 * 1000 + 0.5),
        -np.floor(-c64 * 1000 + 0.5)).astype(np.int32)
    return pd.DataFrame({
        "url": pdf["url"].to_numpy(),
        "cell_id": pdf["cell_id"].to_numpy(),
        "r": rr.astype("int32"), "c": cc.astype("int32"),
        "cdi_milli": cdi_milli[rr, cc],
        "pcp_cdi": pcp_cdi[rr, cc].astype("int32"),
        "pcp_final": pcp_final[rr, cc].astype("int32"),
    })


_CDI_OUT_SCHEMA = ("url string, cell_id string, r int, c int, "
                   "cdi_milli int, pcp_cdi int, pcp_final int")


def s2_cdi_pcp(spark: SparkSession, table: str = "documents",
               s2_offsets: dict[str, int] | None = None) -> DataFrame:
    """Sentinel-2 displacement-test PCP (W4), the pipeline option
    mirroring setSen2displacementTest (fmask/config.py:388-394, applied
    fmask/fmask.py:398-406): CDI from 7x7 focal variances of the
    B8/B8A and B7/B8A ratios, confident selection (cdi < -0.5) eroded
    then region-grown within (cdi < -0.25), PCP restricted to the grown
    selection before the cirrus/saturation OR.

    Plan shape: declarative pass-1 -> shuffle by cell -> per-cell Arrow
    kernel (focal variance + erosion + fixpoint grow are whole-scene
    ops, exactly the reference's per-scene stage). Oracle:
    oracle.q_s2_cdi's SQL form incl. a RECURSIVE region-grow CTE."""
    from .sen2meta import require_s2_offsets

    ensure_package_on_executors(spark)
    # Mandatory-offset gate (fmask/fmask.py:137-149): a missing dict is an
    # error, not a silent zero-offset substitution. Pre-04.00 products pass
    # oracle.S2_ZERO_OFFSETS EXPLICITLY; an empty dict is likewise treated
    # as an explicit statement (require checks `is None`, not falsiness).
    offs = require_s2_offsets(s2_offsets)
    ctes = ",\n".join([
        derive.features_sql(SPARK, derive.documents_wide_sql(SPARK, table),
                            angles=False),
        derive.pass1_sql(SPARK, sensor="SENTINEL2", s2_offsets=offs),
    ])
    src = spark.sql(
        f"WITH {ctes} SELECT {_cdi_src_select(offs)} FROM pass1")
    return src.groupBy("cell_id").applyInPandas(
        _cdi_kernel, schema=_CDI_OUT_SCHEMA)


def scene_exchange(spark: SparkSession, table: str = "documents",
                   sensor: str = "LANDSAT8",
                   s2_offsets: dict[str, int] | None = None,
                   s2_cdi: bool = False,
                   eqn17_cloud_prob_thresh: float | None = None,
                   tile_meta=None,
                   nir_snow_thresh: float | None = None,
                   green_snow_thresh: float | None = None
                   ) -> tuple[DataFrame, DataFrame]:
    """The slim scene-kernel exchange: (pixel frame, per-cell dim frame).

    Pixel frame = 8 narrow fields (no url, booleans packed into one
    tinyint, no repeated per-cell constants) — see
    operators.scene.PX_EXCHANGE_SQL for the rationale and measurements.
    Dim frame = 1 row per cell with the threshold + angle scalars,
    built from the thresholds aggregate and a first()-per-cell pass
    over the pass-1 leaf (both map-side-combine JVM aggregates)."""
    from .operators.scene import DIM_COLS, PX_EXCHANGE_SQL

    view = materialize_pass1(spark, table, sensor=sensor,
                             s2_offsets=s2_offsets, s2_cdi=s2_cdi,
                             tile_meta=tile_meta,
                             nir_snow_thresh=nir_snow_thresh,
                             green_snow_thresh=green_snow_thresh)
    thr = materialize_thresholds(spark, table, sensor=sensor,
                                 s2_offsets=s2_offsets, s2_cdi=s2_cdi,
                                 tile_meta=tile_meta,
                                 nir_snow_thresh=nir_snow_thresh,
                                 green_snow_thresh=green_snow_thresh)
    px = spark.sql(tail_sql_from_pass1(
        view, "pass3", f"SELECT {PX_EXCHANGE_SQL} FROM pass3",
        sensor=sensor, thresholds_view=thr,
        eqn17_cloud_prob_thresh=eqn17_cloud_prob_thresh,
        pass1_cols=("r", "c", "nir", "snow",
                    "sat_az_cdn", "sat_zen_cdn")))
    ang = ", ".join(f"first({k}) AS {k}" for k in DIM_COLS[3:])
    # both sides are per-cell (rows == cells); broadcast the aggregated
    # angle side so the dim frame needs no exchange+sort (guide §3.1)
    dims = spark.sql(tail_sql_from_pass1(
        view, "thresholds",
        f"""SELECT /*+ BROADCAST(a) */ t.cell_id,
              cast(t.tlow as double) AS g_tlow,
              cast(t.thigh as double) AS g_thigh,
              t.b4_17 AS g_b4_17,
              a.sun_az, a.sun_zen, a.sat_az, a.sat_zen
            FROM thresholds t
            JOIN (SELECT cell_id, {ang}
                  FROM pass1 GROUP BY cell_id) a
              ON a.cell_id = t.cell_id""",
        sensor=sensor, thresholds_view=thr))
    return px, dims


def classify(spark: SparkSession, table: str = "documents",
             params: FmaskParams | None = None,
             cells: DataFrame | None = None,
             cells_mode: str = "semi",
             sensor: str = "LANDSAT8",
             s2_offsets: dict[str, int] | None = None,
             s2_cdi: bool = False,
             tile_meta=None) -> DataFrame:
    """Full classification: returns (url, cell_id, r, c, fmask_class,
    cloud_id, ..., text_sha256). ``table`` must be a registered view
    with the raw documents schema.

    ``cells`` (a small DataFrame of cell_id) restricts the run to
    (``cells_mode="semi"``) or excludes (``"anti"``) those cells via a
    broadcast join — classify_auto uses this to split the workload.

    Plan shape: the per-cell kernel exchanges ONLY the slim pixel frame
    (scene_exchange — 8 narrow fields, flags bit-packed, per-cell
    constants cogrouped as a 1-row dim); url and the 64-byte text
    digest (pure passthrough identity) join back JVM-side on
    (cell_id, r, c) from the materialized pass-1 leaf, so neither ever
    rides the groupBy sort that was measured spilling 8.3 GB at 40.96M
    rows with the full-width row. The digest side reads the pass-1
    leaf, so the threshold/pass2/pass3 tail never re-derives text."""
    from .operators.scene import SCENE_OUT_SCHEMA_SLIM, scene_cogroup_kernel

    from pyspark.sql import functions as F

    params = params or FmaskParams()
    ensure_package_on_executors(spark)
    px, dims = scene_exchange(
        spark, table, sensor=sensor, s2_offsets=s2_offsets, s2_cdi=s2_cdi,
        eqn17_cloud_prob_thresh=params.eqn17_cloud_prob_thresh,
        tile_meta=tile_meta, **params.snow_kwargs())
    view = materialize_pass1(spark, table, sensor=sensor,
                             s2_offsets=s2_offsets, s2_cdi=s2_cdi,
                             tile_meta=tile_meta, **params.snow_kwargs())
    ident = spark.sql(
        f"""SELECT cell_id, r, c, url, sha2(text, 256) AS text_sha256
            FROM {view}""")
    if cells is not None:
        how = "left_semi" if cells_mode == "semi" else "left_anti"
        px = px.join(F.broadcast(cells), "cell_id", how)
        dims = dims.join(F.broadcast(cells), "cell_id", how)
        ident = ident.join(F.broadcast(cells), "cell_id", how)
    out = (px.groupBy("cell_id")
           .cogroup(dims.groupBy("cell_id"))
           .applyInPandas(
               scene_cogroup_kernel(
                   params, has_thermal=(sensor != "SENTINEL2")),
               schema=SCENE_OUT_SCHEMA_SLIM))
    return (out.join(ident, ["cell_id", "r", "c"])
            .select("url", "cell_id", "r", "c", "fmask_class", "cloud_id",
                    "cloud_height_du", "cloud_base_temp_c", "text_sha256"))


def classify_auto(spark: SparkSession, table: str = "documents",
                  params: FmaskParams | None = None,
                  row_threshold: int = 2_000_000,
                  p3: DataFrame | None = None,
                  digests: DataFrame | None = None,
                  sensor: str = "LANDSAT8",
                  s2_offsets: dict[str, int] | None = None,
                  tile_meta=None,
                  s2_cdi: bool = False) -> DataFrame:
    """Cost-based per-cell dispatch between the whole-cell kernel and
    the clump-parallel distributed path (one entry point; mirrors RIOS
    picking the window grain, fmask/fmask.py:234).

    Cells below ``row_threshold`` rows run as ONE kernel task each
    (classify — lowest constant factor; the whole-cell kernel wins on
    wall clock far beyond 10^6 rows/cell because the distributed
    path's extra stage barriers cost 10-30x CPU at small sizes); cells
    at or above it run classify_distributed, whose every stage has
    bounded task grain, so a Zipf-hot mega-cell is never a
    straggler/OOM unit. The 2M default is a MEMORY bound, not a wall
    crossover: a 2M-row cell's kernel working set is ~300 MB of NumPy
    slabs (10 H x 8 arrays + the Arrow frame), safely inside a
    multi-task executor heap, while 10x that risks per-task OOM — and
    scripts/bench_skew_scene.py (round 3) measured the distributed
    max task staying bounded (~11 s) at 4M-row cells while the
    whole-cell task grows linearly. The routing decision reads per-cell
    counts from the materialized pass-1 leaf (one map-side-combine
    aggregate); only the mega-cell ID LIST reaches the driver — small
    by construction (a cell is routed distributed precisely because it
    is rare and huge). Both paths produce bit-identical output
    (tests/test_scene_dist.py), so the union is exact."""
    from pyspark.sql import functions as F

    from .operators.scene import SCENE_OUT_SCHEMA, classify_scene
    from .operators.scene_dist import classify_distributed

    params = params or FmaskParams()
    if p3 is not None:
        # pre-materialized pixel-table path (benchmarks / skew tests):
        # count per cell on p3 itself and dispatch the same way
        big_cells = (p3.groupBy("cell_id").count()
                     .filter(F.col("count") >= row_threshold)
                     .select("cell_id"))
        if big_cells.count() == 0:
            out = p3.groupBy("cell_id").applyInPandas(
                lambda pdf: classify_scene(pdf, params),
                schema=SCENE_OUT_SCHEMA)
            return out.join(digests, "url") if digests is not None else out
        big = big_cells.localCheckpoint()
        p3_small = p3.join(F.broadcast(big), "cell_id", "left_anti")
        small_out = p3_small.groupBy("cell_id").applyInPandas(
            lambda pdf: classify_scene(pdf, params),
            schema=SCENE_OUT_SCHEMA)
        if digests is not None:
            small_out = small_out.join(digests, "url")
        p3_big = p3.join(F.broadcast(big), "cell_id", "left_semi") \
            .localCheckpoint()
        big_out = classify_distributed(spark, table, params,
                                       p3=p3_big, digests=digests,
                                       sensor=sensor,
                                       s2_offsets=s2_offsets)
        return small_out.unionByName(big_out.select(*small_out.columns))

    view = materialize_pass1(spark, table, sensor=sensor,
                             s2_offsets=s2_offsets, s2_cdi=s2_cdi,
                             tile_meta=tile_meta,
                             **params.snow_kwargs())
    big_cells = (spark.table(view).groupBy("cell_id").count()
                 .filter(F.col("count") >= row_threshold)
                 .select("cell_id"))
    n_big = big_cells.count()
    if n_big == 0:
        return classify(spark, table, params, sensor=sensor,
                        s2_offsets=s2_offsets, s2_cdi=s2_cdi,
                        tile_meta=tile_meta)
    big = big_cells.localCheckpoint()

    small_out = classify(spark, table, params, cells=big,
                         cells_mode="anti", sensor=sensor,
                         s2_offsets=s2_offsets, s2_cdi=s2_cdi,
                         tile_meta=tile_meta)

    thr = materialize_thresholds(spark, table, sensor=sensor,
                                 s2_offsets=s2_offsets, s2_cdi=s2_cdi,
                                 tile_meta=tile_meta,
                                 **params.snow_kwargs())
    cols = ", ".join((*_KERNEL_COLS, "cell_rows"))
    p3_big = (spark.sql(tail_sql_from_pass1(
        view, "pass3", f"SELECT {cols} FROM pass3", sensor=sensor,
        thresholds_view=thr,
        eqn17_cloud_prob_thresh=params.eqn17_cloud_prob_thresh,
        pass1_cols=(*_KERNEL_P1_COLS, "cell_rows")))
        .join(F.broadcast(big), "cell_id", "left_semi")
        .localCheckpoint())
    dig_big = text_digests(spark, table)
    big_out = classify_distributed(spark, table, params,
                                   p3=p3_big, digests=dig_big,
                                   sensor=sensor, s2_offsets=s2_offsets,
                                   tile_meta=tile_meta, s2_cdi=s2_cdi)
    return small_out.unionByName(big_out.select(*small_out.columns))
