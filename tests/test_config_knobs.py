"""The reference's per-run tuning surface (fmask/config.py): the Eqn-17
cloud-probability threshold knob and the strictFmask preset."""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, "/root/repo")

from python_fmask_spark import oracle, pipeline  # noqa: E402
from python_fmask_spark.dialect import DUCKDB, SPARK  # noqa: E402
from python_fmask_spark.operators.scene import FmaskParams  # noqa: E402
from python_fmask_spark.sources import register_views  # noqa: E402


def _land_thresholds(spark, eqn17):
    view = pipeline.materialize_pass1(spark)
    df = spark.sql(pipeline.tail_sql_from_pass1(
        view, "pass2",
        """SELECT cell_id,
             cast(round(land_threshold * 1000) as int) AS landthr_milli
           FROM landthr""",
        eqn17_cloud_prob_thresh=eqn17))
    return {r.cell_id: r.landthr_milli for r in df.collect()}


def test_eqn17_thresh_sweep_matches_oracle(spark, sf_oracle):
    """Sweep the Eqn-17 knob across two values (the paper's 0.2 and
    Zhu's later MATLAB 0.225): Spark matches the DuckDB oracle rendered
    with the SAME knob at each point, and the knob provably moves the
    per-cell land threshold."""
    register_views(spark, sf_oracle)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet("
                f"'{os.path.join(sf_oracle, 'documents.parquet')}')")
    results = {}
    for e17 in (0.2, 0.225):
        got = _land_thresholds(spark, e17)
        ctes = oracle._ctes(DUCKDB, "pass2", eqn17_cloud_prob_thresh=e17)
        want = dict(con.execute(
            f"""{ctes}
            SELECT cell_id,
              cast(round(land_threshold * 1000) as int) AS landthr_milli
            FROM landthr""").fetchall())
        assert got == want, f"eqn17={e17}"
        results[e17] = got
    # the knob is live: every cell's threshold moved by exactly +25 milli
    assert all(results[0.225][c] - results[0.2][c] == 25
               for c in results[0.2])


def test_eqn17_thresh_flows_into_classification(spark, sf_oracle):
    """An extreme Eqn-17 value must change the final cloud mask (the
    knob reaches Eqn 18's land test end-to-end), and the whole-cell
    kernel and declarative interim path must agree under it."""
    register_views(spark, sf_oracle)
    def n_cloud(params):
        df = pipeline.interim_class_kernel(spark, params=params)
        return df.filter("fmask_class = 2").count()
    base = n_cloud(FmaskParams())
    high = n_cloud(FmaskParams(eqn17_cloud_prob_thresh=5.0))
    assert high < base  # a huge threshold suppresses land clouds
    assert base > 0


def test_strict_preset_mirrors_reference(spark, sf_oracle):
    """FmaskParams.strict() == setStrictFmask (fmask/fmask.py:151-154):
    cloud buffer 0, shadow buffer 3, everything else at defaults — and
    it visibly shrinks the dilated cloud mask."""
    s = FmaskParams.strict()
    assert s.cloud_buffer_px == 0
    assert s.shadow_buffer_px == 3
    assert s.min_cloud_size_px == FmaskParams().min_cloud_size_px
    assert s.eqn17_cloud_prob_thresh == FmaskParams().eqn17_cloud_prob_thresh
    register_views(spark, sf_oracle)
    n_default = pipeline.interim_class_kernel(
        spark).filter("fmask_class = 2").count()
    n_strict = pipeline.interim_class_kernel(
        spark, params=s).filter("fmask_class = 2").count()
    assert n_strict < n_default  # no cloud dilation under strict
    # overrides compose on top of the preset
    assert FmaskParams.strict(min_cloud_size_px=4).min_cloud_size_px == 4
