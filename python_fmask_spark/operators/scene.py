"""Per-scene (per-cell) classification kernel: everything in doFmask after
pass 3's predicate (fmask/fmask.py:96-221 stages SHADOW..FINAL), vectorized
NumPy over one cell's raster inside ``applyInPandas``.

The reference runs each Landsat/Sentinel scene in a single process; our
scene == H3 cell, so per-cell kernels are semantically exact. Cross-cell
distribution comes from Spark's shuffle over cell_id; intra-cell
distribution (for mega-cells) uses the tiled operators in tiling.py.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd

from .. import constants as C
from . import kernels


@dataclass(frozen=True)
class FmaskParams:
    cloud_buffer_px: float = C.CLOUD_BUFFER_SIZE
    shadow_buffer_px: float = C.SHADOW_BUFFER_SIZE
    min_cloud_size_px: int = C.MIN_CLOUD_SIZE_PIXELS
    x_res: float = C.X_RES
    y_res: float = C.Y_RES
    # Eqn-17 land-threshold constant — the reference's per-run
    # setEqn17CloudProbThresh / CLI --cloudprobthreshold knob
    # (fmask/config.py:336-344): paper default 0.2, Zhu's MATLAB
    # later moved to 0.225. Threaded into the pass-2 landthr CTE.
    eqn17_cloud_prob_thresh: float = C.EQN17_CLOUD_PROB_THRESH
    # Eqn-20 snow-test reflectance floors — setEqn20NirSnowThresh /
    # setEqn20GreenSnowThresh, CLI --nirsnowthreshold /
    # --greensnowthreshold (fmask/config.py:354-368; applied
    # fmask/fmask.py:452-453). These change pass 1 itself, so a
    # non-default value materializes its own pass-1 leaf
    # (pipeline._snow_skey).
    nir_snow_thresh: float = C.EQN20_NIR_SNOW_THRESH
    green_snow_thresh: float = C.EQN20_GREEN_SNOW_THRESH

    def snow_kwargs(self) -> dict:
        """The Eqn-20 knobs as pipeline kwargs — None when at defaults
        so the session-cached default pass-1 leaf is shared."""
        return {
            "nir_snow_thresh": (
                None if self.nir_snow_thresh == C.EQN20_NIR_SNOW_THRESH
                else self.nir_snow_thresh),
            "green_snow_thresh": (
                None if self.green_snow_thresh == C.EQN20_GREEN_SNOW_THRESH
                else self.green_snow_thresh),
        }

    @classmethod
    def strict(cls, **overrides) -> "FmaskParams":
        """The reference's setStrictFmask preset (fmask/config.py:269,
        applied fmask/fmask.py:151-154): run strictly as per the Zhu &
        Woodcock paper — no cloud buffer, 3-px shadow buffer; all other
        knobs at their paper defaults. ``overrides`` fine-tune on top."""
        base = dict(cloud_buffer_px=0, shadow_buffer_px=3)
        base.update(overrides)
        return cls(**base)


def _to_raster(pdf: pd.DataFrame, col: str, H: int, W: int, fill, dtype):
    arr = np.full((H, W), fill, dtype=dtype)
    arr[pdf["r"].to_numpy(), pdf["c"].to_numpy()] = pdf[col].to_numpy().astype(dtype)
    return arr


def classify_scene(pdf: pd.DataFrame, params: FmaskParams = FmaskParams(),
                   has_thermal: bool = True) -> pd.DataFrame:
    """Input: one cell's pass-3 pixel rows. Output: per-url final class.

    Stages (reference provenance):
      interim cloud  = Eqn18 + optional size filter + 3x3 majority
                       (cloudFinalPass, fmask/fmask.py:722-778)
      potential shadow = fillMinima on NIR + Eqn19 (fmask/fmask.py:781-830)
      clumps         = 8-conn label (fmask/fmask.py:833-844)
      3-D clouds     = Eqns 22-24 (fmask/fmask.py:896-951)
      shadow shapes  = sun-vector projection (fmask/fmask.py:959-1060)
      shadow match   = height sweep, accept sim > 0.3 (fmask/fmask.py:1100-1308)
      finalize       = buffers + precedence merge (fmask/fmask.py:1357-1396)
    """
    H = int(pdf["r"].max()) + 1
    W = C.SCENE_WIDTH

    # Ghost slots (beyond the last document) are null pixels.
    nullmask = np.ones((H, W), dtype=bool)
    nullmask[pdf["r"].to_numpy(), pdf["c"].to_numpy()] = \
        pdf["nullmask"].to_numpy().astype(bool)
    cloud_raw = _to_raster(pdf, "cloud_raw", H, W, False, bool)
    water = _to_raster(pdf, "water_test", H, W, False, bool)
    snow = _to_raster(pdf, "snow", H, W, False, bool)
    nir_dn = _to_raster(pdf, "nir", H, W, 0, np.int64)
    bt = _to_raster(pdf, "bt", H, W, 0.0, np.float64)

    row0 = pdf.iloc[0]
    t_low = None if pd.isna(row0["g_tlow"]) else float(row0["g_tlow"])
    t_high = None if pd.isna(row0["g_thigh"]) else float(row0["g_thigh"])
    b4_17 = float(row0["g_b4_17"])
    angles = {k: float(row0[k]) for k in ("sun_az", "sun_zen", "sat_az", "sat_zen")}

    # --- interim cloud mask (cloudFinalPass tail, fmask/fmask.py:761-776)
    cloudmask = cloud_raw.copy()
    if params.min_cloud_size_px > 1:
        clumps0, _ = kernels.label_components(cloudmask, eight_connected=False)
        sizes = np.bincount(clumps0.ravel())
        sizes[0] = 0
        cloudmask[sizes[clumps0] < params.min_cloud_size_px] = False
    cloudmask = kernels.majority3_buffer(cloudmask)
    cloudmask[nullmask] = False

    # --- potential shadow (doPotentialShadows, fmask/fmask.py:781-830)
    nir17_dn = b4_17 * C.TOA_SCALE  # NIRoffset 0 (fmask/fmask.py:800-806)
    filled = kernels.fill_minima(nir_dn, C.REF_NULL_DN, nir17_dn)
    nir_units = nir_dn / C.TOA_SCALE
    filled_units = filled / C.TOA_SCALE
    potential_shadow = (filled_units - nir_units) > C.EQN19_NIR_FILL_THRESH

    # --- clump clouds (fmask/fmask.py:833-844, 8-connected)
    clumps, _n = kernels.label_components(cloudmask, eight_connected=True)

    # --- 3-D clouds (fmask/fmask.py:896-951). Without thermal the
    # clouds are flat 2-D shapes — cloudShape all zero, cloudBaseTemp
    # EMPTY so every shadow match runs at Tcloudbase = 0
    # (fmask/fmask.py:913-951 else-branch + matchShadows:1148-1152).
    if has_thermal:
        cloud_shape, base_temp = \
            kernels.cloud_shape_and_base_temp(clumps, bt)
    else:
        cloud_shape = np.zeros(clumps.shape, dtype=np.uint8)
        base_temp = {}
    bt_lut = np.full(int(clumps.max()) + 1, np.nan)
    for cid, tb in base_temp.items():
        bt_lut[cid] = tb
    base_temp_img = bt_lut[clumps]

    # --- shadow shapes + matching (fmask/fmask.py:959-1060,1100-1185)
    # Per-pixel view angles from the makeAngles DN stack (P28): each
    # clump's sat angles are the mean over its pixels x 0.01 rad
    # (AnglesFileInfo scaleToRadians, fmask/config.py:691,736-746).
    sat_az_img = sat_zen_img = None
    if "sat_az_cdn" in pdf.columns:
        sat_az_img = _to_raster(pdf, "sat_az_cdn", H, W, 0, np.int64) * 0.01
        sat_zen_img = _to_raster(pdf, "sat_zen_cdn", H, W, 0, np.int64) * 0.01
    shapes = kernels.make_shadow_shapes(clumps, cloud_shape, angles,
                                        params.x_res, params.y_res,
                                        sat_az_img=sat_az_img,
                                        sat_zen_img=sat_zen_img)
    shadowmask = np.zeros((H, W), dtype=bool)
    for cloud_id, entry in shapes.items():
        t_base = base_temp.get(cloud_id, 0)
        matched = kernels.match_one_shadow(
            cloudmask, entry, potential_shadow, t_base, t_low, t_high,
            params.x_res, params.y_res, nullmask)
        if matched is not None:
            shadowmask[matched] = True
    if params.shadow_buffer_px > 0:
        shadowmask = kernels.dilate(shadowmask, params.shadow_buffer_px)

    # --- finalize (maskAndBuffer, fmask/fmask.py:1357-1396)
    cloud_final = kernels.dilate(cloudmask, params.cloud_buffer_px) \
        if params.cloud_buffer_px > 0 else cloudmask
    out = np.full((H, W), C.OUTCODE_CLEAR, dtype=np.uint8)
    out[water] = C.OUTCODE_WATER
    out[snow] = C.OUTCODE_SNOW
    out[shadowmask] = C.OUTCODE_SHADOW
    out[cloud_final] = C.OUTCODE_CLOUD
    out[nullmask] = C.OUTCODE_NULL

    rr = pdf["r"].to_numpy()
    cc = pdf["c"].to_numpy()
    cols = {}
    if "url" in pdf.columns:
        # direct (non-pipeline) callers still pass the identity through;
        # the pipeline's slim exchange joins url back JVM-side instead
        cols["url"] = pdf["url"].to_numpy()
    cols.update({
        "cell_id": pdf["cell_id"].to_numpy(),
        "r": rr.astype(np.int32),
        "c": cc.astype(np.int32),
        "fmask_class": out[rr, cc].astype(np.int32),
        "cloud_id": clumps[rr, cc].astype(np.int64),
        "cloud_height_du": cloud_shape[rr, cc].astype(np.int32),
        "cloud_base_temp_c": base_temp_img[rr, cc],
    })
    res = pd.DataFrame(cols)
    if "text_sha256" in pdf.columns:
        # direct (non-pipeline) callers may still pass the digest through
        res["text_sha256"] = pdf["text_sha256"].to_numpy()
    return res


# The kernel's own output carries NO document digest: shipping a 64-byte
# passthrough string through Arrow both ways is the single biggest
# non-scaling cost of the stage (measured: ~2x the trivial-kernel
# plumbing time at 10M rows). pipeline.classify joins text_sha256 back
# JVM-side after the kernel.
SCENE_OUT_SCHEMA = ("url string, cell_id string, r int, c int, "
                    "fmask_class int, cloud_id bigint, "
                    "cloud_height_du int, cloud_base_temp_c double")

SCENE_OUT_SCHEMA_WITH_SHA = SCENE_OUT_SCHEMA + ", text_sha256 string"

# --- slim scene exchange -----------------------------------------------
# The groupBy(cell_id) sort feeding applyInPandas exchanges every field
# as an 8-byte UnsafeRow slot plus variable-length string bytes, and the
# sort SPILLS what doesn't fit (measured 8.3 GB at 40.96M rows). The slim
# form cuts the exchanged row from 19 fields + url (~210 B) to 8 fields
# (~90 B): url is dropped entirely (identity joins back JVM-side on
# (cell_id, r, c)), the four booleans pack into ONE tinyint bitmask, and
# the seven per-cell constants ride a separate 1-row-per-cell dim frame
# through cogroup instead of repeating on every pixel row — the same
# shape as the reference streaming uint8 stacks between passes
# (fmask/fmask.py:459-460).

SCENE_OUT_SCHEMA_SLIM = ("cell_id string, r int, c int, "
                         "fmask_class int, cloud_id bigint, "
                         "cloud_height_du int, cloud_base_temp_c double")

# bitmask layout of the slim exchange's `flags` tinyint
_FLAG_BITS = (("nullmask", 1), ("water_test", 2), ("snow", 4),
              ("cloud_raw", 8))

PX_EXCHANGE_SQL = (
    "cell_id, cast(r as int) AS r, cast(c as int) AS c, "
    "cast(nir as int) AS nir, bt, "
    "cast(cast(nullmask as int) + 2 * cast(water_test as int) "
    "+ 4 * cast(snow as int) + 8 * cast(cloud_raw as int) as tinyint) "
    "AS flags, "
    "cast(sat_az_cdn as int) AS sat_az_cdn, "
    "cast(sat_zen_cdn as int) AS sat_zen_cdn")

DIM_COLS = ("g_tlow", "g_thigh", "g_b4_17",
            "sun_az", "sun_zen", "sat_az", "sat_zen")

_EMPTY_SLIM = pd.DataFrame({
    "cell_id": pd.Series(dtype=object),
    "r": pd.Series(dtype="int32"), "c": pd.Series(dtype="int32"),
    "fmask_class": pd.Series(dtype="int32"),
    "cloud_id": pd.Series(dtype="int64"),
    "cloud_height_du": pd.Series(dtype="int32"),
    "cloud_base_temp_c": pd.Series(dtype="float64"),
})


def unpack_exchange(px: pd.DataFrame, dims: pd.DataFrame) -> pd.DataFrame:
    """Reconstitute the full-width per-cell frame classify_scene expects
    from the slim pixel frame + 1-row cell dim frame (pure pandas column
    assignment — no Arrow cost; scalar assignment broadcasts)."""
    flags = px["flags"].to_numpy()
    pdf = pd.DataFrame({
        "cell_id": px["cell_id"].to_numpy(),
        "r": px["r"].to_numpy(), "c": px["c"].to_numpy(),
        "nir": px["nir"].to_numpy(), "bt": px["bt"].to_numpy(),
        "sat_az_cdn": px["sat_az_cdn"].to_numpy(),
        "sat_zen_cdn": px["sat_zen_cdn"].to_numpy(),
    })
    for name, bit in _FLAG_BITS:
        pdf[name] = (flags & bit) != 0
    d0 = dims.iloc[0]
    for k in DIM_COLS:
        pdf[k] = d0[k]
    return pdf


def scene_cogroup_kernel(params: FmaskParams, has_thermal: bool = True):
    """Cogrouped kernel over (slim pixel frame, cell dim frame)."""
    def kernel(px: pd.DataFrame, dims: pd.DataFrame) -> pd.DataFrame:
        if px.empty or dims.empty:
            return _EMPTY_SLIM
        return classify_scene(unpack_exchange(px, dims), params,
                              has_thermal=has_thermal)
    return kernel
