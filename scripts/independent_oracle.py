"""Independent scene-kernel transcription for oracle generation.

A SECOND, deliberately different transcription of the reference's
post-pass-3 scene stages (fmask/fmask.py:722-1396), written straight-line
with explicit per-pixel loops and none of the engine's vectorized kernel
code (operators/kernels.py). The shadow fixture
(scripts/make_shadow_fixture.py) is generated from THIS implementation,
so the driver's fmask_final_class check compares the engine's
distributed classify_scene against genuinely independent code — a
transcription bug in kernels.py can no longer cancel itself out.

Engine-spec quantization choices that are part of the output contract
(not free transcription choices) are replicated and marked [spec]:
the float32 cast of tan(sun_zen) in shadow projection, the
uint32-with-clip projection indexing, and the round(h*SCALE) uint8
height image.

Performance is irrelevant here: this runs once per fixture build over
the sf0.01 table (500 pixels).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from python_fmask_spark import constants as C  # noqa: E402


# ---------------------------------------------------------------------------
# neighborhood helpers (explicit loops, single-mirror reflect borders)
# ---------------------------------------------------------------------------


def _reflect(i: int, n: int) -> int:
    """Single-mirror reflect; returns -1 when still out of range."""
    if i < 0:
        i = -i - 1
    elif i >= n:
        i = 2 * n - i - 1
    return i if 0 <= i < n else -1


def majority3(mask: np.ndarray) -> np.ndarray:
    """3x3 majority fill-in: cloud if >= 5 of the 3x3 neighborhood is
    cloud (uniform_filter(cloud*2, 3) >= 1, fmask/fmask.py:769-774)."""
    h, w = mask.shape
    out = np.zeros((h, w), dtype=bool)
    for r in range(h):
        for c in range(w):
            cnt = 0
            for dr in (-1, 0, 1):
                rr = _reflect(r + dr, h)
                if rr < 0:
                    continue
                for dc in (-1, 0, 1):
                    cc = _reflect(c + dc, w)
                    if cc >= 0 and mask[rr, cc]:
                        cnt += 1
            out[r, c] = cnt >= 5
    return out


def dilate_circular(mask: np.ndarray, radius: float) -> np.ndarray:
    """Dilation with the circular buffer kernel (makeBufferKernel +
    maximum_filter, fmask/fmask.py:1086-1097, 1379-1380)."""
    if radius <= 0:
        return mask.copy()
    h, w = mask.shape
    n = int(radius)
    offs = [(dr, dc) for dr in range(-n, n + 1) for dc in range(-n, n + 1)
            if math.sqrt(dr * dr + dc * dc) <= radius]
    out = np.zeros((h, w), dtype=bool)
    for r in range(h):
        for c in range(w):
            hit = False
            for dr, dc in offs:
                rr = _reflect(r + dr, h)
                cc = _reflect(c + dc, w)
                if rr >= 0 and cc >= 0 and mask[rr, cc]:
                    hit = True
                    break
            out[r, c] = hit
    return out


def label_bfs(mask: np.ndarray, eight_connected: bool) -> np.ndarray:
    """Connected components by BFS flood fill, labels assigned in
    raster-scan order of each component's first pixel — the
    scipy.ndimage.label numbering the reference relies on
    (fmask/fmask.py:762-767 4-conn, :833-844 8-conn)."""
    h, w = mask.shape
    out = np.zeros((h, w), dtype=np.int64)
    if eight_connected:
        neigh = [(-1, -1), (-1, 0), (-1, 1), (0, -1),
                 (0, 1), (1, -1), (1, 0), (1, 1)]
    else:
        neigh = [(-1, 0), (0, -1), (0, 1), (1, 0)]
    label = 0
    for r0 in range(h):
        for c0 in range(w):
            if mask[r0, c0] and out[r0, c0] == 0:
                label += 1
                queue = [(r0, c0)]
                out[r0, c0] = label
                qi = 0
                while qi < len(queue):
                    r, c = queue[qi]
                    qi += 1
                    for dr, dc in neigh:
                        rr, cc = r + dr, c + dc
                        if (0 <= rr < h and 0 <= cc < w
                                and mask[rr, cc] and out[rr, cc] == 0):
                            out[rr, cc] = label
                            queue.append((rr, cc))
    return out


def fill_minima_fixpoint(img: np.ndarray, nullval: int,
                         boundaryval: float) -> np.ndarray:
    """Fill local minima by Jacobi fixpoint iteration of morphological
    reconstruction-by-erosion — a different algorithm from the engine's
    hierarchical queue (c_src/fillminima.c:209-301) with the same unique
    fixpoint: filled = largest f <= marker with f >= img and
    f[p] <= max(img[p], min of f over 4-neighbors).

    Seeds (the marker) follow fillMinima's wrapper
    (fmask/fillminima.py:40-78): with nulls, the inner ring of non-null
    pixels 4/8-adjacent to a null gets boundaryval; without nulls, edge
    pixels whose img != hMax get boundaryval. Null pixels are walls."""
    img = np.asarray(img)
    nullmask = img == nullval
    non_null = ~nullmask
    if not non_null.any():
        return img.copy()
    h_max = int(img[non_null].max())
    h_min = int(img[non_null].min())
    bval = int(min(max(boundaryval, h_min), h_max))
    h, w = img.shape

    seed = np.zeros((h, w), dtype=bool)
    if nullmask.any():
        for r in range(h):
            for c in range(w):
                if nullmask[r, c]:
                    continue
                for dr in (-1, 0, 1):
                    for dc in (-1, 0, 1):
                        rr, cc = r + dr, c + dc
                        if 0 <= rr < h and 0 <= cc < w and nullmask[rr, cc]:
                            seed[r, c] = True
    else:
        for r in range(h):
            for c in range(w):
                if (r in (0, h - 1) or c in (0, w - 1)) \
                        and img[r, c] != h_max:
                    seed[r, c] = True

    cur = np.full((h, w), h_max, dtype=np.int64)
    cur[seed] = bval
    imgl = img.astype(np.int64)
    while True:
        nxt = cur.copy()
        for r in range(h):
            for c in range(w):
                if nullmask[r, c] or seed[r, c]:
                    continue
                m = cur[r, c]
                for rr, cc in ((r - 1, c), (r + 1, c), (r, c - 1),
                               (r, c + 1)):
                    if 0 <= rr < h and 0 <= cc < w \
                            and not nullmask[rr, cc]:
                        m = min(m, cur[rr, cc])
                nxt[r, c] = max(imgl[r, c], m)
        if (nxt == cur).all():
            break
        cur = nxt
    out = cur.astype(img.dtype)
    out[nullmask] = nullval
    return out


def percentile_linear(values: np.ndarray, pcnt: float) -> float:
    """scoreatpercentile / np.percentile linear interpolation, by hand."""
    v = np.sort(np.asarray(values, dtype=np.float64))
    pos = (len(v) - 1) * (pcnt / 100.0)
    lo = int(math.floor(pos))
    hi = min(lo + 1, len(v) - 1)
    frac = pos - lo
    return float(v[lo] + (v[hi] - v[lo]) * frac)


# ---------------------------------------------------------------------------
# the scene chain (fmask/fmask.py:722-1396), straight-line
# ---------------------------------------------------------------------------


def classify_scene_independent(pdf: pd.DataFrame,
                               min_cloud_size_px: int | None = None,
                               cloud_buffer_px: float | None = None,
                               shadow_buffer_px: float | None = None,
                               x_res: float | None = None,
                               y_res: float | None = None,
                               has_thermal: bool = True) -> pd.DataFrame:
    """One cell's pass-3 rows -> final per-url classification.
    Output schema matches operators.scene.classify_scene (incl.
    text_sha256 when present)."""
    min_cloud_size_px = min_cloud_size_px or C.MIN_CLOUD_SIZE_PIXELS
    cloud_buffer_px = (C.CLOUD_BUFFER_SIZE if cloud_buffer_px is None
                       else cloud_buffer_px)
    shadow_buffer_px = (C.SHADOW_BUFFER_SIZE if shadow_buffer_px is None
                        else shadow_buffer_px)
    x_res = x_res or C.X_RES
    y_res = y_res or C.Y_RES

    H = int(pdf["r"].max()) + 1
    W = C.SCENE_WIDTH
    rr_all = pdf["r"].to_numpy()
    cc_all = pdf["c"].to_numpy()

    def rast(col, fill, dtype):
        a = np.full((H, W), fill, dtype=dtype)
        a[rr_all, cc_all] = pdf[col].to_numpy().astype(dtype)
        return a

    nullmask = np.ones((H, W), dtype=bool)  # ghost slots are null
    nullmask[rr_all, cc_all] = pdf["nullmask"].to_numpy().astype(bool)
    cloud_raw = rast("cloud_raw", False, bool)
    water = rast("water_test", False, bool)
    snow = rast("snow", False, bool)
    nir_dn = rast("nir", 0, np.int64)
    bt = rast("bt", 0.0, np.float64)

    row0 = pdf.iloc[0]
    t_low = None if pd.isna(row0["g_tlow"]) else float(row0["g_tlow"])
    t_high = None if pd.isna(row0["g_thigh"]) else float(row0["g_thigh"])
    b4_17 = float(row0["g_b4_17"])
    sun_az = float(row0["sun_az"])
    sun_zen = float(row0["sun_zen"])

    # --- interim cloud (cloudFinalPass tail, fmask/fmask.py:722-778)
    cloudmask = cloud_raw.copy()
    if min_cloud_size_px > 1:
        lab4 = label_bfs(cloudmask, eight_connected=False)
        for lid in range(1, int(lab4.max()) + 1):
            sel = lab4 == lid
            if int(sel.sum()) < min_cloud_size_px:
                cloudmask[sel] = False
    cloudmask = majority3(cloudmask)
    cloudmask[nullmask] = False

    # --- potential shadow (doPotentialShadows, fmask/fmask.py:781-830)
    nir17_dn = b4_17 * C.TOA_SCALE
    filled = fill_minima_fixpoint(nir_dn, C.REF_NULL_DN, nir17_dn)
    potential_shadow = ((filled / C.TOA_SCALE) - (nir_dn / C.TOA_SCALE)) \
        > C.EQN19_NIR_FILL_THRESH

    # --- clumps (fmask/fmask.py:833-844), 8-connected
    clumps = label_bfs(cloudmask, eight_connected=True)
    n_clumps = int(clumps.max())

    # --- 3-D clouds (cloudShapeFunc, fmask/fmask.py:896-951); with no
    # thermal the clouds stay flat and base_temp stays EMPTY (every
    # match runs at Tcloudbase = 0, fmask/fmask.py:913-951,1148-1152)
    cloud_shape = np.zeros((H, W), dtype=np.uint8)
    base_temp: dict[int, float] = {}
    for cid in (range(1, n_clumps + 1) if has_thermal else ()):
        sel = clumps == cid
        bt_cloud = bt[sel].astype(np.float64).copy()
        n_pix = int(sel.sum())
        R = math.sqrt(n_pix / (2 * math.pi))
        if R >= 8:
            pct = 100.0 * (R - 8.0) ** 2 / (R ** 2)
            t_base = percentile_linear(bt_cloud, pct)
        else:
            t_base = float(bt_cloud.min())
        bt_cloud[bt_cloud > t_base] = t_base
        h_rel = (t_base - bt_cloud) / C.LAPSE_RATE_WET
        cloud_shape[sel] = np.round(
            h_rel * C.CLOUD_HEIGHT_SCALE).astype(np.uint8)  # [spec]
        base_temp[cid] = t_base

    # per-pixel view angles (P28/P30): clump sat angles = mean of the
    # DN grid over the clump x 0.01 rad (fmask/config.py:736-746)
    sat_az_img = sat_zen_img = None
    if "sat_az_cdn" in pdf.columns:
        sat_az_img = rast("sat_az_cdn", 0, np.int64) * 0.01
        sat_zen_img = rast("sat_zen_cdn", 0, np.int64) * 0.01

    # --- shadow shapes + height-sweep match
    #     (makeCloudShadowShapes fmask/fmask.py:959-1060 cloud-top
    #      variant; matchOneShadow :1188-1308)
    shadowmask = np.zeros((H, W), dtype=bool)
    for cid in range(1, n_clumps + 1):
        sel = clumps == cid
        ndx = np.where(sel)
        if sat_az_img is not None:
            sat_az = float(sat_az_img[ndx].mean())
            sat_zen = float(sat_zen_img[ndx].mean())
        else:
            sat_az = float(row0["sat_az"])
            sat_zen = float(row0["sat_zen"])

        cloud_hgt = C.METRES_PER_KM * cloud_shape[ndx].astype(np.float64) \
            / C.CLOUD_HEIGHT_SCALE
        x = ndx[1] * x_res
        y = ndx[0] * y_res
        d = cloud_hgt * np.float64(np.float32(np.tan(sun_zen)))  # [spec]
        x_dash = x - d * math.sin(sun_az)
        y_dash = y - d * math.cos(sun_az)
        srows = (y_dash / y_res).astype(np.uint32).clip(0, H - 1)  # [spec]
        scols = (x_dash / x_res).astype(np.uint32).clip(0, W - 1)  # [spec]

        # matchOneShadow height sweep
        tl = 0.0 if t_low is None else t_low
        th = 10.0 if t_high is None else t_high
        t_base = base_temp.get(cid, 0)  # empty without thermal
        h_min_km = max(0.2, (tl - 4 - t_base) / 9.8)
        h_max_km = min(12, (th + 4 - t_base))
        h_lo = h_min_km * C.METRES_PER_KM
        h_hi = h_max_km * C.METRES_PER_KM

        tan_szen = math.tan(sun_zen)
        sin_saz = math.sin(sun_az)
        cos_saz = math.cos(sun_az)
        tan_vzen = math.tan(sat_zen)
        sin_vaz = math.sin(sat_az)
        cos_vaz = math.cos(sat_az)
        x_off_min = h_lo * tan_szen * sin_saz
        x_off_max = h_hi * tan_szen * sin_saz
        y_off_min = h_lo * tan_szen * cos_saz
        y_off_max = h_hi * tan_szen * cos_saz
        longest = max(abs(x_off_max - x_off_min),
                      abs(y_off_max - y_off_min))
        num_steps = max(1, int(math.ceil(longest / x_res)))
        x_step = (x_off_max - x_off_min) / num_steps
        y_step = (y_off_max - y_off_min) / num_steps

        trow0 = int(srows.min())
        tcol0 = int(scols.min())
        tnr = int(srows.max()) - trow0 + 1
        tnc = int(scols.max()) - tcol0 + 1
        template = np.zeros((tnr, tnc), dtype=bool)
        template[srows - trow0, scols - tcol0] = True

        best_sim = 0.0
        best = None
        for i in range(num_steps):
            hgt = (x_off_min + i * x_step) / (tan_szen * sin_saz)
            x_off = x_off_min + i * x_step - hgt * tan_vzen * sin_vaz
            y_off = y_off_min + i * y_step - hgt * tan_vzen * cos_vaz
            r = trow0 - int(y_off / y_res)
            c = tcol0 - int(x_off / x_res)
            if not (0 <= r and r + tnr <= H and 0 <= c and c + tnc <= W):
                continue
            shadow_area = 0
            overlap_area = 0
            overlap = np.zeros((tnr, tnc), dtype=bool)
            for tr in range(tnr):
                for tc in range(tnc):
                    gr, gc = r + tr, c + tc
                    blocked = cloudmask[gr, gc] or nullmask[gr, gc]
                    if template[tr, tc] and not blocked:
                        shadow_area += 1
                        if potential_shadow[gr, gc]:
                            overlap_area += 1
                            overlap[tr, tc] = True
            sim = overlap_area / shadow_area if shadow_area > 0 else 0.0
            if sim > best_sim:
                best_sim = sim
                best = (r, c, overlap)
        if best_sim > 0.3 and best is not None:
            r, c, overlap = best
            orr, occ = np.where(overlap)
            shadowmask[r + orr, c + occ] = True

    if shadow_buffer_px > 0:
        shadowmask = dilate_circular(shadowmask, shadow_buffer_px)

    # --- finalize (maskAndBuffer, fmask/fmask.py:1357-1396)
    cloud_final = dilate_circular(cloudmask, cloud_buffer_px) \
        if cloud_buffer_px > 0 else cloudmask
    out = np.full((H, W), C.OUTCODE_CLEAR, dtype=np.uint8)
    out[water] = C.OUTCODE_WATER
    out[snow] = C.OUTCODE_SNOW
    out[shadowmask] = C.OUTCODE_SHADOW
    out[cloud_final] = C.OUTCODE_CLOUD
    out[nullmask] = C.OUTCODE_NULL

    base_temp_img = np.full((H, W), np.nan)
    for cid, tb in base_temp.items():
        base_temp_img[clumps == cid] = tb

    res = pd.DataFrame({
        "url": pdf["url"].to_numpy(),
        "cell_id": pdf["cell_id"].to_numpy(),
        "r": rr_all.astype(np.int32),
        "c": cc_all.astype(np.int32),
        "fmask_class": out[rr_all, cc_all].astype(np.int32),
        "cloud_id": clumps[rr_all, cc_all].astype(np.int64),
        "cloud_height_du": cloud_shape[rr_all, cc_all].astype(np.int32),
        "cloud_base_temp_c": base_temp_img[rr_all, cc_all],
    })
    if "text_sha256" in pdf.columns:
        res["text_sha256"] = pdf["text_sha256"].to_numpy()
    return res
