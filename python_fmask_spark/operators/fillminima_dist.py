"""Distributed fill-minima: tile-local reconstruction-by-erosion with
halo exchange, iterated to fixpoint (W6's scale path; SURVEY §7 hard
part 3).

The global operator img2 = max(img, min over 4-neighbors of img2),
seeded at the scene boundary ring with boundaryval, has a unique
fixpoint (Soille & Gratin; fmask/fillminima.py:40-78). Block-Jacobi
iteration computes it tile-parallel: each round runs the hierarchical-
queue fill inside every tile using (a) the tile's own scene-boundary /
null-ring seeds and (b) the current img2 estimates of its 1-row halo as
sources. Halo estimates only ever decrease, so each round's output is
monotonically non-increasing and the iteration converges in at most
(tiles a basin spans) rounds — at 10^12 scale, each round is one
halo-exchange shuffle, and basins rarely span more than a few tiles.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import constants as C
from ..session import ensure_package_on_executors
from . import kernels

_UNSET = np.int64(2 ** 62)


def _local_fill_from_sources(img: np.ndarray, nullmask: np.ndarray,
                             seed_img2: np.ndarray,
                             h_min: int, h_max: int) -> np.ndarray:
    """Hierarchical-queue reconstruction given explicit sources:
    pixels with seed_img2 < UNSET are sources at their seed level; the
    rest start at h_max (the c_src/fillminima.c:270-299 loop with a
    generalized seed set)."""
    img2 = np.where(seed_img2 >= h_max, h_max, seed_img2).astype(np.int64)
    img2[nullmask] = h_max  # nulls never propagate
    kernels.hq_fill(np.asarray(img, dtype=np.int64), nullmask, img2,
                    h_min, h_max)
    out = img2.copy()
    out[nullmask] = _UNSET
    return out


def fill_minima_distributed(df: DataFrame, img_col: str,
                            nullval: int, boundaryval: float = 0.0,
                            tile_rows: int = C.TILE_SIZE,
                            max_rounds: int = 64,
                            boundary_col: str | None = None) -> DataFrame:
    """Fill local minima of a per-cell raster column, tile-parallel.

    df columns: cell_id, r, c, <img_col> (+ ``boundary_col`` for a
    per-cell boundary value, e.g. the NIR 17.5-percentile DN the
    reference uses, fmask/fmask.py:806; extra columns are ignored).
    Returns (cell_id, r, c, <img_col>, ``filled``) — ``filled`` bigint,
    == <img_col> for null pixels, like the reference. No identity
    column rides the fixpoint; join url back on (cell_id, r, c). Results equal the whole-scene ``kernels.fill_minima``
    exactly (property-tested in tests/test_fillminima_dist.py).
    """
    W = C.SCENE_WIDTH
    spark = df.sparkSession
    ensure_package_on_executors(spark)

    # Per-cell extremes and heights (small dim table, broadcast back).
    meta = (df.withColumn("_nn", F.expr(f"{img_col} != {nullval}"))
            .groupBy("cell_id")
            .agg(F.expr(f"max(case when {img_col} != {nullval} "
                        f"then {img_col} end) AS h_max"),
                 F.expr(f"min(case when {img_col} != {nullval} "
                        f"then {img_col} end) AS h_min"),
                 F.expr("max(r) + 1 AS cell_h"),
                 # ghost slots (ragged last row) are null pixels too
                 F.expr(f"cast(max(case when {img_col} = {nullval} then 1 "
                        f"else 0 end) = 1 "
                        f"or count(*) < (max(r) + 1) * {C.SCENE_WIDTH} "
                        f"as int) AS cell_has_null")))
    bcol = (F.expr(f"first({boundary_col}) AS cell_bval") if boundary_col
            else F.expr(f"cast({boundaryval} as double) AS cell_bval"))
    bmeta = df.groupBy("cell_id").agg(bcol) if boundary_col else None
    # url never rides the fixpoint: each of the up-to-max_rounds halo
    # exchanges would re-ship it as pure passthrough; identity joins
    # back on (cell_id, r, c) at the caller when needed
    base = df.select("cell_id", "r", "c", img_col) \
        .join(F.broadcast(meta), "cell_id")
    if bmeta is not None:
        base = base.join(F.broadcast(bmeta), "cell_id")
    else:
        base = base.withColumn("cell_bval",
                               F.expr(f"cast({boundaryval} as double)"))
    base = base.withColumn("img2", F.lit(int(_UNSET))).localCheckpoint()
    schema = ("cell_id string, r int, c int, "
              f"{img_col} bigint, h_max bigint, h_min bigint, "
              "cell_h int, cell_has_null int, cell_bval double, "
              "img2 bigint, changed int")

    def one_round(pdf: pd.DataFrame) -> pd.DataFrame:
        rr = pdf["r"].to_numpy()
        lo = int(rr.min())
        h = int(rr.max()) - lo + 1
        cc = pdf["c"].to_numpy()
        h_max = int(pdf["h_max"].iloc[0])
        h_min = int(pdf["h_min"].iloc[0])
        cell_h = int(pdf["cell_h"].iloc[0])
        cell_has_null = bool(pdf["cell_has_null"].iloc[0])
        b = int(min(max(float(pdf["cell_bval"].iloc[0]), h_min), h_max))

        img = np.zeros((h, W), dtype=np.int64)
        img[rr - lo, cc] = pdf[img_col].to_numpy()
        present = np.zeros((h, W), dtype=bool)
        present[rr - lo, cc] = True
        nullmask = ~present | (img == nullval)
        seed = np.full((h, W), _UNSET, dtype=np.int64)
        # halo rows carry their current img2 as sources
        halo = pdf["is_halo"].to_numpy()
        seed[rr[halo] - lo, cc[halo]] = np.minimum(
            pdf["img2"].to_numpy()[halo], _UNSET)
        # The reference seeds EITHER the null-adjacent inner ring OR
        # (when the scene has no nulls at all) the raster edge — never
        # both (fmask/fillminima.py:55-65). cell_has_null is the global
        # flag; nullmask here additionally covers ghost slots.
        if cell_has_null:
            if nullmask.any() and not nullmask.all():
                dil = kernels._bool_dilate3(nullmask)
                ring = dil ^ nullmask
                seed[ring & present] = np.minimum(seed[ring & present], b)
        else:
            edge = np.zeros((h, W), dtype=bool)
            edge[:, 0] = edge[:, -1] = True
            if lo == 0:
                edge[0, :] = True
            if lo + h == cell_h:
                edge[-1, :] = True
            # only non-hmax border pixels seed (fmask/fillminima.py:61-65)
            edge &= (img != h_max) & present & ~nullmask
            seed[edge] = np.minimum(seed[edge], b)

        res = _local_fill_from_sources(img, nullmask, seed, h_min, h_max)
        core = ~halo
        out_img2 = res[rr[core] - lo, cc[core]]
        prev = pdf["img2"].to_numpy()[core]
        changed = (out_img2 != prev).astype(np.int32)
        return pd.DataFrame({
            "cell_id": pdf["cell_id"].to_numpy()[core],
            "r": rr[core].astype(np.int32),
            "c": cc[core].astype(np.int32),
            img_col: pdf[img_col].to_numpy()[core],
            "h_max": pdf["h_max"].to_numpy()[core],
            "h_min": pdf["h_min"].to_numpy()[core],
            "cell_h": pdf["cell_h"].to_numpy()[core],
            "cell_has_null": pdf["cell_has_null"].to_numpy()[core],
            "cell_bval": pdf["cell_bval"].to_numpy()[core],
            "img2": out_img2,
            "changed": changed,
        })

    from ..tiling import with_halo

    state = base
    for _ in range(max_rounds):
        haloed = with_halo(state, radius=1, tile_rows=tile_rows)
        new_state = haloed.groupBy("cell_id", "tile") \
            .applyInPandas(one_round, schema=schema).localCheckpoint()
        n_changed = new_state.agg(F.sum("changed")).collect()[0][0]
        state = new_state
        if not n_changed:
            break

    return state.withColumn(
        "filled",
        F.expr(f"case when {img_col} = {nullval} then cast({nullval} as bigint) "
               f"else img2 end")).select("cell_id", "r", "c",
                                         img_col, "filled")
