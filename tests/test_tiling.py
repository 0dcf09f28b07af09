"""Distributed-correctness properties: tiled+halo kernels and cross-tile
CCL must equal the whole-raster result for any tiling (FIXTURES.md §5
tile-decomposition property)."""

from __future__ import annotations

import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")

from python_fmask_spark import constants as C  # noqa: E402
from python_fmask_spark import tiling  # noqa: E402
from python_fmask_spark.operators import clumps, kernels  # noqa: E402

H = 100
W = C.SCENE_WIDTH


def _mask_df(spark, seed=7, density=0.45):
    rng = np.random.RandomState(seed)
    mask = rng.rand(H, W) > (1 - density)
    rows = []
    for r in range(H):
        for c in range(W):
            rows.append(("u%04d" % (r * W + c), "cellA", r, c, bool(mask[r, c])))
    pdf = pd.DataFrame(rows, columns=["url", "cell_id", "r", "c", "flag"])
    return spark.createDataFrame(pdf), mask


def test_tiled_majority_equals_whole(spark):
    df, mask = _mask_df(spark)
    out = tiling.tiled_neighborhood(
        df, kernels.majority3_buffer, "flag", "buf", radius=1,
        tile_rows=16).collect()
    whole = kernels.majority3_buffer(mask)
    assert len(out) == H * W
    for row in out:
        assert row.buf == bool(whole[row.r, row.c]), (row.r, row.c)


def test_tiled_dilate_equals_whole(spark):
    df, mask = _mask_df(spark, seed=13, density=0.1)
    radius = 2

    def k(a):
        return kernels.dilate(a, radius)

    out = tiling.tiled_neighborhood(df, k, "flag", "dil", radius=radius,
                                    tile_rows=16).collect()
    whole = kernels.dilate(mask, radius)
    for row in out:
        assert row.dil == bool(whole[row.r, row.c]), (row.r, row.c)


@pytest.mark.parametrize("tile_rows", [8, 16, 37])
def test_distributed_ccl_equals_whole(spark, tile_rows):
    df, mask = _mask_df(spark, seed=23, density=0.4)
    out = clumps.label_clumps_distributed(df, "flag", tile_rows=tile_rows) \
        .collect()
    whole, _n = kernels.label_components(mask, eight_connected=True)
    # canonicalize whole-raster labels to min linear index
    canon = {}
    for r in range(H):
        for c in range(W):
            lab = whole[r, c]
            if lab > 0:
                canon.setdefault(lab, r * W + c)
    got = {(row.r, row.c): row.clump_id for row in out}
    assert len(got) == int(mask.sum())
    for r in range(H):
        for c in range(W):
            if mask[r, c]:
                assert got[(r, c)] == canon[whole[r, c]], (tile_rows, r, c)


@pytest.mark.parametrize("tile_rows", [16, 37])
def test_fused_multi_kernel_equals_whole(spark, tile_rows):
    """tiled_neighborhood_multi with a composed kernel (majority then
    dilate, halo 1+2) must equal the whole-raster composition — the
    fused single-shuffle path of pipeline.interim_class_kernel."""
    df, mask = _mask_df(spark, seed=31, density=0.3)
    rng = np.random.RandomState(5)
    nullm = rng.rand(H, W) > 0.97
    pdf = df.toPandas()
    pdf["nullm"] = nullm[pdf["r"].to_numpy(), pdf["c"].to_numpy()]
    df2 = spark.createDataFrame(pdf)

    def fused(slabs):
        maj = kernels.majority3_buffer(slabs["flag"])
        m = maj & ~slabs["nullm"]
        return {"maj": maj, "m": m, "dil": kernels.dilate(m, 2)}

    out = tiling.tiled_neighborhood_multi(
        df2, fused, in_cols=("flag", "nullm"),
        out_cols=("maj", "m", "dil"), radius=3,
        tile_rows=tile_rows).collect()
    maj_w = kernels.majority3_buffer(mask)
    m_w = maj_w & ~nullm
    dil_w = kernels.dilate(m_w, 2)
    assert len(out) == H * W
    for row in out:
        assert row.maj == bool(maj_w[row.r, row.c]), (row.r, row.c)
        assert row.m == bool(m_w[row.r, row.c])
        assert row.dil == bool(dil_w[row.r, row.c]), (row.r, row.c)


def test_distributed_ccl_multi_cell_no_label_leak(spark):
    """Regression: local_label values are cell-local, so a seam merge in
    cell A must not remap the same label value in cell B. Cell A has a
    vertical bar crossing the tile seam (its seam merge maps the lower
    tile's label to the upper tile's); cell B has an isolated pixel at
    the lower tile's first bar coordinate — i.e. the SAME label value
    that cell A's union-find remaps."""
    tile_rows = 8
    rows = []
    # cell A: bar at c=3 spanning r=6..9 (crosses the r=7|8 seam).
    for r in range(6, 10):
        rows.append((f"a{r:03d}", "cellA", r, 3, True))
    # cell B: single pixel at (8, 3) -> local_label = 8*W+3, exactly the
    # value cell A's seam union-find maps to 6*W+3.
    rows.append(("b000", "cellB", 8, 3, True))
    # second cell-B pixel far away so the cell has >1 clump
    rows.append(("b001", "cellB", 0, 0, True))
    pdf = pd.DataFrame(rows, columns=["url", "cell_id", "r", "c", "flag"])
    df = spark.createDataFrame(pdf)
    out = clumps.label_clumps_distributed(df, "flag", tile_rows=tile_rows) \
        .collect()
    got = {(row.cell_id, row.r, row.c): row.clump_id for row in out}
    # cell A: one clump canonical at min linear index 6*W+3
    for r in range(6, 10):
        assert got[("cellA", r, 3)] == 6 * W + 3
    # cell B: the isolated pixel keeps its own label (NOT remapped to
    # cell A's root 6*W+3)
    assert got[("cellB", 8, 3)] == 8 * W + 3
    assert got[("cellB", 0, 0)] == 0


def test_with_halo_counts(spark):
    df, _ = _mask_df(spark)
    haloed = tiling.with_halo(df, radius=2, tile_rows=16)
    n_core = haloed.filter("not is_halo").count()
    assert n_core == H * W
    # each interior seam duplicates radius rows in each direction
    n_tiles = (H + 15) // 16
    n_seams = n_tiles - 1
    expected_halo = n_seams * (2 + 2) * W
    n_halo = haloed.filter("is_halo").count()
    assert n_halo == expected_halo, (n_halo, expected_halo)
