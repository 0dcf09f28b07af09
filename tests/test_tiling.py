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
