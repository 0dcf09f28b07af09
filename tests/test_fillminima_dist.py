"""Distributed fill-minima must equal the whole-scene kernel exactly,
for any tiling (the W6 tile-fixpoint property, SURVEY §7)."""

from __future__ import annotations

import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")

from python_fmask_spark import constants as C  # noqa: E402
from python_fmask_spark.operators import kernels  # noqa: E402
from python_fmask_spark.operators.fillminima_dist import (  # noqa: E402
    fill_minima_distributed,
)

W = C.SCENE_WIDTH


def _terrain(seed: int, H: int, with_nulls: bool) -> np.ndarray:
    rng = np.random.RandomState(seed)
    img = rng.randint(50, 200, size=(H, W)).astype(np.int64)
    # carve a few deep basins spanning tile boundaries
    for (r, c) in [(10, 2), (30, 5), (31, 5), (32, 5), (70, 3), (71, 3)]:
        if r < H:
            img[r, c] = rng.randint(1, 20)
    if with_nulls:
        img[5:9, 0:3] = 0
        img[50:52, :] = 0
    return img


@pytest.mark.parametrize("with_nulls,tile_rows,bval",
                         [(False, 16, 0), (True, 16, 0),
                          (False, 37, 80), (True, 32, 80)])
def test_distributed_fill_equals_whole(spark, with_nulls, tile_rows, bval):
    H = 96
    img = _terrain(11, H, with_nulls)
    rows = [("u%04d" % (r * W + c), "cellF", r, c, int(img[r, c]))
            for r in range(H) for c in range(W)]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["url", "cell_id", "r", "c", "nir"]))
    out = fill_minima_distributed(df, "nir", nullval=0, boundaryval=bval,
                                  tile_rows=tile_rows).collect()
    want = kernels.fill_minima(img, nullval=0, boundaryval=bval)
    got = {(r.r, r.c): r.filled for r in out}
    assert len(got) == H * W
    bad = [(r, c, got[(r, c)], int(want[r, c]))
           for r in range(H) for c in range(W)
           if got[(r, c)] != int(want[r, c])]
    assert not bad, f"{len(bad)} mismatches, first: {bad[:5]}"
