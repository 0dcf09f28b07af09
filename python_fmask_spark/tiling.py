"""Tiling, halo exchange, and skew-aware repartitioning.

A cell's raster (height H, fixed width SCENE_WIDTH) is split into
horizontal tiles of TILE_SIZE rows. Neighborhood kernels (majority,
dilation, focal variance) need ``radius`` rows of context across tile
seams — the reference gets this via RIOS overlap reads
(fmask/fmask.py:262-263,706-711,1326); we get it with ``with_halo``:
each boundary row is duplicated into the adjacent tile BEFORE the
groupBy, so the kernel shuffle is one pass and needs no self-join.

Scale notes: halo duplication is O(radius/TILE_SIZE) overhead (<7% for
radius 2, tiles 32). The (cell_id, tile) grouping key is already salt-like
— a mega-cell fans out to H/TILE_SIZE independent tasks, which is the
explicit skew answer required by the north rule; ``salted_repartition``
covers the columnar stages.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import constants as C
from .session import ensure_package_on_executors


def with_tiles(df: DataFrame, tile_rows: int = C.TILE_SIZE) -> DataFrame:
    """Assign each pixel row to its (cell_id, tile) group."""
    return df.withColumn("tile", F.expr(f"r div {tile_rows}"))


def with_halo(df: DataFrame, radius: int,
              tile_rows: int = C.TILE_SIZE) -> DataFrame:
    """Duplicate each tile-boundary row into the neighboring tile as halo.

    Returns df + columns (tile, is_halo). Implemented as a single-pass
    explode: each row emits its core (tile, is_halo=false) entry plus up
    to two halo entries for adjacent tiles. One scan of the input — no
    union (a union re-evaluates an unmaterialized upstream plan once per
    branch) and no join; the only shuffle is the consumer's groupBy on
    (cell_id, tile)."""
    entries = (
        f"filter(array("
        f"  named_struct('tile', r div {tile_rows}, 'is_halo', false),"
        f"  if(pmod(r, {tile_rows}) < {radius} and r div {tile_rows} > 0,"
        f"     named_struct('tile', r div {tile_rows} - 1, 'is_halo', true),"
        f"     null),"
        f"  if(pmod(r, {tile_rows}) >= {tile_rows} - {radius},"
        f"     named_struct('tile', r div {tile_rows} + 1, 'is_halo', true),"
        f"     null)"
        f"), x -> x is not null)")
    return (df.withColumn("_t", F.explode(F.expr(entries)))
              .withColumn("tile", F.col("_t.tile"))
              .withColumn("is_halo", F.col("_t.is_halo"))
              .drop("_t"))


def tiled_neighborhood(
    df: DataFrame,
    kernel: Callable[[np.ndarray], np.ndarray],
    in_col: str,
    out_col: str,
    radius: int,
    tile_rows: int = C.TILE_SIZE,
    out_type: str = "boolean",
    passthrough: tuple[str, ...] = (),
    carry_url: bool = True,
) -> DataFrame:
    """Run a 2-D neighborhood kernel tile-parallel with halo exchange.

    ``carry_url=False`` drops the url identity from the halo exchange —
    (cell_id, r, c) identifies the pixel, and shipping the ~40-byte url
    through the sort (twice, with halo duplication) was measured as the
    morphology stage's largest spill contributor; callers join url back
    JVM-side on (cell_id, r, c).

    ``kernel`` maps a bool/int raster slab -> same-shape array; it must
    use reflect borders (all kernels in operators/kernels.py do). The
    slab passed to the kernel covers [tile_start - radius, tile_end +
    radius] rows; only core rows are emitted, so seam rows equal the
    whole-raster result exactly (property-tested).

    The slab's synthetic edges are only reached where the halo is
    truncated by the true raster border — where reflect is the correct
    semantic anyway.
    """
    W = C.SCENE_WIDTH
    ensure_package_on_executors(df.sparkSession)
    passthrough = tuple(p for p in passthrough if p != in_col)
    id_cols = (["url"] if carry_url else []) + ["cell_id", "r", "c"]
    sel = [*id_cols, in_col, *passthrough]
    haloed = with_halo(df.select(*sel), radius, tile_rows)

    dtypes = dict(df.dtypes)
    pass_schema = "".join(
        f", {name} {dtypes[name]}" for name in (in_col, *passthrough))
    url_schema = "url string, " if carry_url else ""
    schema = (f"{url_schema}cell_id string, r int, c int, "
              f"{out_col} {out_type}{pass_schema}")

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        r = pdf["r"].to_numpy()
        slab_lo = r.min()
        slab_hi = r.max()
        h = slab_hi - slab_lo + 1
        arr = np.zeros((h, W), dtype=bool)
        arr[r - slab_lo, pdf["c"].to_numpy()] = \
            pdf[in_col].to_numpy().astype(bool)
        res = kernel(arr)
        core = ~pdf["is_halo"].to_numpy()
        rr = r[core]
        out = {}
        if carry_url:
            out["url"] = pdf["url"].to_numpy()[core]
        out.update({
            "cell_id": pdf["cell_id"].to_numpy()[core],
            "r": rr.astype(np.int32),
            "c": pdf["c"].to_numpy()[core].astype(np.int32),
            out_col: res[rr - slab_lo, pdf["c"].to_numpy()[core]],
        })
        for name in (in_col, *passthrough):
            out[name] = pdf[name].to_numpy()[core]
        return pd.DataFrame(out)

    return haloed.groupBy("cell_id", "tile").applyInPandas(run, schema=schema)


def tiled_neighborhood_multi(
    df: DataFrame,
    kernel: Callable[[dict[str, np.ndarray]], dict[str, np.ndarray]],
    in_cols: tuple[str, ...],
    out_cols: tuple[str, ...],
    radius: int,
    tile_rows: int = C.TILE_SIZE,
    out_type: str = "boolean",
    passthrough: tuple[str, ...] = (),
    carry_url: bool = True,
    pack_bools: bool = True,
) -> DataFrame:
    """Fused multi-stage neighborhood kernels over ONE halo shuffle.

    ``carry_url=False``: see tiled_neighborhood — identity joins back
    on (cell_id, r, c) instead of riding the halo sort.

    ``pack_bools=True`` (default) packs every boolean input/passthrough
    column into ONE tinyint bitmask for the halo exchange: the sort
    feeding applyInPandas stores each field in an 8-byte UnsafeRow
    slot, so k booleans cost 8k bytes there — the bitmask makes that 8
    total. The kernel sees ordinary unpacked slabs and the output
    schema is unchanged (Arrow transfers bools as bits either way; only
    the JVM-side exchange width changes).

    ``kernel`` maps {in_col: raster slab} -> {out_col: same-shape
    array}; ``radius`` must cover the composed reach (e.g. majority(1)
    then dilate(5) -> 6). Composing k local operators into one tile pass
    costs one shuffle and one Arrow round trip instead of k — the
    halo grows additively while the exchanged bytes drop k-fold.
    Seam-correctness argument is the same as tiled_neighborhood: core
    outputs only depend on inputs within ``radius`` rows, all present
    on the slab; synthetic slab edges coincide with true raster borders
    where reflect is the correct semantic."""
    W = C.SCENE_WIDTH
    ensure_package_on_executors(df.sparkSession)
    passthrough = tuple(p for p in passthrough if p not in in_cols)
    id_cols = (["url"] if carry_url else []) + ["cell_id", "r", "c"]
    dtypes = dict(df.dtypes)
    data_cols = (*in_cols, *passthrough)
    packed = tuple(n for n in data_cols
                   if dtypes[n] == "boolean") if pack_bools else ()
    unpacked = tuple(n for n in data_cols if n not in packed)
    if len(packed) > 1:
        pack_expr = " + ".join(f"{1 << i} * cast({n} as int)"
                               for i, n in enumerate(packed))
        pre = df.select(
            *id_cols,
            F.expr(f"cast({pack_expr} as tinyint)").alias("_bf"),
            *unpacked)
        wire_cols = ("_bf", *unpacked)
    else:
        packed = ()
        pre = df.select(*id_cols, *data_cols)
        wire_cols = data_cols
    haloed = with_halo(pre, radius, tile_rows)

    out_schema = "".join(f", {name} {out_type}" for name in out_cols)
    pass_schema = "".join(
        f", {name} {dtypes[name]}" for name in data_cols)
    url_schema = "url string, " if carry_url else ""
    schema = (f"{url_schema}cell_id string, r int, c int"
              f"{out_schema}{pass_schema}")
    del wire_cols  # documentation only; run() reads _bf/unpacked

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        r = pdf["r"].to_numpy()
        slab_lo = r.min()
        h = r.max() - slab_lo + 1
        cc_all = pdf["c"].to_numpy()
        cols = {}
        if packed:
            bf = pdf["_bf"].to_numpy()
            for i, name in enumerate(packed):
                cols[name] = (bf & (1 << i)) != 0
        for name in unpacked:
            cols[name] = pdf[name].to_numpy()
        slabs = {}
        for name in in_cols:
            arr = np.zeros((h, W), dtype=bool)
            arr[r - slab_lo, cc_all] = cols[name].astype(bool)
            slabs[name] = arr
        res = kernel(slabs)
        core = ~pdf["is_halo"].to_numpy()
        rr = r[core]
        cc = cc_all[core]
        out = {}
        if carry_url:
            out["url"] = pdf["url"].to_numpy()[core]
        out.update({
            "cell_id": pdf["cell_id"].to_numpy()[core],
            "r": rr.astype(np.int32),
            "c": cc.astype(np.int32),
        })
        for name in out_cols:
            out[name] = res[name][rr - slab_lo, cc]
        for name in data_cols:
            out[name] = cols[name][core]
        return pd.DataFrame(out)

    return haloed.groupBy("cell_id", "tile").applyInPandas(run, schema=schema)


def salted_repartition(df: DataFrame, target_rows_per_partition: int = 500_000,
                       key: str = "cell_id") -> DataFrame:
    """Explicit skew salting (north rule): a cheap count pre-pass derives
    a per-cell salt factor; rows are repartitioned on (key, salt bucket)
    so one Zipf-hot cell spreads over ceil(n/target) partitions.

    The salt table is tiny (one row per cell) -> broadcast join."""
    counts = df.groupBy(key).count() \
        .withColumn("salt_n", F.expr(
            f"greatest(1, cast(ceil(count / {target_rows_per_partition}) as int))")) \
        .drop("count")
    # explicit partition count: user-specified numbers survive AQE's
    # small-partition coalescing (which would otherwise undo the salt
    # fan-out at low volumes)
    n_parts = max(1, int(counts.agg(F.sum("salt_n")).collect()[0][0] or 1))
    salted = (df.join(F.broadcast(counts), key)
                .withColumn("salt", F.expr("pmod(hash(url), salt_n)")))
    return salted.repartition(n_parts, F.col(key), F.col("salt")) \
        .drop("salt_n", "salt")
