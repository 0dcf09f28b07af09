"""Remaining SURVEY §2 inventory operators with SQL oracles.

- zero-band check (P26/A12; fmask/zerocheck.py:30-71)
- inverted value->pixels index (A10; fmask/valueindexes.py:98-150)
- image-corner extremes (A11; fmask/landsatangles.py:113-150)
- resolution-bridging join (J3/S10; fmask/fmask.py:862-891,
  fmask/cmdline/sentinel2Stacked.py:148-158): fine->coarse aggregate
  and coarse->fine broadcast-back in one query
"""

from __future__ import annotations

from ..derive import documents_wide_sql, features_sql


def _feats(d: str) -> str:
    return features_sql(d, documents_wide_sql(d, "documents"),
                        angles=False)


def q_zero_band_check(d: str) -> str:
    """All-zero band detection per cell (stats-max short circuit,
    fmask/zerocheck.py:30-71): a band is 'all zeroes' iff max == 0."""
    return f"""
WITH {_feats(d)}
SELECT cell_id,
  cast(case when max(blue) = 0 then 1 else 0 end as int) AS blue_all_zero,
  cast(case when max(therm_dn) = 0 then 1 else 0 end as int) AS therm_all_zero,
  max(nir) AS max_nir, max(therm_dn) AS max_therm
FROM features GROUP BY cell_id"""


def q_value_index(d: str) -> str:
    """Inverted value->pixel-locations index (ValueIndexes,
    fmask/valueindexes.py:98-150; C kernel c_src/valueindexes.c:40-133):
    one hash aggregation builds all per-value pixel lists. Compared via
    per-value count + coordinate checksums (list ordering is
    partition-dependent, the SET is what the reference exposes)."""
    return f"""
WITH {_feats(d)}
SELECT cell_id, latent AS value,
  count(*) AS n_pixels,
  cast(sum(cast(r as bigint) * 131071 + c) as bigint) AS coord_checksum,
  min(cast(r as bigint) * {8} + c) AS first_pixel_linear
FROM features GROUP BY cell_id, latent"""


def q_cell_corners(d: str) -> str:
    """Per-cell corner extremes via argmin/argmax (findCorners,
    fmask/landsatangles.py:113-150): url at min/max linear pixel index."""
    return f"""
WITH {_feats(d)},
lin AS (
  SELECT *, cast(r as bigint) * {8} + c AS linear_idx FROM features
)
SELECT cell_id,
  min_by(url, linear_idx) AS top_left_url,
  max_by(url, linear_idx) AS bottom_right_url,
  min(linear_idx) AS min_linear, max(linear_idx) AS max_linear
FROM lin GROUP BY cell_id"""


def q_resample_coarse(d: str) -> str:
    """Resolution-bridging join (J3): fine pixels aggregate to coarse
    2x2 blocks (average resample, fmask S10 'average' method), then the
    coarse value joins back onto every fine pixel (the thermal-grid
    alignment pattern of make3Dclouds, fmask/fmask.py:862-891)."""
    return f"""
WITH {_feats(d)},
fine AS (
  SELECT url, cell_id, r, c, nir,
    cast(floor(r / 2.0) as int) AS cr, cast(floor(c / 2.0) as int) AS cc
  FROM features
),
coarse AS (
  SELECT cell_id, cr, cc,
    cast(floor(avg(cast(nir as double))) as bigint) AS nir_coarse,
    count(*) AS n_fine
  FROM fine GROUP BY cell_id, cr, cc
)
SELECT f.url, f.cell_id, f.r, f.c, f.nir, co.nir_coarse, co.n_fine
FROM fine f JOIN coarse co
  ON co.cell_id = f.cell_id AND co.cr = f.cr AND co.cc = f.cc"""
