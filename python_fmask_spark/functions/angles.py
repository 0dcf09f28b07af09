"""Sun/satellite angle operators (P27-P29 in SURVEY §2.2).

``q_sun_angles`` transcribes the 6S POSSOL solar-position series
(sunAnglesForPoints, fmask/landsatangles.py:259-312) as pure column
trigonometry over each document's geocoded (lat, lon) and its warc_ts
(hour-of-day GMT + julian-day proportion) — whole-stage-codegen friendly,
identical in Spark SQL and DuckDB.
"""

from __future__ import annotations

from ..derive import documents_wide_sql, features_sql

PI = "3.141592653589793"


def q_sun_angles(d: str) -> str:
    feats = features_sql(d, documents_wide_sql(d, "documents"),
                         angles=False)
    # julian day proportion & GMT decimal hour from warc_ts.
    # cast int parts to double BEFORE division: Spark's int/decimal
    # division is scale-limited DECIMAL, not IEEE double.
    jdp = "(cast(dayofyear(warc_ts) as double) / 365.0)"
    hour_gmt = ("(hour(warc_ts) + cast(minute(warc_ts) as double) / 60.0 "
                "+ cast(second(warc_ts) as double) / 3600.0)")
    return f"""
WITH {feats},
t0 AS (
  SELECT url, lat, lon,
    radians(lat) AS lat_rad,
    {jdp} * 2 * {PI} AS jdpr,
    {hour_gmt} + lon / 15.0 AS mean_solar_time
  FROM features
),
t1 AS (
  SELECT *,
    (0.000075 + 0.001868 * cos(jdpr) - 0.032077 * sin(jdpr)
     - 0.014615 * cos(2 * jdpr) - 0.040849 * sin(2 * jdpr))
      * 12 * 60 / {PI} AS local_solar_diff,
    (0.006918 - 0.399912 * cos(jdpr) + 0.070257 * sin(jdpr)
     - 0.006758 * cos(2 * jdpr) + 0.000907 * sin(2 * jdpr)
     - 0.002697 * cos(3 * jdpr) + 0.001480 * sin(3 * jdpr)) AS delta
  FROM t0
),
t2 AS (
  SELECT *,
    (mean_solar_time + local_solar_diff / 60 - 12.0) * radians(15) AS ah
  FROM t1
),
t3 AS (
  SELECT *,
    (sin(lat_rad) * sin(delta)
     + cos(lat_rad) * cos(delta) * cos(ah)) AS cos_sun_zen,
    acos(sin(lat_rad) * sin(delta)
         + cos(lat_rad) * cos(delta) * cos(ah)) AS sun_zen
  FROM t2
),
t4 AS (
  SELECT *,
    least(greatest(cos(delta) * sin(ah) / sin(sun_zen), -1.0), 1.0)
      AS sin_az_sw,
    (-cos(lat_rad) * sin(delta)
     + sin(lat_rad) * cos(delta) * cos(ah)) / sin(sun_zen) AS cos_az_sw
  FROM t3
),
t5 AS (
  SELECT *,
    case
      when cos_az_sw <= 0 then {PI} - asin(sin_az_sw)
      when cos_az_sw > 0 and sin_az_sw <= 0 then 2 * {PI} + asin(sin_az_sw)
      else asin(sin_az_sw)
    end AS sun_az_sw
  FROM t4
),
t6 AS (
  SELECT *,
    case when sun_az_sw + {PI} > 2 * {PI}
         then sun_az_sw - {PI} else sun_az_sw + {PI} end AS sun_az
  FROM t5
)
SELECT url,
  cast(round(cos_sun_zen * 100000) as bigint) AS cos_sun_zen_e5,
  cast(round(delta * 1000000) as bigint) AS delta_e6,
  cast(round(local_solar_diff * 10000) as bigint) AS lsd_e4,
  cast(round(sun_az * 1000000) as bigint) AS sun_az_e6
FROM t6"""
    # The azimuth (incl. the asin/acos quadrant chain) IS oracle-compared,
    # quantized to 1e-6 rad: measured JVM-vs-libm divergence through the
    # full chain is <= 5e-14 on this data (shadow matching consumes
    # azimuths, so the quadrant logic must be pinned cross-engine).


def q_sat_angles(d: str) -> str:
    """P28/P29: the per-pixel 4-layer angle stack (makeAngles,
    fmask/landsatangles.py:347-382) — satellite azimuth/zenith from the
    nadir-line geometry and sun angles bilinearly interpolated from the
    extent corners (:385-400), in the reference's round(radians*100)
    int16 DN form. Exprs built once in derive.sat_angle_px_exprs and
    shared with the features derivation that feeds shadow matching."""
    feats = features_sql(d, documents_wide_sql(d, "documents"))
    return f"""
WITH {feats}
SELECT url, cell_id, r, c,
  sat_az_cdn, sat_zen_cdn, sun_az_cdn, sun_zen_cdn
FROM features"""


def q_sat_angles_grid(d: str, meta) -> str:
    """S7+P29+A13 wired end-to-end: the tile XML's sun/view angle grids
    (mean-over-bands view, sentinel2makeAnglesImage.py:95-107) bilinearly
    resampled per cell and per pixel (:95-123) via
    sen2meta.s2_grid_angle_parts. The grid VALUES are inlined from the
    parsed fixture XML, so a matching oracle hash proves the pipeline's
    angles carry the XML's numbers. Per-cell radians are emitted as
    nano-int for a dtype-stable compare; the *_cdn columns are already
    the reference's round(radians*100) int DN form."""
    feats = features_sql(d, documents_wide_sql(d, "documents"),
                         tile_meta=meta)
    nano = ", ".join(
        f"cast(round({c} * 1000000000.0) as bigint) AS {c}_nano"
        for c in ("sun_az", "sun_zen", "sat_az", "sat_zen"))
    return f"""
WITH {feats}
SELECT url, cell_id, r, c, {nano},
  sat_az_cdn, sat_zen_cdn, sun_az_cdn, sun_zen_cdn
FROM features"""


def q_toa_reflectance(d: str) -> str:
    """TOA reflectance (riosTOA, fmask/landsatTOA.py:118-148):
    p = pi * L * d^2 / (ESUN * cos(theta_z)), clipped to [0, 2] and scaled
    x10000 to int16, nulls propagated; earth-sun distance d from the
    day-of-year series (fmask/landsatTOA.py:102-115). Radiance L is
    derived from the synthetic blue-band DN with Landsat-7 band-1
    gain/bias; sun zenith comes from the POSSOL chain above."""
    sun = q_sun_angles(d)
    # reuse the sun-angle CTE chain; graft a radiance/TOA tail onto t6
    head, _tail = sun.split("SELECT url,\n  cast(round(cos_sun_zen", 1)
    jday = "dayofyear(warc_ts)"
    # d = 1 - 0.01673*cos(0.9856*(jday-4)*pi/180) (fmask/landsatTOA.py:113)
    dist = f"(1 - 0.01673 * cos(0.9856 * ({jday} - 4) * {PI} / 180.0))"
    gain, bias, esun = 0.778740, -6.98, 1969.0  # L7 B1 (landsatTOA.py:65-99)
    return f"""{head.rstrip()},
toa0 AS (
  SELECT t6.url, t6.cos_sun_zen, f.blue, f.warc_ts,
    {dist} AS dsun,
    (f.blue * {gain} + {bias}) AS rad
  FROM t6 JOIN features f ON f.url = t6.url
),
toa1 AS (
  SELECT *,
    least(greatest({PI} * rad * dsun * dsun
      / ({esun} * cos_sun_zen), 0.0), 2.0) AS reflectance
  FROM toa0
)
SELECT url,
  case when blue = 0 then 0
       else cast(round(reflectance * 10000) as int) end AS toa_dn,
  cast(round(dsun * 1000000) as bigint) AS dsun_e6
FROM toa1"""
