"""Sentinel-2 metadata sources (S7/S8 in SURVEY §2.1).

Driver-side stdlib-XML parsers for the two ESA metadata files the
reference consumes (fmask/sen2meta.py:37-152 ``Sen2TileMeta``,
:198-241 ``Sen2ZipfileMeta``), re-expressed Spark-first:

* parsing happens on the driver (the XMLs are a few hundred KB — never
  worth a distributed read);
* the per-tile angle grids become a small DataFrame
  (``angle_grid_df``) broadcast-joinable onto the pixel table;
* the product-level radiometric offsets become the ``ref_offsets``
  dict that parameterizes the SENTINEL2 SQL derivation
  (ref = (dn + offset) / scale, fmask/fmask.py:502-543), with the
  mandatory-offset enforcement of fmask/fmask.py:137-149: the S2
  dispatch refuses to run without an explicit offset dict (ESA
  processing baseline 04.00 broke implicit scaling in Nov 2021).

No osgeo dependency: the scene-centre lat/lon uses a standard
UTM-inverse series (Snyder 1987 eqs 8-17..8-25) instead of OSR.
"""

from __future__ import annotations

import datetime
import math
from dataclasses import dataclass, field
from xml.etree import ElementTree

import numpy as np

# ESA bandId index -> band name (fmask/sen2meta.py:191-195; 'B08A' kept
# zero-padded so names sort in bandId order).
NAME_FROM_BAND_ID = ["B01", "B02", "B03", "B04", "B05", "B06", "B07",
                     "B08", "B08A", "B09", "B10", "B11", "B12"]

# engine band column -> S2 band name (the correspondence table of
# fmask/cmdline/sentinel2Stacked.py:318-341 makeRefOffsetDict).
ENGINE_BAND_TO_S2 = {
    "blue": "B02", "green": "B03", "red": "B04", "nir": "B08",
    "swir1": "B11", "swir2": "B12", "cirrus": "B10",
    "nir8a": "B08A", "nir7": "B07", "watervapour": "B09",
}


class Sen2MetaError(ValueError):
    pass


def _ns(root) -> dict[str, str]:
    prefix = root.tag[: root.tag.index("}") + 1]
    return {"n1": prefix[1:-1]}


def _value_array(values_list_node) -> np.ndarray:
    """<Values_List> -> 2-d float32 array (fmask/sen2meta.py:119-131);
    'NaN' entries parse to nan like the reference's numpy.float32()."""
    rows = [[np.float32(x) for x in v.text.strip().split()]
            for v in values_list_node.findall("VALUES")]
    return np.array(rows)


@dataclass
class Sen2TileMeta:
    """Tile (granule) metadata: sensing time, EPSG, per-resolution grid
    geometry, sun/view angle grids (fmask/sen2meta.py:37-117)."""

    datetime: datetime.datetime
    tile_id: str
    sat_id: str
    proc_level: str
    epsg: str
    dims_by_res: dict[str, tuple[int, int]]
    ulxy_by_res: dict[str, tuple[float, float]]
    angle_grid_xres: float
    angle_grid_yres: float
    sun_zenith_grid: np.ndarray
    sun_azimuth_grid: np.ndarray
    view_zenith: dict[str, np.ndarray] = field(default_factory=dict)
    view_azimuth: dict[str, np.ndarray] = field(default_factory=dict)
    angles_ulxy: tuple[float, float] = (0.0, 0.0)

    @classmethod
    def from_string(cls, xml_str: str) -> "Sen2TileMeta":
        root = ElementTree.fromstring(xml_str)
        ns = _ns(root)
        gen = root.find("n1:General_Info", ns)
        sensing = gen.find("SENSING_TIME").text.strip()
        dt = datetime.datetime.strptime(sensing, "%Y-%m-%dT%H:%M:%S.%fZ")
        tile_full = gen.find("TILE_ID").text.strip()
        geom = root.find("n1:Geometric_Info", ns)
        geocoding = geom.find("Tile_Geocoding")
        epsg = geocoding.find("HORIZONTAL_CS_CODE").text.split(":")[1]
        dims = {s.attrib["resolution"]:
                (int(s.find("NROWS").text), int(s.find("NCOLS").text))
                for s in geocoding.findall("Size")}
        ulxy = {p.attrib["resolution"]:
                (float(p.find("ULX").text), float(p.find("ULY").text))
                for p in geocoding.findall("Geoposition")}
        tile_angles = geom.find("Tile_Angles")
        sun_zen_node = tile_angles.find("Sun_Angles_Grid").find("Zenith")
        xres = float(sun_zen_node.find("COL_STEP").text)
        yres = float(sun_zen_node.find("ROW_STEP").text)
        sun_zen = _value_array(sun_zen_node.find("Values_List"))
        sun_az = _value_array(
            tile_angles.find("Sun_Angles_Grid").find("Azimuth")
            .find("Values_List"))

        # Per-band view angles: each detector strip is a separate grid
        # with nans outside its swath; strips merge by nan-masked
        # overlay (fmask/sen2meta.py:133-152).
        view_zen: dict[str, np.ndarray] = {}
        view_az: dict[str, np.ndarray] = {}
        for node in tile_angles.findall("Viewing_Incidence_Angles_Grids"):
            band_id = node.attrib["bandId"]
            for name, acc in (("Zenith", view_zen), ("Azimuth", view_az)):
                arr = _value_array(node.find(name).find("Values_List"))
                if band_id not in acc:
                    acc[band_id] = arr
                else:
                    m = ~np.isnan(arr)
                    acc[band_id][m] = arr[m]

        ulx, uly = ulxy["10"]
        return cls(
            datetime=dt, tile_id=tile_full.split("_")[-2],
            sat_id=tile_full[:3], proc_level=tile_full[13:16],
            epsg=epsg, dims_by_res=dims, ulxy_by_res=ulxy,
            angle_grid_xres=xres, angle_grid_yres=yres,
            sun_zenith_grid=sun_zen, sun_azimuth_grid=sun_az,
            view_zenith=view_zen, view_azimuth=view_az,
            # angle-grid origin estimate (fmask/sen2meta.py:113-117)
            angles_ulxy=(ulx - xres / 2.0, uly + yres / 2.0))

    @classmethod
    def from_file(cls, path: str) -> "Sen2TileMeta":
        with open(path) as f:
            return cls.from_string(f.read())

    def get_utm_zone(self) -> int:
        if not (self.epsg.startswith("327") or self.epsg.startswith("326")):
            raise Sen2MetaError(
                f"Cannot determine UTM zone from EPSG:{self.epsg}")
        return int(self.epsg[3:])

    def get_ctr_xy(self) -> tuple[float, float]:
        nrows, ncols = self.dims_by_res["10"]
        ulx, uly = self.ulxy_by_res["10"]
        return (ulx + (ncols // 2) * 10, uly - (nrows // 2) * 10)

    def get_ctr_long_lat(self) -> tuple[float, float]:
        """Scene-centre (lon, lat) via the UTM inverse series (Snyder
        1987, eqs 8-17..8-25) — OSR-free, accurate to ~1e-6 deg."""
        x, y = self.get_ctr_xy()
        zone = self.get_utm_zone()
        south = self.epsg.startswith("327")
        return _utm_inverse(x, y, zone, south)


def _utm_inverse(x: float, y: float, zone: int, south: bool
                 ) -> tuple[float, float]:
    """UTM -> (lon, lat) on WGS84 (Snyder 1987 series)."""
    a = 6378137.0
    f = 1 / 298.257223563
    k0 = 0.9996
    e2 = f * (2 - f)
    ep2 = e2 / (1 - e2)
    x = x - 500000.0
    if south:
        y = y - 10000000.0
    m = y / k0
    mu = m / (a * (1 - e2 / 4 - 3 * e2 ** 2 / 64 - 5 * e2 ** 3 / 256))
    e1 = (1 - math.sqrt(1 - e2)) / (1 + math.sqrt(1 - e2))
    phi1 = (mu + (3 * e1 / 2 - 27 * e1 ** 3 / 32) * math.sin(2 * mu)
            + (21 * e1 ** 2 / 16 - 55 * e1 ** 4 / 32) * math.sin(4 * mu)
            + (151 * e1 ** 3 / 96) * math.sin(6 * mu)
            + (1097 * e1 ** 4 / 512) * math.sin(8 * mu))
    sin1, cos1, tan1 = math.sin(phi1), math.cos(phi1), math.tan(phi1)
    c1 = ep2 * cos1 ** 2
    t1 = tan1 ** 2
    n1 = a / math.sqrt(1 - e2 * sin1 ** 2)
    r1 = a * (1 - e2) / (1 - e2 * sin1 ** 2) ** 1.5
    d = x / (n1 * k0)
    lat = phi1 - (n1 * tan1 / r1) * (
        d ** 2 / 2
        - (5 + 3 * t1 + 10 * c1 - 4 * c1 ** 2 - 9 * ep2) * d ** 4 / 24
        + (61 + 90 * t1 + 298 * c1 + 45 * t1 ** 2 - 252 * ep2
           - 3 * c1 ** 2) * d ** 6 / 720)
    lon = (d - (1 + 2 * t1 + c1) * d ** 3 / 6
           + (5 - 2 * c1 + 28 * t1 - 3 * c1 ** 2 + 8 * ep2
              + 24 * t1 ** 2) * d ** 5 / 120) / cos1
    lon0 = math.radians((zone - 1) * 6 - 180 + 3)
    return (math.degrees(lon) + math.degrees(lon0), math.degrees(lat))


@dataclass
class Sen2ZipfileMeta:
    """Product-level metadata: quantification scale, special values,
    radiometric offsets, baseline version (fmask/sen2meta.py:198-241)."""

    scale_val: float
    nodata_val: int
    saturated_val: int
    offset_val_dict: dict[str, int]
    baseline_version: str

    @classmethod
    def from_string(cls, xml_str: str) -> "Sen2ZipfileMeta":
        root = ElementTree.fromstring(xml_str)
        ns = _ns(root)
        gen = root.find("n1:General_Info", ns)
        pic = gen.find("Product_Image_Characteristics", ns)
        scale = float(pic.find("QUANTIFICATION_VALUE", ns).text)
        nodata = saturated = 0
        for node in pic.findall("Special_Values", ns):
            name = node.find("SPECIAL_VALUE_TEXT", ns).text
            val = int(node.find("SPECIAL_VALUE_INDEX", ns).text)
            if name == "NODATA":
                nodata = val
            elif name == "SATURATED":
                saturated = val
        offsets: dict[str, int] = {}
        nodes = gen.findall(
            "Product_Image_Characteristics/Radiometric_Offset_List/"
            "RADIO_ADD_OFFSET", ns)
        if not nodes:
            # pre-04.00 product: offsets implicitly zero
            offsets = {k: 0 for k in NAME_FROM_BAND_ID}
        else:
            for node in nodes:
                offsets[NAME_FROM_BAND_ID[int(node.attrib["band_id"])]] = \
                    int(node.text)
        baseline = gen.find("Product_Info/PROCESSING_BASELINE", ns).text
        return cls(scale_val=scale, nodata_val=nodata,
                   saturated_val=saturated, offset_val_dict=offsets,
                   baseline_version=baseline)

    @classmethod
    def from_file(cls, path: str) -> "Sen2ZipfileMeta":
        with open(path) as f:
            return cls.from_string(f.read())


def make_ref_offset_dict(zip_meta: Sen2ZipfileMeta) -> dict[str, int]:
    """Product offsets keyed by ENGINE band column names (the
    makeRefOffsetDict correspondence,
    fmask/cmdline/sentinel2Stacked.py:318-341)."""
    return {band: zip_meta.offset_val_dict[s2name]
            for band, s2name in ENGINE_BAND_TO_S2.items()
            if s2name in zip_meta.offset_val_dict}


def require_s2_offsets(offsets: dict[str, int] | None) -> dict[str, int]:
    """The mandatory-offset gate (fmask/fmask.py:137-149): Sentinel-2
    processing refuses to start without an explicit offset dict."""
    if offsets is None:
        raise Sen2MetaError(
            "When using Fmask with Sentinel-2, reflectance offsets must "
            "be explicitly set (ESA processing baseline 04.00, Nov 2021 "
            "added offsets to the imagery). Parse the product XML with "
            "Sen2ZipfileMeta and pass make_ref_offset_dict(meta).")
    return offsets


def angle_grid_df(spark, meta: Sen2TileMeta):
    """The tile's sun/view angle grids as a small DataFrame
    (grid_r, grid_c, sun_zen_deg, sun_az_deg, view_zen_deg, view_az_deg)
    — broadcast-joinable onto the pixel table after bilinear lookup.
    View angles are the mean over bands (A13's mean-over-bands grid,
    fmask/landsatangles.py usage pattern)."""
    import pandas as pd

    sz = meta.sun_zenith_grid
    sa = meta.sun_azimuth_grid
    vz = (np.nanmean(np.stack(list(meta.view_zenith.values())), axis=0)
          if meta.view_zenith else np.full_like(sz, np.nan))
    va = (np.nanmean(np.stack(list(meta.view_azimuth.values())), axis=0)
          if meta.view_azimuth else np.full_like(sz, np.nan))
    h, w = sz.shape
    rr, cc = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    pdf = pd.DataFrame({
        "grid_r": rr.ravel().astype(np.int32),
        "grid_c": cc.ravel().astype(np.int32),
        "sun_zen_deg": sz.ravel().astype(np.float64),
        "sun_az_deg": sa.ravel().astype(np.float64),
        "view_zen_deg": vz.ravel().astype(np.float64),
        "view_az_deg": va.ravel().astype(np.float64),
    })
    return spark.createDataFrame(pdf)
