"""Sentinel-2 metadata sources (S7/S8): XML parsing, offset derivation,
the mandatory-offset gate, and the offsets reaching the SQL derivation.
Reference semantics: fmask/sen2meta.py:37-241, fmask/fmask.py:137-149,
fmask/cmdline/sentinel2Stacked.py:318-341."""

from __future__ import annotations

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

from python_fmask_spark import derive, sen2meta  # noqa: E402

TILE_XML = "/root/repo/tests/fixtures/MTD_TL_fixture.xml"
PROD_XML = "/root/repo/tests/fixtures/MTD_MSIL1C_fixture.xml"


def test_tile_meta_fields():
    m = sen2meta.Sen2TileMeta.from_file(TILE_XML)
    assert m.tile_id == "T55JFM"
    assert m.sat_id == "S2A"
    assert m.proc_level == "L1C"
    assert m.epsg == "32755"
    assert m.datetime.year == 2024 and m.datetime.month == 1
    assert m.dims_by_res["10"] == (10980, 10980)
    assert m.dims_by_res["60"] == (1830, 1830)
    assert m.ulxy_by_res["20"] == (600000.0, 6500020.0)
    assert m.angle_grid_xres == 5000.0
    assert m.sun_zenith_grid.shape == (3, 3)
    assert m.sun_azimuth_grid[0, 0] == np.float32(60.1)
    # angle-grid origin estimate (fmask/sen2meta.py:113-117)
    assert m.angles_ulxy == (600000.0 - 2500.0, 6500020.0 + 2500.0)


def test_tile_meta_view_angle_detector_merge():
    """Two detector strips with complementary NaN masks merge into one
    grid (fmask/sen2meta.py:133-152)."""
    m = sen2meta.Sen2TileMeta.from_file(TILE_XML)
    vz = m.view_zenith["0"]
    assert not np.isnan(vz).any()
    assert vz[0, 0] == np.float32(5.1)    # detector 1
    assert vz[0, 2] == np.float32(6.1)    # detector 2 fills the NaN hole
    va = m.view_azimuth["0"]
    assert va[2, 2] == np.float32(101.3)


def test_tile_meta_utm_and_centre():
    m = sen2meta.Sen2TileMeta.from_file(TILE_XML)
    assert m.get_utm_zone() == 55
    ctr_x, ctr_y = m.get_ctr_xy()
    assert ctr_x == 600000 + 5490 * 10
    lon, lat = m.get_ctr_long_lat()
    # zone 55S central meridian is 147E; tile sits east of it, southern
    # hemisphere mid-latitudes (northing 6.44M => lat ~ -32)
    assert 147.0 < lon < 150.0
    assert -34.0 < lat < -30.0


def test_zipfile_meta_and_offsets():
    m = sen2meta.Sen2ZipfileMeta.from_file(PROD_XML)
    assert m.scale_val == 10000.0
    assert m.nodata_val == 0
    assert m.saturated_val == 65535
    assert m.baseline_version == "05.00"
    assert m.offset_val_dict["B02"] == -1000
    offs = sen2meta.make_ref_offset_dict(m)
    assert offs["blue"] == -1000 and offs["cirrus"] == -1000
    assert set(offs) >= {"blue", "green", "red", "nir", "swir1",
                         "swir2", "cirrus"}


def test_pre_0400_product_defaults_to_zero_offsets():
    with open(PROD_XML) as f:
        xml = f.read()
    # strip the offset list -> pre-04.00 product -> implicit zeros
    start = xml.index("<Radiometric_Offset_List>")
    stop = xml.index("</Radiometric_Offset_List>") + \
        len("</Radiometric_Offset_List>")
    m = sen2meta.Sen2ZipfileMeta.from_string(xml[:start] + xml[stop:])
    assert all(v == 0 for v in m.offset_val_dict.values())


def test_mandatory_offset_gate():
    """SENTINEL2 derivation refuses to render without explicit offsets
    (fmask/fmask.py:137-149)."""
    with pytest.raises(sen2meta.Sen2MetaError):
        derive.pass1_sql("spark", sensor="SENTINEL2")
    # Landsat needs no offsets
    derive.pass1_sql("spark", sensor="LANDSAT8")


def test_offsets_reach_the_sql():
    sql = derive.pass1_sql("spark", sensor="SENTINEL2",
                           s2_offsets={"blue": -1000})
    assert "cast(blue as double) + -1000" in sql
    sql0 = derive.pass1_sql(
        "spark", sensor="SENTINEL2",
        s2_offsets={b: 0 for b in ("blue", "green", "red")})
    assert "+ -1000" not in sql0


def test_angle_grid_df(spark):
    m = sen2meta.Sen2TileMeta.from_file(TILE_XML)
    df = sen2meta.angle_grid_df(spark, m)
    rows = {(r.grid_r, r.grid_c): r for r in df.collect()}
    assert len(rows) == 9
    assert rows[(0, 0)].sun_zen_deg == pytest.approx(30.1, abs=1e-5)
    assert rows[(0, 2)].view_zen_deg == pytest.approx(6.1, abs=1e-5)
