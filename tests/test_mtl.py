from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from python_fmask_spark.mtl import read_mtl_text, thermal_info_from_mtl  # noqa: E402

SAMPLE = """
GROUP = L1_METADATA_FILE
  SPACECRAFT_ID = "LANDSAT_7"
  ACQUISITION_DATE = 2002-05-14
  SCENE_CENTER_SCAN_TIME = 10:20:30Z
  RADIANCE_MULT_BAND_6 = 0.067087
  RADIANCE_ADD_BAND_6 = -0.06709
  K1_CONSTANT_BAND_6 = 666.09
  K2_CONSTANT_BAND_6 = 1282.71
END_GROUP = L1_METADATA_FILE
"""

LEGACY = 'SPACECRAFT_ID = "Landsat5"\nACQUISITION_DATE = 1999-01-02\n'


def test_mtl_parse_and_aliases():
    d = read_mtl_text(SAMPLE)
    assert d["SPACECRAFT_ID"] == "LANDSAT_7"
    assert d["DATE_ACQUIRED"] == "2002-05-14"  # legacy alias
    assert d["SCENE_CENTER_TIME"] == "10:20:30Z"
    t = thermal_info_from_mtl(d)
    assert t.k1 == 666.09 and t.k2 == 1282.71
    assert t.gain == 0.067087


def test_mtl_legacy_spacecraft_normalization():
    d = read_mtl_text(LEGACY)
    assert d["SPACECRAFT_ID"] == "LANDSAT_5"
