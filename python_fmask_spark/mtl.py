"""Metadata sidecar sources (S5/S6 in SURVEY §2.1).

MTL KEY = value parsing with legacy-format normalization (readMTLFile,
fmask/config.py:792-817) and thermal calibration extraction
(readThermalInfoFromLandsatMTL, fmask/config.py:551-610, simplified to
the modern-format keys). These are driver-side parses whose results
broadcast into the plan as literal columns / Python scalars — the same
role the reference's config dicts play.
"""

from __future__ import annotations

from dataclasses import dataclass


def read_mtl_text(text: str) -> dict[str, str]:
    """Parse MTL `KEY = value` lines into a dict, with the reference's
    legacy-field aliasing and spacecraft-id normalization."""
    out: dict[str, str] = {}
    for line in text.splitlines():
        arr = line.split("=")
        if len(arr) == 2:
            key, value = arr
            out[key.strip()] = value.replace('"', "").strip()

    if "ACQUISITION_DATE" in out:
        out["DATE_ACQUIRED"] = out["ACQUISITION_DATE"]
    if "SCENE_CENTER_SCAN_TIME" in out:
        out["SCENE_CENTER_TIME"] = out["SCENE_CENTER_SCAN_TIME"]

    spacecraft = out.get("SPACECRAFT_ID", "")
    if spacecraft.startswith("Landsat") and "_" not in spacecraft:
        out["SPACECRAFT_ID"] = "LANDSAT_" + spacecraft[-1]
    return out


def read_mtl_file(path: str) -> dict[str, str]:
    with open(path) as f:
        return read_mtl_text(f.read())


@dataclass(frozen=True)
class ThermalInfo:
    """Thermal band calibration (fmask/config.py:485-521)."""
    gain: float
    offset: float
    k1: float
    k2: float


# Thermal band number per spacecraft (fmask/config.py:537-541)
LANDSAT_TH_BAND_NUM = {"LANDSAT_4": "6", "LANDSAT_5": "6",
                       "LANDSAT_7": "6_VCID_1",
                       "LANDSAT_8": "10", "LANDSAT_9": "10"}

# L4/5/7 MTLs often omit K1/K2; published constants by sensor id
# (fmask/config.py:544-548)
LANDSAT_K1 = {"TM": 607.76, "ETM": 666.09, "ETM+": 666.09}
LANDSAT_K2 = {"TM": 1260.56, "ETM": 1282.71, "ETM+": 1282.71}


def thermal_info_from_mtl(mtl: dict[str, str],
                          band: str | None = None) -> ThermalInfo:
    """Thermal calibration from an MTL dict, covering all three MTL
    generations (readThermalInfoFromLandsatMTL, fmask/config.py:551-610):

    * modern:  RADIANCE_MULT/ADD_BAND_n + K1/K2_CONSTANT_BAND_n
    * oldest:  LMIN/LMAX/QCALMIN/QCALMAX_BANDn -> gain/offset derived
               (gain = (lMax-lMin)/(qcalMax-qcalMin),
                offset = lMin - qcalMin*gain); L7 uses band '61' keys
    * missing K1/K2: fall back to the published per-sensor constants
    """
    spacecraft = mtl.get("SPACECRAFT_ID")
    if band is None:
        if spacecraft not in LANDSAT_TH_BAND_NUM:
            raise KeyError("Cannot find SPACECRAFT_ID in MTL file")
        band = LANDSAT_TH_BAND_NUM[spacecraft]

    mult_key = f"RADIANCE_MULT_BAND_{band}"
    if mult_key in mtl:
        gain = float(mtl[mult_key])
        offset = float(mtl[f"RADIANCE_ADD_BAND_{band}"])
    else:
        # oldest-format MTL (fmask/config.py:576-585)
        old_band = "61" if spacecraft == "LANDSAT_7" else band
        l_max = float(mtl[f"LMAX_BAND{old_band}"])
        l_min = float(mtl[f"LMIN_BAND{old_band}"])
        qcal_max = float(mtl[f"QCALMAX_BAND{old_band}"])
        qcal_min = float(mtl[f"QCALMIN_BAND{old_band}"])
        gain = (l_max - l_min) / (qcal_max - qcal_min)
        offset = l_min - qcal_min * gain

    k1_key, k2_key = f"K1_CONSTANT_BAND_{band}", f"K2_CONSTANT_BAND_{band}"
    if k1_key in mtl:
        k1 = float(mtl[k1_key])
        k2 = float(mtl[k2_key])
    else:
        sensor = mtl.get("SENSOR_ID")
        if sensor not in LANDSAT_K1:
            raise KeyError("Cannot find SENSOR_ID in MTL file")
        k1, k2 = LANDSAT_K1[sensor], LANDSAT_K2[sensor]
    return ThermalInfo(gain=gain, offset=offset, k1=k1, k2=k2)


def q_thermal_calib(d: str,
                    infos: dict[str, tuple[float, float, float, float]]
                    ) -> str:
    """Thermal-calibration ladder SQL (S6 on the driver board): per
    MTL regime, scale every 8-bit thermal DN through the reference's
    radiance -> brightness-temperature conversion
    (ThermalFileInfo.scaleThermalDNtoC, fmask/config.py:507-521):
    rad = dn*gain + offset (clamped to 1e-5 at <= 0),
    bt_c = k2 / ln(k1/rad + 1) - 273.15.

    ``infos`` maps regime name -> (gain, offset, k1, k2). The Spark
    side passes constants PARSED from the fixture MTL files
    (mtl.read_mtl_file + thermal_info_from_mtl — the S5 source and the
    S6 extraction, incl. the oldest-format LMIN/LMAX derivation); the
    oracle passes an independent hand transcription of the same
    formulas over the raw fixture numbers — the hash match proves the
    parser end-to-end, not just that both sides share one code path.

    Scale shape: the calibration dim is one row per scene (broadcast);
    the DN scaling is pure codegen arithmetic on the scan side."""
    from .dialect import SPARK, _check, explode_series
    _check(d)
    rows = ", ".join(
        f"('{name}', {g!r}, {o!r}, {k1!r}, {k2!r})"
        for name, (g, o, k1, k2) in sorted(infos.items()))
    cols = "regime, gain, offset_, k1, k2"
    values = (f"SELECT * FROM VALUES {rows} AS t({cols})" if d == SPARK
              else f"SELECT * FROM (VALUES {rows}) AS t({cols})")
    dn_gen = explode_series("1", "255", "dn", d)
    return f"""
WITH calib AS (
  SELECT regime, cast(gain as double) AS gain,
    cast(offset_ as double) AS offset_,
    cast(k1 as double) AS k1, cast(k2 as double) AS k2
  FROM ({values}) v
),
ladder AS (
  SELECT regime, gain, offset_, k1, k2, {dn_gen} FROM calib
),
rad AS (
  SELECT regime, dn, k1, k2,
    case when cast(dn as double) * gain + offset_ <= 0.0
         then 0.00001 else cast(dn as double) * gain + offset_ end AS r
  FROM ladder
)
SELECT regime, cast(dn as int) AS dn,
  cast(round(r * 1000000.0) as bigint) AS rad_micro,
  cast(round((k2 / ln(k1 / r + 1.0) - 273.15) * 1000.0) as bigint)
    AS bt_milli
FROM rad"""
