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


def thermal_info_from_mtl(mtl: dict[str, str], band: str = "6") -> ThermalInfo:
    """Modern-format thermal constants (RADIANCE_MULT/ADD + K1/K2;
    fmask/config.py:560-575)."""
    return ThermalInfo(
        gain=float(mtl[f"RADIANCE_MULT_BAND_{band}"]),
        offset=float(mtl[f"RADIANCE_ADD_BAND_{band}"]),
        k1=float(mtl[f"K1_CONSTANT_BAND_{band}"]),
        k2=float(mtl[f"K2_CONSTANT_BAND_{band}"]),
    )
