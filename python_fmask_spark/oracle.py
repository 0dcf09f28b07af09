"""Full-query SQL assembly for both dialects.

Each query is a CTE pipeline over the ``documents`` table, rendered either
for Spark SQL (the engine's declarative path — Catalyst optimizes it the
same as DataFrame code) or DuckDB (the driver's correctness oracle).

Column names are identical in both renderings by construction, as required
by the driver's order-insensitive value-hash comparison.
"""

from __future__ import annotations

from . import constants as C
from . import derive
from .dialect import DUCKDB, SPARK


def _ctes(d: str, upto: str, table: str = "documents",
          sensor: str = "LANDSAT8",
          s2_offsets: dict[str, int] | None = None) -> str:
    parts = [derive.features_sql(d, derive.documents_wide_sql(d, table))]
    order = ["pass1", "thresholds", "pass2", "pass3", "majority"]
    builders = {
        "pass1": lambda d: derive.pass1_sql(d, sensor=sensor,
                                            s2_offsets=s2_offsets),
        "thresholds": lambda d: derive.thresholds_sql(d, sensor=sensor),
        "pass2": lambda d: derive.pass2_sql(d, sensor=sensor),
        "pass3": lambda d: derive.pass3_sql(d, sensor=sensor),
        "majority": lambda d: derive.majority3_sql(d, "pass3", "cloud_raw", "cloudbuf"),
    }
    for stage in order:
        parts.append(builders[stage](d))
        if stage == upto:
            break
    return "WITH " + ",\n".join(parts)


def q_documents_wide(d: str) -> str:
    """Ingest check: the input_hint-shaped table, with byte-identity
    digest of text/html (per-row invariant per BASELINE.json)."""
    sha = "sha2(text, 256)" if d == SPARK else "sha256(text)"
    docs = derive.documents_wide_sql(d, "documents")
    return (f"WITH docs AS ({docs}) "
            f"SELECT url, warc_ts, lang, text, {sha} AS text_sha256 FROM docs")


def q_geocode_cells(d: str) -> str:
    """Geocode + H3-style bucketing: per-cell doc counts and lat/lon extremes."""
    ctes = _ctes(d, "pass1")  # features included before pass1
    return f"""{ctes}
SELECT cell_id, count(*) AS n_docs,
  min(lat) AS min_lat, max(lat) AS max_lat,
  min(lon) AS min_lon, max(lon) AS max_lon,
  count(distinct domain) AS n_domains
FROM features GROUP BY cell_id"""


def q_pass1_cell_counts(d: str) -> str:
    """Flagship: per-cell PCP / water / snow / clear-land classification
    counts (potentialCloudFirstPass layers, fmask/fmask.py:459-460)."""
    ctes = _ctes(d, "pass1")
    return f"""{ctes}
SELECT cell_id, count(*) AS n_docs,
  cast(sum(case when pcp then 1 else 0 end) as bigint) AS n_pcp,
  cast(sum(case when water_test then 1 else 0 end) as bigint) AS n_water,
  cast(sum(case when clear_land then 1 else 0 end) as bigint) AS n_clear_land,
  cast(sum(case when snow then 1 else 0 end) as bigint) AS n_snow,
  cast(sum(case when nullmask then 1 else 0 end) as bigint) AS n_null,
  cast(sum(case when clear_sky_water then 1 else 0 end) as bigint) AS n_clear_sky_water,
  cast(sum(variability_prob_pcnt) as bigint) AS sum_vprob
FROM pass1 GROUP BY cell_id"""


def q_pass1_thresholds(d: str) -> str:
    """Per-cell global thresholds (Eqns 8,13; histogram percentile per
    fmask/fmask.py:472-499,546-561) + b4_17 scaled to int for stable compare."""
    ctes = _ctes(d, "thresholds")
    return f"""{ctes}
SELECT cell_id, twater, tlow, thigh,
  cast(round(b4_17 * 1000) as int) AS b4_17_milli,
  non_null_count
FROM thresholds"""


def q_pass2_probs(d: str) -> str:
    """Per-cell aggregated quantized cloud probabilities (pass2 stack,
    fmask/fmask.py:673-676) and the Eqn-17 land threshold."""
    ctes = _ctes(d, "pass2")
    return f"""{ctes}
SELECT p.cell_id,
  cast(sum(p.wprob_pcnt) as bigint) AS sum_wprob,
  cast(sum(p.lprob_pcnt) as bigint) AS sum_lprob,
  cast(round(max(lt.land_threshold) * 1000) as int) AS land_threshold_milli,
  count(*) AS n_docs
FROM pass2 p JOIN landthr lt ON lt.cell_id = p.cell_id
GROUP BY p.cell_id"""


def q_cloud_interim(d: str) -> str:
    """Per-pixel interim cloud mask after Eqn 18 and the 3x3 >=5-of-9
    majority buffer (fmask/fmask.py:742-776)."""
    ctes = _ctes(d, "majority")
    return f"""{ctes}
SELECT url, cell_id, r, c,
  cast(case when cloud_raw then 1 else 0 end as int) AS cloud_raw_i,
  cast(case when cloudbuf_flag and not nullmask then 1 else 0 end as int) AS cloud_i
FROM cloudbuf"""


def q_fmask_interim_class(d: str) -> str:
    """Per-url interim classification (precedence merge of
    fmask/fmask.py:1389-1394, without the shadow chain), with the
    circular cloud buffer (fmask/fmask.py:1379-1380) and text byte-identity
    digest. Shadow-inclusive classification is the kernel pipeline's job."""
    ctes = _ctes(d, "majority")
    dil = derive.dilate_sql(d, "cloudsrc", "cloud_m", "clouddil",
                            C.CLOUD_BUFFER_SIZE)
    sha = "sha2(text, 256)" if d == SPARK else "sha256(text)"
    return f"""{ctes},
cloudsrc AS (
  SELECT *, (cloudbuf_flag AND NOT nullmask) AS cloud_m FROM cloudbuf
),
{dil}
SELECT url, cell_id, r, c,
  cast(case
    when nullmask then {C.OUTCODE_NULL}
    when clouddil_flag then {C.OUTCODE_CLOUD}
    when snow then {C.OUTCODE_SNOW}
    when water_test then {C.OUTCODE_WATER}
    else {C.OUTCODE_CLEAR}
  end as int) AS fmask_class,
  {sha} AS text_sha256
FROM clouddil"""


def q_pass1_cell_counts_l47(d: str) -> str:
    """Sensor dispatch: Landsat 4-7 (no cirrus band; 6 null bands;
    fmask/config.py:33-40, fmask/fmask.py:290-292)."""
    ctes = _ctes(d, "pass1", sensor="LANDSAT47")
    return f"""{ctes}
SELECT cell_id, count(*) AS n_docs,
  cast(sum(case when pcp then 1 else 0 end) as bigint) AS n_pcp,
  cast(sum(case when water_test then 1 else 0 end) as bigint) AS n_water,
  cast(sum(case when clear_land then 1 else 0 end) as bigint) AS n_clear_land,
  cast(sum(case when snow then 1 else 0 end) as bigint) AS n_snow,
  cast(sum(case when nullmask then 1 else 0 end) as bigint) AS n_null
FROM pass1 GROUP BY cell_id"""


# Explicit all-zero offsets: a pre-04.00 product's offsets, stated
# explicitly as the reference requires (fmask/fmask.py:137-149).
S2_ZERO_OFFSETS = {b: 0 for b in
                   ("blue", "green", "red", "nir", "swir1", "swir2",
                    "cirrus")}


def q_fmask_interim_class_s2(d: str,
                             s2_offsets: dict[str, int] | None = None
                             ) -> str:
    """Sensor dispatch: Sentinel-2 (no thermal -> BT thresholds NULL and
    temperature probs degrade to 1, fmask/fmask.py:645-666; cloudmask3
    disabled, fmask/fmask.py:747-748; visible-only null bands,
    fmask/fmask.py:298-302). ``s2_offsets`` feeds the mandatory
    radiometric offsets (parsed from the product XML via
    sen2meta.Sen2ZipfileMeta at the call site)."""
    from . import constants as C
    ctes = _ctes(d, "majority", sensor="SENTINEL2",
                 s2_offsets=s2_offsets or S2_ZERO_OFFSETS)
    return f"""{ctes}
SELECT url, cell_id, r, c,
  cast(case
    when nullmask then {C.OUTCODE_NULL}
    when cloudbuf_flag and not nullmask then {C.OUTCODE_CLOUD}
    when snow then {C.OUTCODE_SNOW}
    when water_test then {C.OUTCODE_WATER}
    else {C.OUTCODE_CLEAR}
  end as int) AS fmask_class
FROM cloudbuf"""
