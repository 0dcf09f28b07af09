"""Mask sinks: the raster sink (S3) and thematic metadata sink (S4).

The reference writes a single-band thematic raster and attaches a GDAL
color table + raster attribute table of class names
(fmask/fmask.py:1338-1351). The Spark-native equivalents:

* S3 — the mask table itself, written through the DataFrameWriterV2
  (``df.writeTo``) surface, partitioned by cell_id. Format is Iceberg
  when the runtime has it (the production target: snapshots +
  table-properties survive engine restarts), falling back to the
  session catalog's parquet provider in this sandbox — the API surface
  (writeTo / tableProperty / partitionedBy / createOrReplace) is
  identical either way.
* S4 — the color table + class-name RAT as (a) TBLPROPERTIES on the
  mask table (``fmask.color_table`` / ``fmask.class_names`` JSON) and
  (b) a first-class ``<name>_rat`` dimension table joinable onto the
  mask (class_value, class_name, red, green, blue, alpha).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

# GDAL color table rows (class, R, G, B, A) — fmask/fmask.py:1338-1342
COLOR_TABLE = [
    (2, 255, 0, 255, 255),     # cloud
    (3, 255, 255, 0, 255),     # cloud shadow
    (4, 85, 255, 255, 255),    # snow
    (5, 0, 0, 255, 255),       # water
]

# RAT "Classification" column — fmask/fmask.py:1346-1347
CLASS_NAMES = ["Null", "Valid", "Cloud", "Cloud Shadow", "Snow", "Water"]


def class_rat_df(spark: SparkSession) -> DataFrame:
    """The raster attribute table as a dimension table: one row per
    class value, with the reference's class names and color entries
    (colorless classes carry NULL channels, like a GDAL CT default)."""
    colors = {c: (r, g, b, a) for c, r, g, b, a in COLOR_TABLE}
    rows = []
    for value, name in enumerate(CLASS_NAMES):
        r, g, b, a = colors.get(value, (None, None, None, None))
        rows.append((value, name, r, g, b, a))
    return spark.createDataFrame(
        rows, "class_value int, class_name string, red int, green int, "
              "blue int, alpha int")


def write_mask(df: DataFrame, name: str,
               fmt: str | None = None,
               partition_col: str = "cell_id") -> str:
    """Write the mask table through writeTo with the thematic metadata
    attached; returns the format actually used ('iceberg' or the
    fallback provider)."""
    spark = df.sparkSession
    used = fmt or "iceberg"
    props = {
        "fmask.color_table": json.dumps(COLOR_TABLE),
        "fmask.class_names": json.dumps(CLASS_NAMES),
    }
    staging = f"{name}__staging"

    def looks_like_managed_mask_output(path: str) -> bool:
        # Refuse to delete a directory that merely SHARES the table's
        # lowercased name (e.g. external/unmanaged data parked under the
        # warehouse): a stale managed mask table contains only Spark
        # writer artifacts — partition dirs on the partition column,
        # parquet part files, and/or a _SUCCESS marker.
        try:
            entries = os.listdir(path)
        except OSError:
            return False
        if not entries:
            return True
        for e in entries:
            ok = (e == "_SUCCESS" or e.startswith("_temporary")
                  or e.startswith(f"{partition_col}=")
                  or (e.startswith("part-") and ".parquet" in e)
                  or e.startswith("."))
            if not ok:
                return False
        return True

    def clear_stale_location(tbl: str) -> None:
        # The default session catalog is in-memory: a crashed previous
        # process leaves the managed-table DIRECTORY under the warehouse
        # while the new session's catalog has no entry, and create then
        # fails with LOCATION_ALREADY_EXISTS. Only remove the location
        # when the catalog genuinely doesn't know the table AND the
        # directory's layout is a Spark-written mask table.
        import shutil
        if "." in tbl or spark.catalog.tableExists(tbl):
            return
        wh = spark.conf.get("spark.sql.warehouse.dir", "")
        wh = wh.removeprefix("file:")
        path = os.path.join(wh, tbl.lower())
        if wh and os.path.isdir(path) \
                and looks_like_managed_mask_output(path):
            shutil.rmtree(path, ignore_errors=True)

    def attempt(provider: str) -> None:
        from pyspark.sql import functions as F
        # Atomic-ish replace without RTAS (the V1 session catalog — the
        # parquet fallback — has no createOrReplace): create under a
        # staging name first, and only drop + rename once the create has
        # SUCCEEDED — a failed create leaves the previous table intact.
        # KNOWN WINDOW: between the DROP below and the RENAME there is
        # no live table under ``name``; a crash in that window leaves
        # the finished staging table to recover from manually. True
        # atomic swap needs a V2/Iceberg catalog (REPLACE TABLE).
        spark.sql(f"DROP TABLE IF EXISTS {staging}")
        clear_stale_location(staging)
        clear_stale_location(name)
        w = df.writeTo(staging).using(provider).partitionedBy(
            F.col(partition_col))
        for k, v in props.items():
            w = w.tableProperty(k, v)
        w.create()
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        spark.sql(f"ALTER TABLE {staging} RENAME TO {name}")
        try:
            # The V1 catalog drops the partition registry on rename;
            # recover it. Iceberg/unpartitioned providers don't need (or
            # support) MSCK — ignore.
            spark.sql(f"MSCK REPAIR TABLE {name}")
        except Exception:
            pass

    def is_provider_missing(e: Exception) -> bool:
        # Only the "Iceberg isn't installed in this session" error class
        # downgrades; genuine Iceberg misconfiguration (bad catalog conf,
        # permission, schema errors) propagates.
        msg = str(e).lower()
        return any(s in msg for s in (
            "failed to find data source", "cannot find catalog",
            "catalog plugin", "classnotfound", "not a valid spark sql"
            " data source", "unsupported data source type"))

    try:
        attempt(used)
    except Exception as e:
        if fmt is not None or not is_provider_missing(e):
            raise
        import warnings
        warnings.warn(
            f"write_mask: provider 'iceberg' unavailable in this session "
            f"({e}); downgrading to the session catalog's parquet "
            f"provider", RuntimeWarning, stacklevel=2)
        used = "parquet"
        attempt(used)

    spark.sql(f"DROP TABLE IF EXISTS {name}_rat__staging")
    clear_stale_location(f"{name}_rat__staging")
    clear_stale_location(f"{name}_rat")
    class_rat_df(spark).writeTo(f"{name}_rat__staging").using(used).create()
    spark.sql(f"DROP TABLE IF EXISTS {name}_rat")
    spark.sql(f"ALTER TABLE {name}_rat__staging RENAME TO {name}_rat")
    return used


def read_mask_metadata(spark: SparkSession, name: str) -> dict:
    """Read back the thematic metadata from TBLPROPERTIES."""
    rows = spark.sql(f"SHOW TBLPROPERTIES {name}").collect()
    props = {r["key"]: r["value"] for r in rows}
    return {
        "color_table": json.loads(props["fmask.color_table"]),
        "class_names": json.loads(props["fmask.class_names"]),
    }
