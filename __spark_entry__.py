"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` /
``oracle_sql()`` expose each implemented operator with its DuckDB oracle.
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")

from python_fmask_spark import oracle  # noqa: E402
from python_fmask_spark.dialect import DUCKDB, SPARK  # noqa: E402
from python_fmask_spark.sources import register_views  # noqa: E402

SF0001 = "/root/testdata/sf0.001"

# name -> builder(dialect) returning a full SQL string over the
# pre-registered views. Spark runs the SPARK rendering (declarative,
# Catalyst-optimized); the driver runs the DUCKDB rendering as oracle.
_SQL_QUERIES: dict[str, Callable[[str], str]] = {
    "documents_wide": oracle.q_documents_wide,
    "geocode_cells": oracle.q_geocode_cells,
    "pass1_cell_counts": oracle.q_pass1_cell_counts,
    "pass1_thresholds": oracle.q_pass1_thresholds,
    "pass2_probs": oracle.q_pass2_probs,
    "cloud_interim": oracle.q_cloud_interim,
    "fmask_interim_class": oracle.q_fmask_interim_class,
}


def _make_sql_query(builder: Callable[[str], str]):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        register_views(spark, sf_dir)
        return spark.sql(builder(SPARK))
    return run


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: per-cell PCP/water/snow classification counts at sf0.001."""
    register_views(spark, SF0001)
    return spark.sql(oracle.q_pass1_cell_counts(SPARK))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name, builder in _SQL_QUERIES.items():
        out[name] = _make_sql_query(builder)
    return out


def oracle_sql() -> dict[str, str]:
    return {name: builder(DUCKDB) for name, builder in _SQL_QUERIES.items()}
