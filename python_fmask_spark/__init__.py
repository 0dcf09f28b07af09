"""python_fmask_spark — a from-scratch PySpark-native spatial-join +
tiling engine re-expressing ubarsc/python-fmask's per-pixel cloud/shadow
classification as vectorized operators over Common-Crawl-style web-page
tables (BASELINE.json north_rule).

Layers:
  dialect / derive / oracle  — single-source dual-dialect SQL (Spark + DuckDB)
  sources                    — parquet/Iceberg ingestion, input_hint shape
  operators/                 — fmask passes, kernels, tiling, clumps, shadows
  functions/                 — dedup, similarity, text analysis, multimodal
  plans/                     — lineage + checkpoint resume
"""

__version__ = "0.1.0"
