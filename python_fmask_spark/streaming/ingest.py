"""Structured Streaming ingest: incremental warc_ts micro-batches.

The reference is strictly batch (SURVEY §2.9); this is the engine's
incremental path: new document files land in a directory (or Iceberg
snapshot), each micro-batch runs the same deterministic derivation +
pass-1 predicates (no pixel layout — per-document columns only), and a
watermarked event-time window aggregates per (window, cell).

Late data: watermark on warc_ts bounds state; the aggregation is
map-side-combinable so state is per (window, cell) only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .. import derive
from ..dialect import SPARK


def stream_documents(spark: SparkSession, input_dir: str) -> DataFrame:
    """File-source stream with the raw documents schema."""
    schema = ("doc_id bigint, text string, lang string, source string, "
              "n_chars bigint")
    return (spark.readStream.schema(schema).parquet(input_dir))


def pass1_stream_counts(spark: SparkSession, input_dir: str,
                        window: str = "1 hour",
                        watermark: str = "2 hours") -> DataFrame:
    """Streaming per-(event-window, cell) pass-1 counts (watermarked)."""
    from pyspark.sql import functions as F

    stream = stream_documents(spark, input_dir)
    stream.createOrReplaceTempView("documents_stream")
    ctes = ",\n".join([
        derive.features_sql(
            SPARK, derive.documents_wide_sql(SPARK, "documents_stream"),
            layout=False),
        derive.pass1_sql(SPARK),
    ])
    p1 = spark.sql(f"WITH {ctes} SELECT * FROM pass1")
    return (p1.withWatermark("warc_ts", watermark)
            .groupBy(F.window("warc_ts", window).alias("w"), "cell_id")
            .agg(F.count("*").alias("n_docs"),
                 F.sum(F.expr("case when pcp then 1 else 0 end")).alias("n_pcp"),
                 F.sum(F.expr("case when water_test then 1 else 0 end")).alias("n_water"),
                 F.sum(F.expr("case when snow then 1 else 0 end")).alias("n_snow"))
            .select(F.col("w.start").alias("window_start"), "cell_id",
                    "n_docs", "n_pcp", "n_water", "n_snow"))


def run_available_now(df: DataFrame, query_name: str) -> None:
    """Drain everything currently available into an in-memory sink."""
    q = (df.writeStream.format("memory").queryName(query_name)
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination()
