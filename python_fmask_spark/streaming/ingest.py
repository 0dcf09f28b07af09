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


def stream_documents(spark: SparkSession, input_dir: str,
                     max_files_per_trigger: int | None = None) -> DataFrame:
    """File-source stream with the raw documents schema.
    ``max_files_per_trigger=1`` forces one micro-batch per file (the
    stateful-operator tests use it to make state cross batches)."""
    schema = ("doc_id bigint, text string, lang string, source string, "
              "n_chars bigint")
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger",
                               str(max_files_per_trigger))
    return reader.parquet(input_dir)


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


def run_available_now(df: DataFrame, query_name: str,
                      output_mode: str = "complete") -> None:
    """Drain everything currently available into an in-memory sink."""
    q = (df.writeStream.format("memory").queryName(query_name)
         .outputMode(output_mode).trigger(availableNow=True).start())
    q.awaitTermination()


def stream_dedup_first(spark: SparkSession, input_dir: str,
                       max_files_per_trigger: int | None = None
                       ) -> DataFrame:
    """Custom STATEFUL streaming operator (applyInPandasWithState):
    cross-micro-batch exact dedup that emits only each text digest's
    FIRST occurrence (earliest warc_ts; url as the deterministic tie
    break). State per digest group is one (warc_ts, url) pair — the
    incremental form of `arg_min(url, warc_ts) GROUP BY digest`, kept
    across batches so a duplicate arriving in a LATER file is dropped
    and a better (earlier) occurrence replaces the held one.

    Scale shape: state is keyed by the digest (hash-partitioned, one
    tiny tuple per distinct document), exactly the bounded-state
    pattern the north rule's lineage/resume story needs; no watermark
    is used because digest state must live for the crawl's duration
    (production would age it out with a GroupStateTimeout)."""
    from typing import Any, Iterable, Iterator

    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import (GroupState,
                                             GroupStateTimeout)

    stream = stream_documents(spark, input_dir,
                              max_files_per_trigger=max_files_per_trigger)
    stream.createOrReplaceTempView("documents_dedup_stream")
    docs = spark.sql(
        derive.documents_wide_sql(SPARK, "documents_dedup_stream"))
    keyed = docs.select(
        F.expr("md5(text) AS digest"), "url", "warc_ts")

    out_schema = "digest string, url string, warc_ts timestamp"
    state_schema = "url string, warc_ts timestamp"

    def first_seen(key: Any, pdfs: Iterable[pd.DataFrame],
                   state: GroupState) -> Iterator[pd.DataFrame]:
        best_url, best_ts = (state.get if state.exists else (None, None))
        emit = False
        for pdf in pdfs:
            for row in pdf.itertuples(index=False):
                ts = row.warc_ts
                if (best_ts is None or ts < best_ts
                        or (ts == best_ts and row.url < best_url)):
                    best_url, best_ts = row.url, ts
                    emit = True
        if emit:
            state.update((best_url, best_ts))
            yield pd.DataFrame({"digest": [key[0]], "url": [best_url],
                                "warc_ts": [best_ts]})

    return (keyed.groupBy("digest").applyInPandasWithState(
        first_seen, outputStructType=out_schema,
        stateStructType=state_schema, outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout))
