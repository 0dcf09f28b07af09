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
                       max_files_per_trigger: int | None = None,
                       state_ttl_sec: int | None = None,
                       watermark: str = "0 seconds") -> DataFrame:
    """Custom STATEFUL streaming operator (applyInPandasWithState):
    cross-micro-batch exact dedup that emits only each text digest's
    FIRST occurrence (earliest warc_ts; url as the deterministic tie
    break). State per digest group is one (warc_ts, url) pair — the
    incremental form of `arg_min(url, warc_ts) GROUP BY digest`, kept
    across batches so a duplicate arriving in a LATER file is dropped
    and a better (earlier) occurrence replaces the held one.

    Scale shape: state is keyed by the digest (hash-partitioned, one
    tiny tuple per distinct document). ``state_ttl_sec`` bounds state
    in EVENT time: an occurrence arriving more than the TTL after the
    retained first occurrence is re-admitted as a fresh first sighting,
    and state whose deadline the event-time watermark has passed is
    physically evicted (EventTimeTimeout; requires the ``watermark``
    delay). The re-admission decision scans the batch PER EPOCH (see
    ``first_seen``), so the emitted rows are the same however the
    occurrences are sliced into micro-batches. NOTE the contract
    narrowing in TTL mode: ``withWatermark`` drops rows older than the
    observed max event time minus the ``watermark`` delay BEFORE they
    reach the operator, so the "earlier occurrence replaces the held
    one" rule only applies to occurrences at most that delay
    out-of-order — the default '0 seconds' admits only in-order event
    times; pass a delay matching the crawl's disorder if earlier
    replacements must survive TTL mode. Event-time ageing is chosen
    over a wall-clock
    ProcessingTimeTimeout deliberately: it is deterministic under
    replay, and Spark's available-now trigger never terminates with a
    processing-time timeout (shouldRunAnotherBatch is unconditionally
    true for it, measured as an infinite empty-batch loop), while
    event-time timeouts re-trigger only while the watermark advances.
    The default (state_ttl_sec=None) keeps digests for the crawl's
    duration with NoTimeout. Each micro-batch group is reduced with
    vectorized pandas ops (sort + head), no per-row Python."""
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
    if state_ttl_sec is not None:
        keyed = keyed.withWatermark("warc_ts", watermark)

    out_schema = "digest string, url string, warc_ts timestamp"
    state_schema = "url string, warc_ts timestamp"

    def first_seen(key: Any, pdfs: Iterable[pd.DataFrame],
                   state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # watermark passed the digest's deadline: forget it; its
            # next occurrence is admitted as a fresh first sighting
            state.remove()
            return
        best_url, best_ts = (state.get if state.exists else (None, None))
        frames = [pdf[["warc_ts", "url"]] for pdf in pdfs if len(pdf)]
        emits: list[tuple] = []
        if frames:
            batch = (frames[0] if len(frames) == 1 else pd.concat(frames))
            batch = batch.sort_values(["warc_ts", "url"])
            cand = batch.iloc[0]
            if (best_ts is None or cand.warc_ts < best_ts
                    or (cand.warc_ts == best_ts and cand.url < best_url)):
                best_url, best_ts = cand.url, cand.warc_ts
                emits.append((best_url, best_ts))
            if state_ttl_sec is not None:
                # EPOCH scan, not batch-min-only: every occurrence more
                # than the TTL after the retained first occurrence
                # starts a new epoch and is emitted, however the
                # occurrences were sliced into micro-batches (a
                # min-only check silently swallowed a beyond-TTL
                # occurrence whenever an in-TTL one landed in the same
                # batch). searchsorted per EPOCH (0 or 1 in practice),
                # vectorized within — no per-row Python.
                delta = pd.Timedelta(seconds=state_ttl_sec)
                ts = batch["warc_ts"]
                while True:
                    pos = int(ts.searchsorted(best_ts + delta,
                                              side="right"))
                    if pos >= len(batch):
                        break
                    row = batch.iloc[pos]
                    best_url, best_ts = row.url, row.warc_ts
                    emits.append((best_url, best_ts))
        if emits:
            state.update((best_url, best_ts))
        if state_ttl_sec is not None and state.exists:
            deadline = (int(best_ts.timestamp() * 1000)
                        + state_ttl_sec * 1000)
            # Spark requires the timeout timestamp to sit beyond the
            # current watermark; clamp (affects only eviction timing,
            # never the re-admission decision above)
            state.setTimeoutTimestamp(
                max(deadline, state.getCurrentWatermarkMs() + 1))
        if emits:
            yield pd.DataFrame({"digest": [key[0]] * len(emits),
                                "url": [u for u, _ in emits],
                                "warc_ts": [t for _, t in emits]})

    timeout = (GroupStateTimeout.EventTimeTimeout
               if state_ttl_sec is not None else GroupStateTimeout.NoTimeout)
    return (keyed.groupBy("digest").applyInPandasWithState(
        first_seen, outputStructType=out_schema,
        stateStructType=state_schema, outputMode="update",
        timeoutConf=timeout))
