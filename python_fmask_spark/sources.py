"""Table sources: driver parquet + derived input_hint-shaped views.

The production design reads Iceberg (``spark.read.format("iceberg")``);
this sandbox has no Iceberg catalog jars, so parquet is the storage
fallback — same DataFrame surface, same pushdown behavior.
"""

from __future__ import annotations

import os
import weakref

from pyspark.sql import DataFrame, SparkSession

from .derive import documents_wide_sql
from .dialect import SPARK

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


# (path, file-identity, reader-conf) -> measured scan split count.
# Computing the split count costs a plan->RDD conversion (~0.1 s/table);
# caching it on the file identity makes repeated register_views calls
# (one per driver query) pay it once per actual input, a rewritten file
# re-measures, and the conf component keeps sessions with different
# split settings from sharing a measurement.
_SPLITS_CACHE: dict[tuple[str, str, str], int] = {}


def _file_identity(path: str) -> str:
    try:
        if os.path.isdir(path):
            return ",".join(
                f"{e.stat().st_mtime_ns}/{e.stat().st_size}"
                for e in sorted(os.scandir(path), key=lambda e: e.name))
        st = os.stat(path)
        return f"{st.st_mtime_ns}/{st.st_size}"
    except OSError:
        return "absent"


def _spread_small_scan(spark: SparkSession, df: DataFrame,
                       path: str | None = None) -> DataFrame:
    """Scale-adaptive input parallelism (guide §2.5 input skew / §6).

    A small input (one parquet file with one row group) yields ONE scan
    task regardless of split configuration — row groups are the minimum
    split grain — so every md5-heavy derivation over it runs
    single-threaded (measured: the q5 shingle scan pinned one core for
    ~2.7 s while 31 idled). When the scan's split count is below the
    session's core count, insert one round-robin repartition to fan the
    derivations out; the shuffle moves only the raw table bytes (~0.6 MB
    at sf0.1), orders of magnitude cheaper than the serial derivation it
    unblocks. At scale the condition is false (a 100-TB table has far
    more splits than cores) and the scan is returned untouched — no
    shuffle is ever added to a big input."""
    target = spark.sparkContext.defaultParallelism
    key = None
    if path is not None:
        # fold the split-relevant reader conf into the key: the split
        # count depends on maxPartitionBytes/openCost, so a second
        # session in this process with different settings must not
        # reuse the first session's measurement
        def _cget(c: str) -> str:
            try:
                return spark.conf.get(c)
            except Exception:
                return "?"
        conf = "|".join(_cget(c)
                        for c in ("spark.sql.files.maxPartitionBytes",
                                  "spark.sql.files.openCostInBytes"))
        key = (path, _file_identity(path), conf)
        n = _SPLITS_CACHE.get(key, -1)
        if n >= 0:
            return df.repartition(target) if 0 < n < target else df
    try:
        n = df.rdd.getNumPartitions()
    except Exception:
        return df
    if key is not None:
        _SPLITS_CACHE[key] = n
    if 0 < n < target:
        return df.repartition(target)
    return df


# Tables whose downstream derivations are compute-heavy per row (tens
# of md5/explode evaluations: the band/feature chain, shingling, vector
# math). Only these repay the one-off spreading shuffle; the relational
# /dim tables' queries are scan+agg shaped, where an added exchange on
# a sub-second query is pure overhead (measured: rel_* 0.2->0.6 s with
# the unconditional form, while documents-derived heavies gained 3-6x).
_HEAVY_DERIVE_TABLES = frozenset(("documents", "embeddings"))


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = spark.read.parquet(path)
    if name in _HEAVY_DERIVE_TABLES:
        df = _spread_small_scan(spark, df, path=path)
    return df


# session -> identity of the last-registered input. Keyed by a
# WeakKeyDictionary on the session object itself (NOT id(spark), whose
# integer can be recycled after a session is garbage-collected), and the
# identity string folds in each parquet file's (mtime_ns, size) so
# rewriting the data at the SAME path also invalidates the session's
# pass-1 stage cache.
_REGISTERED: "weakref.WeakKeyDictionary[SparkSession, str]" =     weakref.WeakKeyDictionary()


def _input_fingerprint(sf_dir: str, tables: tuple[str, ...]) -> str:
    parts = [sf_dir]
    for name in tables:
        path = os.path.join(sf_dir, f"{name}.parquet")
        parts.append(f"{name}:{_file_identity(path)}")
    return "|".join(parts)


def registered_input_identity(spark: SparkSession) -> str:
    """Identity string of the session's last-registered input (sf_dir +
    per-table mtime_ns/size), '' when nothing registered. Folded into
    resumable-stage fingerprints (plans.lineage.StageRunner) so that
    rewriting the input data at the same path invalidates stage tables
    instead of silently resuming over stale results."""
    return _REGISTERED.get(spark, "")


def _note_input_change(spark: SparkSession, identity: str) -> None:
    if _REGISTERED.get(spark) != identity:
        from .pipeline import invalidate_pass1_cache
        invalidate_pass1_cache(spark)
        _REGISTERED[spark] = identity


def register_views(spark: SparkSession, sf_dir: str,
                   tables: tuple[str, ...] = TABLES) -> None:
    # NOTE: always re-register. An identity-based skip was tried in r6
    # and reverted: callers (tests, ad-hoc sessions) may replace a view
    # like `documents` directly via createOrReplaceTempView, which the
    # session identity cannot see — the skip then kept the stale view.
    # The repeat-call cost is bounded by the _SPLITS_CACHE (no plan->RDD
    # probe after the first registration of a given file identity).
    _note_input_change(spark, _input_fingerprint(sf_dir, tables))
    for name in tables:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def load_documents_wide(spark: SparkSession, sf_dir: str,
                        replicate: int = 1) -> DataFrame:
    """The input_hint-shaped documents table
    (url, warc_ts, html, text, lang), derived deterministically from the
    driver's documents parquet.

    ``replicate`` > 1 deterministically expands the table for bench runs:
    each copy gets a distinct domain suffix (spreading cells) and url.
    """
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    _note_input_change(spark, f"{sf_dir}!rep{replicate}")
    if replicate == 1:
        return spark.sql(documents_wide_sql(SPARK, "documents"))
    rep = spark.sql(
        f"""SELECT concat('https://', source, '-k', k, '.example/p/',
                  cast(doc_id as string)) AS url,
           timestamp '2024-01-01 00:00:00'
             + make_interval(0, 0, 0, 0, 0, 0, doc_id) AS warc_ts,
           encode(concat('<html>', text, '</html>'), 'UTF-8') AS html,
           text, lang
        FROM documents
        LATERAL VIEW explode(sequence(0, {replicate - 1})) t AS k""")
    return rep
