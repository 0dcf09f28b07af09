"""End-to-end corpus curation: the composed keep/drop decision a
training-data pipeline makes per document, with full provenance.

Real pipelines (C4, Gopher, RefinedWeb, FineWeb) chain independent
filters — exact dedup, near-dup dedup, quality thresholds, language
selection — and the operational question is always "why was this url
dropped?". ``corpus_curate`` therefore emits EVERY document with one
flag per stage plus the final AND, rather than silently filtering:

  exact_ok   — first occurrence of its md5(text) group
               (earliest warc_ts, then min url — keep-the-first-crawl)
  neardup_ok — canonical document of its minhash-LSH near-dup CLUSTER
               (connected components; dedup.minhash_clusters)
  quality_ok — quality_milli >= {QUALITY_MIN} (text.quality_ctes)
  lang_ok    — lang in {LANGS}
  keep       — AND of the four

Scale shape at 10^12 docs: exact_ok is one window over md5(text)
(equivalently a min-by aggregation — map-side combinable); quality and
lang are pure whole-stage-codegen column math on the scan; neardup_ok
reuses the cluster frame (see dedup.minhash_clusters for its per-round
shuffle budget); the final assembly is three equi-joins on url against
frames that are each <= one row per document. No stage is quadratic.

The DuckDB oracle renders the SAME composition in one SQL statement
(recursive-CTE connected components + identical filter expressions),
so the driver hash proves the composed decision end-to-end, not just
each stage in isolation.
"""

from __future__ import annotations

from ..derive import documents_wide_sql
from ..dialect import DUCKDB, SPARK
from .dedup import _minhash_cte, clusters_cte_chain_duckdb
from .text import quality_ctes

QUALITY_MIN = 1000  # milli-score floor (the synthetic corpus clips at
#                     1000; real corpora tune this per language)
LANGS = ("en",)     # target-language allowlist


def _langs_sql() -> str:
    return "(" + ", ".join(f"'{lang}'" for lang in LANGS) + ")"


def _curate_tail(d: str) -> str:
    """CTE fragment + final SELECT over in-scope ``docs`` and ``clu``
    (url, is_dup) relations."""
    return f"""{quality_ctes(d)},
exact_rank AS (
  SELECT url,
    row_number() OVER (PARTITION BY md5(text)
                       ORDER BY warc_ts, url) AS exact_rn
  FROM docs
)
SELECT d.url,
  cast(case when e.exact_rn = 1 then 1 else 0 end as int) AS exact_ok,
  cast(1 - c.is_dup as int) AS neardup_ok,
  cast(case when q.quality_milli >= {QUALITY_MIN} then 1 else 0 end
       as int) AS quality_ok,
  cast(case when d.lang IN {_langs_sql()} then 1 else 0 end as int)
    AS lang_ok,
  cast(case when e.exact_rn = 1 and c.is_dup = 0
            and q.quality_milli >= {QUALITY_MIN}
            and d.lang IN {_langs_sql()}
       then 1 else 0 end as int) AS keep
FROM docs d
JOIN exact_rank e ON e.url = d.url
JOIN clu c ON c.url = d.url
JOIN quality q ON q.url = d.url""".strip()


def corpus_curate(spark):
    """Spark side: cluster frame from the label-propagation loop, the
    rest declarative in one statement (Catalyst sees every filter)."""
    from .dedup import minhash_clusters
    clusters = minhash_clusters(spark)
    clusters.createOrReplaceTempView("nd_clusters_tmp")
    return spark.sql(f"""
WITH docs AS ({documents_wide_sql(SPARK, 'documents')}),
clu AS (SELECT url, is_dup FROM nd_clusters_tmp),
{_curate_tail(SPARK)}""")


def q_corpus_curate_oracle() -> str:
    """DuckDB oracle: the identical composition in one SQL statement
    (minhash CTEs already define ``docs``; recursive closure supplies
    the clusters)."""
    ctes = _minhash_cte(DUCKDB, distinct_shingles=False)
    return f"""
WITH RECURSIVE {ctes},
{clusters_cte_chain_duckdb()},
clu AS (SELECT url, is_dup FROM clu_final),
{_curate_tail(DUCKDB)}""".strip()
