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
from ..dialect import DUCKDB, SPARK, explode_series, md5_slice_int
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


# ---------------------------------------------------------------------------
# benchmark decontamination (word n-gram overlap with a held-out set)
# ---------------------------------------------------------------------------

DECON_NGRAM = 8     # words per overlap n-gram (published pipelines use
#                     8-13; the synthetic ~54-word docs suit the low end)
DECON_EVAL_MOD = 20  # deterministic eval split: md5(url) % 20 == 0 (~5%)


def q_decontaminate(d: str, n: int = DECON_NGRAM,
                    eval_mod: int = DECON_EVAL_MOD) -> str:
    """Training-data decontamination: flag every training document that
    shares at least one word ``n``-gram with the evaluation split, with
    hit counts for triage (n_hit_ngrams, n_eval_docs).

    The evaluation split is a deterministic md5(url) slice of the same
    corpus (no external data); production passes a real benchmark table
    in its place — the plan shape is identical.

    Scale shape at 10^12 training docs: the eval side is benchmark-sized
    (MBs — thousands of documents, bounded regardless of corpus size),
    so its distinct n-gram set is a BROADCAST build side; the probe is
    one equi-join on the n-gram string against per-document-distinct
    training n-grams (explode + map-side distinct), then a hash
    aggregation per training url. No corpus-side sort, no all-pairs.
    The n-gram itself is split-once + slice (array ops, whole-stage
    codegen), not per-position re-tokenization.
    """
    if d == SPARK:
        gram = f"array_join(slice(split(text, ' '), pos, {n}), ' ')"
        hint = "/*+ BROADCAST(e) */ "
    else:
        gram = (f"array_to_string(list_slice(string_split(text, ' '), "
                f"pos, pos + {n - 1}), ' ')")
        hint = ""
    n_words = ("(cast(length(text) - length(replace(text, ' ', '')) "
               "as bigint) + 1)")
    gen = explode_series("1", f"greatest({n_words} - {n - 1}, 1)", "pos", d)
    is_eval = f"({md5_slice_int('url', 1, 4, d)} % {eval_mod} = 0)"
    return f"""
WITH docs AS ({documents_wide_sql(d, 'documents')}),
tagged AS (
  SELECT url, text,
    CASE WHEN {is_eval} THEN 1 ELSE 0 END AS is_eval
  FROM docs
),
positions AS (
  SELECT url, is_eval, text, {gen} FROM tagged
),
grams AS (
  SELECT DISTINCT url, is_eval, {gram} AS gram FROM positions
),
eval_grams AS (
  SELECT url AS eval_url, gram FROM grams WHERE is_eval = 1
)
SELECT {hint}g.url,
  count(DISTINCT g.gram) AS n_hit_ngrams,
  count(DISTINCT e.eval_url) AS n_eval_docs
FROM grams g JOIN eval_grams e ON g.gram = e.gram
WHERE g.is_eval = 0
GROUP BY g.url"""
