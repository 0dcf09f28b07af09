"""Semantic edge cases for the round-5 LLM-pipeline operators
(paragraph-grain dedup, PII scrub, domain-mix sampling) that the
fixture corpus doesn't exercise; cross-engine value parity over the
real fixture is covered by test_oracle_parity."""

from __future__ import annotations

import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")

from python_fmask_spark.dialect import DUCKDB, SPARK  # noqa: E402
from python_fmask_spark.functions import dedup, sampling  # noqa: E402
from python_fmask_spark.functions import text as textfn  # noqa: E402

# 17 words -> 3 paragraphs (8 + 8 + 1) for doc 0/1; doc 2 shares doc
# 0's first 8-word paragraph exactly but nothing else.
_D0 = " ".join(f"w{i}" for i in range(17))
_D2 = " ".join(f"w{i}" for i in range(8)) + " unique tail words here"

_DOCS_SQL = f"""
SELECT * FROM (VALUES
  (0, '{_D0}', 'en', 'srcA'),
  (1, '{_D0}', 'en', 'srcB'),
  (2, '{_D2}', 'en', 'srcA')
) AS t(doc_id, text, lang, source)
"""


def _duck():
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS {_DOCS_SQL}")
    return con


def test_paragraph_dedup_duplicate_doc_fully_dropped():
    con = _duck()
    rows = {r[0]: r for r in con.execute(
        dedup.q_paragraph_dedup(DUCKDB)).fetchall()}
    # urls sort srcA/p/0 < srcA/p/2 < srcB.../p/1
    keeper = rows["https://srcA.example/p/0"]
    dup = rows["https://srcB.example/p/1"]
    partial = rows["https://srcA.example/p/2"]
    assert keeper[1:4] == (3, 3, 10000)  # n_paras, n_kept, kept_bp
    assert dup[1:4] == (3, 0, 0) and dup[4] is None  # fully deduped
    # doc 2 (12 words -> 2 paragraphs) loses only the shared first one
    assert partial[1:3] == (2, 1)
    # keeper's reassembly is its own full text re-segmented
    md5_full = con.execute(
        f"SELECT md5('{_D0}')").fetchone()[0]
    assert keeper[4] == md5_full


def test_paragraph_dedup_spark_null_for_fully_deduped(spark):
    """Spark's concat_ws('') vs DuckDB's NULL string_agg divergence is
    guarded in the builder — a fully-deduped doc must be NULL in BOTH."""
    spark.sql(_DOCS_SQL).createOrReplaceTempView("documents")
    rows = {r[0]: r for r in spark.sql(
        dedup.q_paragraph_dedup(SPARK)).collect()}
    dup = rows["https://srcB.example/p/1"]
    assert dup[2] == 0 and dup[4] is None
    spark.catalog.dropTempView("documents")


def test_pii_scrub_zero_residuals_and_counts():
    con = _duck()
    rows = con.execute(textfn.q_pii_scrub(DUCKDB)).fetchall()
    assert len(rows) == 3
    for url, n_em, n_ph, res_em, res_ph, clean_md5 in rows:
        assert (n_em, n_ph) == (1, 1), url  # exactly the planted pair
        assert (res_em, res_ph) == (0, 0), url
        assert clean_md5 is not None


def test_pii_scrub_catches_organic_pii():
    """A document that already contains PII-shaped strings: counts see
    them and the scrub removes them too (not just the planted pair)."""
    con = duckdb.connect()
    con.execute("""CREATE VIEW documents AS SELECT * FROM (VALUES
      (0, 'mail me at bob.smith@corp.example or 555-123-4567 today',
       'en', 'srcA')) AS t(doc_id, text, lang, source)""")
    url, n_em, n_ph, res_em, res_ph, _ = con.execute(
        textfn.q_pii_scrub(DUCKDB)).fetchone()
    assert n_em == 2 and n_ph == 2  # organic + planted of each
    assert res_em == 0 and res_ph == 0


def test_domain_mix_sampler_is_deterministic_and_rate_bounded():
    con = _duck()
    q = sampling.q_domain_mix_sample(DUCKDB)
    a = sorted(con.execute(q).fetchall())
    b = sorted(con.execute(q).fetchall())
    assert a == b  # md5 keep-hash: no rand() anywhere
    for url, host, tier, rate_bp, kept in a:
        assert 0 <= tier < sampling.N_TIERS
        assert rate_bp == dict(sampling.MIX_TIERS)[tier]
        assert kept in (0, 1)
    # keep-all tier must keep everything it covers
    for url, host, tier, rate_bp, kept in a:
        if rate_bp == 10000:
            assert kept == 1


def test_domain_mix_sampler_rates_converge():
    """Over the sf0.001 fixture the per-tier kept fraction lands near
    rate_bp/10000 (binomial, n>=75 per tier on this corpus)."""
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                "read_parquet('/root/testdata/sf0.001/documents.parquet')")
    q = sampling.q_domain_mix_sample(DUCKDB)
    for tier, rate_bp, n, k in con.execute(
            f"SELECT tier, rate_bp, count(*), sum(kept) FROM ({q}) "
            "GROUP BY 1, 2").fetchall():
        frac = k / n
        tol = 3 * (rate_bp / 10000 * (1 - rate_bp / 10000) / n) ** 0.5 + 1e-9
        assert abs(frac - rate_bp / 10000) <= max(tol, 0.06), (
            tier, rate_bp, n, k)
