"""Training-mix composition: deterministic per-domain sampling.

The last stage of a web-corpus pipeline decides HOW MUCH of each source
enters the training mix (up-weight curated domains, down-weight the
crawl head). This module implements that as a pure-SQL, fully
deterministic sampler: the keep decision is an md5 hash of the url
against a per-domain rate — NOT rand(), which silently breaks
reproducibility under Spark task retries and speculative execution
(two attempts of the same task would sample different rows; an md5
keep-hash gives byte-identical output on every retry, every cluster
size, and in the DuckDB oracle).
"""

from __future__ import annotations

from ..derive import documents_wide_sql
from ..dialect import md5_slice_int

# (tier, rate in basis points). Tier 0 = curated-grade keep-all down to
# tier 3 = crawl-head heavy downsample. In production this dim comes
# from the mix config; it is ALWAYS broadcast-sized (one row per tier).
MIX_TIERS = [(0, 10000), (1, 5000), (2, 2500), (3, 625)]
N_TIERS = len(MIX_TIERS)


def q_domain_mix_sample(d: str) -> str:
    """Per-document mix-sampling decision.

    host -> tier (md5 bucket; production would map hosts explicitly),
    tier -> rate via the broadcast VALUES dim, keep iff the url's
    10000-bucket keep-hash falls below the rate. Output is the per-doc
    decision plus its provenance columns, so downstream stages (and the
    oracle) can audit the effective per-domain rates.

    Scale shape: the rate dim is one row per tier — Catalyst broadcasts
    it —
    and everything else is whole-stage-codegen string/hash arithmetic
    on the scan; the sampler adds ZERO exchanges to a 10^12-row corpus
    (compare df.sample(), which is also non-deterministic under
    retries). Expected kept fraction per tier is rate_bp/10000 with
    binomial concentration; the driver-board oracle pins the exact
    per-row decisions, not just the rates.
    """
    values = ", ".join(f"({t}, {r})" for t, r in MIX_TIERS)
    tier = f"({md5_slice_int('host', 1, 8, d)} % {N_TIERS})"
    keep_h = md5_slice_int("concat('mixsalt_', url)", 9, 8, d)
    return f"""
WITH docs AS ({documents_wide_sql(d)}),
keyed AS (
  SELECT url, split_part(url, '/', 3) AS host,
    ({keep_h} % 10000) AS keep_hash
  FROM docs
),
tiered AS (
  SELECT url, host, keep_hash, {tier} AS tier FROM keyed
),
rates AS (SELECT * FROM (VALUES {values}) AS v(tier, rate_bp))
SELECT t.url, t.host, t.tier, r.rate_bp,
  cast(case when t.keep_hash < r.rate_bp then 1 else 0 end as int) AS kept
FROM tiered t JOIN rates r ON r.tier = t.tier""".strip()
