"""Deduplication operators over the ``documents`` table.

Four families, each a `queries()` entry with a DuckDB oracle:
  exact        — hash-groupBy on text digest
  minhash-LSH  — char-5-shingles -> H minhashes -> banded buckets -> pairs
  simhash      — 16-bit sign-of-sum fingerprint, Hamming<=3 pairs
  ngram-jaccard— exact Jaccard over shingle sets for near-dup pairs

Scale notes (10^12 docs): the exact path is a single hash aggregation
(map-side combinable). MinHash signatures are one explode + min-agg,
shuffled once by (url, hash_i); LSH banding turns the quadratic pair
search into an equi-join on (band, band_hash) — the only join — and the
verify step touches candidate pairs only. SimHash buckets by hash
prefix for the same reason. All formulas are md5-based and render
identically in Spark SQL and DuckDB (dialect.py).
"""

from __future__ import annotations

from ..derive import documents_wide_sql
from ..dialect import SPARK, explode_series, idiv, md5_slice_int

SHINGLE_K = 5
N_HASHES = 16
N_BANDS = 4  # rows per band = N_HASHES / N_BANDS = 4
MERSENNE_P = 2147483647  # 2^31-1

# Fixed affine constants for the H minhash functions (deterministic,
# embedded literally so both dialects see the same numbers).
_A = [1103515245, 1299709, 15485863, 32452843, 49979687, 67867967,
      86028121, 104395301, 122949823, 141650939, 160481183, 179424673,
      198491317, 217645177, 236887691, 256203161]
_B = [12345, 54321, 98765, 13579, 24680, 11111, 22222, 33333,
      44444, 55555, 66666, 77777, 88888, 99999, 10101, 20202]


def _shingles_cte(d: str) -> str:
    """One row per (url, pos) char-5-gram with its integer hash."""
    gen = explode_series("1", f"greatest(length(text) - {SHINGLE_K - 1}, 1)",
                         "pos", d)
    h = md5_slice_int(f"substr(text, pos, {SHINGLE_K})", 1, 8, d)
    return f"""
docs AS ({documents_wide_sql(d, 'documents')}),
positions AS (
  SELECT url, text, {gen} FROM docs
),
shingles AS (
  SELECT DISTINCT url, {h} AS sh FROM positions
)""".strip()


def q_exact_dedup(d: str) -> str:
    """Exact duplicate groups by md5(text) (hash aggregation)."""
    return f"""
WITH docs AS ({documents_wide_sql(d, 'documents')})
SELECT md5(text) AS text_md5, count(*) AS n_dups,
       min(url) AS canonical_url
FROM docs GROUP BY md5(text)"""


def _minhash_cte(d: str) -> str:
    hi_gen = explode_series("0", str(N_HASHES - 1), "hi", d)
    a_case = "case " + " ".join(
        f"when hi = {i} then {a}" for i, a in enumerate(_A)) + " end"
    b_case = "case " + " ".join(
        f"when hi = {i} then {b}" for i, b in enumerate(_B)) + " end"
    return f"""
{_shingles_cte(d)},
hashed AS (
  SELECT url, sh, {hi_gen} FROM shingles
),
minhash AS (
  SELECT url, hi,
    min((({a_case}) * sh + ({b_case})) % {MERSENNE_P}) AS mh
  FROM hashed GROUP BY url, hi
),
bands AS (
  SELECT url, {idiv('hi', str(N_HASHES // N_BANDS), d)} AS band,
    md5(string_agg(cast(mh as varchar), ',' ORDER BY hi)) AS band_hash
  FROM minhash
  GROUP BY url, {idiv('hi', str(N_HASHES // N_BANDS), d)}
)""".strip()


def _minhash_cte_spark() -> str:
    # Spark: string_agg -> ordered concat via sort_array(collect_list).
    base = _minhash_cte(SPARK)
    return base.replace(
        "md5(string_agg(cast(mh as varchar), ',' ORDER BY hi)) AS band_hash",
        "md5(concat_ws(',', transform(sort_array(collect_list("
        "struct(hi, mh))), s -> cast(s.mh as string)))) AS band_hash")


def q_minhash_pairs(d: str) -> str:
    """Candidate near-duplicate pairs: equal minhash signature in >=1 band."""
    ctes = _minhash_cte_spark() if d == SPARK else _minhash_cte(d)
    return f"""
WITH {ctes}
SELECT DISTINCT a.url AS url_a, b.url AS url_b
FROM bands a JOIN bands b
  ON a.band = b.band AND a.band_hash = b.band_hash AND a.url < b.url"""


def q_minhash_signatures(d: str) -> str:
    """Per-doc minhash signature summary (checksum of the 16 minhashes)."""
    ctes = _minhash_cte_spark() if d == SPARK else _minhash_cte(d)
    return f"""
WITH {ctes}
SELECT url, cast(sum(mh) as bigint) AS sig_sum, count(*) AS n_hashes
FROM minhash GROUP BY url"""


def q_simhash(d: str) -> str:
    """16-bit SimHash: per-bit majority of word-hash bits
    (explode words x bits; fingerprint = sum of set bits' weights)."""
    gen = explode_series("0", "greatest(size_w - 1, 0)", "wi", d)
    split_len = ("size(split(text, ' '))" if d == SPARK
                 else "len(string_split(text, ' '))")
    word = ("split(text, ' ')[wi]" if d == SPARK
            else "string_split(text, ' ')[wi + 1]")
    wh = md5_slice_int("word", 1, 8, d)
    bit_gen = explode_series("0", "15", "bit", d)
    shift = "cast(floor(wh / power(2, bit)) as bigint) % 2"
    return f"""
WITH docs AS ({documents_wide_sql(d, 'documents')}),
words0 AS (
  SELECT url, text, {split_len} AS size_w FROM docs
),
words AS (
  SELECT url, {gen} FROM words0
),
whash AS (
  SELECT w.url, {wh} AS wh
  FROM (SELECT url, {word} AS word FROM (
          SELECT w0.url, w0.text, w.wi FROM words0 w0
          JOIN words w ON w.url = w0.url) t) w
),
bits AS (
  SELECT url, wh, {bit_gen} FROM whash
),
bitsum AS (
  SELECT url, bit,
    sum(case when {shift} = 1 then 1 else -1 end) AS s
  FROM bits GROUP BY url, bit
),
simhash AS (
  SELECT url,
    cast(sum(case when s > 0 then power(2, bit) else 0 end) as bigint)
      AS fingerprint
  FROM bitsum GROUP BY url
)
SELECT url, fingerprint FROM simhash"""


def q_ngram_jaccard_pairs(d: str, threshold: float = 0.6) -> str:
    """Exact n-gram Jaccard near-dup pairs (shingle-set intersection join).
    At scale the join runs over LSH candidates only; at oracle scale the
    full shingle join is exact and cheap."""
    return f"""
WITH {_shingles_cte(d)},
sizes AS (
  SELECT url, count(*) AS n FROM shingles GROUP BY url
),
inter AS (
  SELECT a.url AS url_a, b.url AS url_b, count(*) AS i
  FROM shingles a JOIN shingles b ON a.sh = b.sh AND a.url < b.url
  GROUP BY a.url, b.url
)
SELECT i.url_a, i.url_b,
  cast(round(1000.0 * i / (sa.n + sb.n - i)) as int) AS jaccard_milli
FROM inter i
JOIN sizes sa ON sa.url = i.url_a
JOIN sizes sb ON sb.url = i.url_b
WHERE cast(i as double) / (sa.n + sb.n - i) >= {threshold}"""
