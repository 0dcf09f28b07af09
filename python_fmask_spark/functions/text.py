"""Text-analysis operators over ``documents``: language-ID, quality
scoring, token counting, document fingerprinting.

All counting is done with replace-arithmetic (length deltas), which is
deterministic and identical across Spark SQL and DuckDB — no regex
engine differences in the correctness path.
"""

from __future__ import annotations

from ..derive import documents_wide_sql
from ..dialect import SPARK, cast_str, explode_series, idiv, md5_slice_int

# marker substring per language (simple stopword heuristic)
_LANG_MARKERS = {
    "en": " the ", "de": " der ", "fr": " le ", "es": " el ", "zh": " de ",
}


def _count_occurrences(text: str, needle: str) -> str:
    n = len(needle)
    esc = needle.replace("'", "''")
    return f"((length({text}) - length(replace({text}, '{esc}', ''))) / {n})"


# single-space word count — THE tokenization convention every quality
# signal in this module shares (q_quality_score, q_token_counts,
# q_repetition, q_ref_likelihood); change it HERE only
N_WORDS_EXPR = ("(cast((length(text) - length(replace(text, ' ', ''))) "
                "as bigint) + 1)")


def q_lang_id(d: str) -> str:
    """N-gram/stopword language score: occurrence counts of per-language
    marker tokens; guess = argmax (ties -> lexicographic first)."""
    scores = ", ".join(
        f"cast({_count_occurrences('text', m)} as bigint) AS score_{lang}"
        for lang, m in _LANG_MARKERS.items())
    score_cols = [f"score_{lang}" for lang in _LANG_MARKERS]
    best = f"greatest({', '.join(score_cols)})"
    guess = "case " + " ".join(
        f"when score_{lang} = best_score and best_score > 0 then '{lang}'"
        for lang in _LANG_MARKERS) + " else 'und' end"
    return f"""
WITH docs AS ({documents_wide_sql(d, 'documents')}),
scored AS (
  SELECT url, lang, {scores} FROM docs
),
best AS (
  SELECT *, {best} AS best_score FROM scored
)
SELECT url, lang AS lang_label, {guess} AS lang_guess,
  {', '.join(score_cols)}
FROM best"""


def quality_ctes(d: str) -> str:
    """CTE-chain fragment over an in-scope ``docs`` relation
    (url, text): defines ``qfeats`` and ``quality`` (url, n_chars,
    n_words, *_milli, quality_milli). Factored out so composite
    pipelines (functions/curation.py) can reuse the exact scoring
    expressions in the same statement without re-deriving docs."""
    n_words = N_WORDS_EXPR
    # digit count via chained replaces 0-9
    inner = "text"
    for ch in "0123456789":
        inner = f"replace({inner}, '{ch}', '')"
    n_digits = f"(length(text) - length({inner}))"
    n_the = _count_occurrences("text", " the ")
    return f"""qfeats AS (
  SELECT url, length(text) AS n_chars, {n_words} AS n_words,
    {n_digits} AS n_digits,
    cast({n_the} as bigint) AS n_stop
  FROM docs
),
quality AS (
  SELECT url, n_chars, n_words,
    cast(round(1000.0 * (n_chars - n_words + 1) / n_words) as bigint)
      AS mean_word_len_milli,
    cast(round(1000.0 * n_stop / n_words) as bigint) AS stopword_milli,
    cast(round(1000.0 * n_digits / n_chars) as bigint) AS digit_milli,
    cast(round(least(1000.0,
        200.0 * ln(1 + n_chars) + 2000.0 * n_stop / n_words
        - 3000.0 * n_digits / n_chars)) as bigint) AS quality_milli
  FROM qfeats
)""".strip()


def q_quality_score(d: str) -> str:
    """Quality heuristics: length, word count, mean word length,
    stopword ratio, digit ratio -> milli-score."""
    return f"""
WITH docs AS ({documents_wide_sql(d, 'documents')}),
{quality_ctes(d)}
SELECT url, n_chars, n_words, mean_word_len_milli, stopword_milli,
  digit_milli, quality_milli
FROM quality"""


def q_token_counts(d: str) -> str:
    """Whitespace tokens + BPE-ish subword estimate (ceil(chars/4) per
    word, the common ~4-chars-per-token rule)."""
    n_words = N_WORDS_EXPR
    n_chars_nospace = "cast(length(replace(text, ' ', '')) as bigint)"
    return f"""
WITH docs AS ({documents_wide_sql(d, 'documents')})
SELECT url, {n_words} AS ws_tokens,
  cast(ceil({n_chars_nospace} / 4.0) + {n_words} - 1 as bigint)
    AS bpe_tokens_est,
  length(text) AS n_chars
FROM docs"""


def q_fingerprint(d: str) -> str:
    """Winnowing-style fingerprint: min + max + count of 5-gram hashes,
    plus whole-text digest (rolling-hash family, cf. A10 inverted index)."""
    gen = explode_series("1", "greatest(length(text) - 4, 1)", "pos", d)
    h = md5_slice_int("substr(text, pos, 5)", 1, 8, d)
    return f"""
WITH docs AS ({documents_wide_sql(d, 'documents')}),
positions AS (
  SELECT url, text, {gen} FROM docs
),
hashes AS (
  SELECT url, {h} AS sh FROM positions
)
SELECT url, min(sh) AS fp_min, max(sh) AS fp_max,
  count(DISTINCT sh) AS fp_card,
  cast(sum(sh) % 9007199254740993 as bigint) AS fp_sum
FROM hashes GROUP BY url"""


DUP_SPAN_K = 20  # chars per span gram (exact-substring dedup pipelines
#                  use ~50-token windows; 20 chars is the equivalent
#                  grain on the short synthetic docs)


def q_dup_span_coverage(d: str, k: int = DUP_SPAN_K) -> str:
    """Cross-document duplicated-text fraction: the share of a
    document's char ``k``-gram positions whose gram also appears in at
    least one OTHER document (the exact-substring-dedup signal — bulk
    boilerplate and mirrored text score high; within-document
    repetition is deliberately excluded, q_repetition covers that).

    Scale shape at 10^12 docs: this is the canonical two-aggregation
    substring-dedup plan — (1) explode positions, hash each gram to
    8 bytes (two md5 32-bit halves, so the hash space doesn't saturate
    at corpus scale), aggregate distinct-doc counts per gram (map-side
    combinable, shuffle carries only (hash, url) pairs), (2) join the
    duplicated grams back to the position stream and aggregate per url.
    Both shuffles key on the gram hash, so AQE coalesces them into one
    exchange reuse; in production the duplicated-gram set (count > 1)
    is orders of magnitude smaller than the gram stream and becomes a
    broadcast/bloom build side.
    """
    gen = explode_series("1", f"greatest(length(text) - {k - 1}, 1)",
                         "pos", d)
    h1 = md5_slice_int(f"substr(text, pos, {k})", 1, 8, d)
    h2 = md5_slice_int(f"substr(text, pos, {k})", 9, 8, d)
    frac = idiv("(1000 * cast(sum(is_dup) as bigint))", "count(*)", d)
    if d == SPARK:
        # Single execution of the gram stream (r6): pre-aggregate per
        # (gram, url) — map-side combinable, the standard two-level
        # replacement for count(DISTINCT url) (guide §2.5) — then a
        # count() window over the gram partition gives the distinct-doc
        # count with no self-join and no second derivation of the
        # explode+md5 subtree (the declarative form below references
        # `grams` twice and Catalyst executes it per reference).
        # Identical output: sum(cnt) == count(*) over positions, and
        # the dup flag weighting by cnt reproduces the per-position
        # is_dup sum.
        frac2 = idiv("(1000 * cast(sum(case when n_docs > 1 then cnt "
                     "else 0 end) as bigint))", "sum(cnt)", d)
        return f"""
WITH docs AS ({documents_wide_sql(d, 'documents')}),
positions AS (
  SELECT url, text, {gen} FROM docs
),
grams AS (
  SELECT url, {h1} AS g1, {h2} AS g2 FROM positions
),
gram_url AS (
  SELECT g1, g2, url, count(*) AS cnt FROM grams GROUP BY g1, g2, url
),
gd AS (
  SELECT url, cnt, count(*) OVER (PARTITION BY g1, g2) AS n_docs
  FROM gram_url
)
SELECT url, cast(sum(cnt) as bigint) AS n_grams,
  cast(sum(case when n_docs > 1 then cnt else 0 end) as bigint)
    AS n_dup_grams,
  cast({frac2} as bigint) AS dup_frac_milli
FROM gd GROUP BY url"""
    return f"""
WITH docs AS ({documents_wide_sql(d, 'documents')}),
positions AS (
  SELECT url, text, {gen} FROM docs
),
grams AS (
  SELECT url, {h1} AS g1, {h2} AS g2 FROM positions
),
gram_docs AS (
  SELECT g1, g2, count(DISTINCT url) AS n_docs
  FROM grams GROUP BY g1, g2
),
flagged AS (
  SELECT gr.url,
    CASE WHEN gd.n_docs > 1 THEN 1 ELSE 0 END AS is_dup
  FROM grams gr
  JOIN gram_docs gd ON gr.g1 = gd.g1 AND gr.g2 = gd.g2
)
SELECT url, count(*) AS n_grams,
  cast(sum(is_dup) as bigint) AS n_dup_grams,
  cast({frac} as bigint) AS dup_frac_milli
FROM flagged GROUP BY url"""


def q_repetition(d: str) -> str:
    """Gopher-style repetition filter signals (Rae et al. 2021 §A1.1,
    the standard LLM-training-data quality gate): per document, the
    fraction of all word-bigrams taken by the single most frequent
    bigram, and the distinct-word ratio — high top-bigram fraction or
    low distinct ratio flags boilerplate/spam for removal.

    Fractions are emitted as exact integer micros (floor(1e6 * a / b)
    with bigint operands — one IEEE division of exact integers, so the
    value is identical cross-engine). One-word documents have no
    bigrams: they still appear (LEFT JOIN from the word stats) with
    NULL bigram columns rather than silently vanishing from the
    quality-signal output. Scale shape: one explode to word positions
    (like q_fingerprint's shingles), then map-side-combinable
    (url, bigram) counts; no joins wider than url."""
    nw = N_WORDS_EXPR
    gen = explode_series("1", nw, "i", d)
    return f"""
WITH docs AS ({documents_wide_sql(d, 'documents')}),
positions AS (
  SELECT url, text, {nw} AS nw, {gen} FROM docs
),
words AS (
  SELECT url, split_part(text, ' ', cast(i as int)) AS w
  FROM positions
),
bgc AS (
  SELECT url,
    split_part(text, ' ', cast(i as int)) || '_'
      || split_part(text, ' ', cast(i + 1 as int)) AS bg,
    count(*) AS c
  FROM positions
  WHERE i < nw GROUP BY 1, 2
),
bg_stats AS (
  SELECT url, cast(max(c) as bigint) AS top_bigram_n,
    cast(sum(c) as bigint) AS n_bigrams
  FROM bgc GROUP BY url
),
w_stats AS (
  SELECT url, cast(count(DISTINCT w) as bigint) AS n_distinct_words,
    cast(count(*) as bigint) AS n_words
  FROM words GROUP BY url
)
SELECT w.url, w.n_words, w.n_distinct_words,
  cast(floor(1000000.0 * w.n_distinct_words / w.n_words) as bigint)
    AS distinct_word_micro,
  b.top_bigram_n, b.n_bigrams,
  cast(floor(1000000.0 * b.top_bigram_n / b.n_bigrams) as bigint)
    AS top_bigram_micro
FROM w_stats w LEFT JOIN bg_stats b ON b.url = w.url""".strip()


REF_LM_MOD = 20  # reference split: md5(url) % 20 == 1 (~5%), disjoint
#                  from q_decontaminate's eval slice (% mod == 0)


def q_ref_likelihood(d: str, ref_mod: int = REF_LM_MOD) -> str:
    """Reference-corpus likelihood quality score (the CCNet-style
    statistical filter, Wenzek et al. 2020): score every document by
    how typical its words are of a trusted reference split — the
    complement to the heuristic signals in q_quality_score. Low
    commonness + high OOV flags gibberish, lorem-ipsum, and
    wrong-register text that rule-based filters miss.

    The reference split is a deterministic md5(url) slice of the same
    corpus (no external data); production passes a curated corpus
    (CCNet uses Wikipedia) — the plan shape is identical. The score is
    the add-one-smoothed average unigram probability of the document
    under the reference LM, emitted as exact integer micros:

        commonness_micro = (1e6 * (sum_w c_ref(w) + n_words))
                           div (n_words * (N_ref + V_ref))

    Everything before the final ``div`` is a bigint aggregate, so the
    value is bit-identical cross-engine with NO floating point at all
    (CCNet's KenLM perplexity needs per-word logs whose libm noise
    would break the oracle hash; the log-free form ranks documents the
    same way for filtering and keeps the gate exact. At 10^12-doc scale
    the 1e6-scaled numerator can exceed int64 — production divides
    counts through by a power of two first, or plugs a real KenLM via
    mapInPandas and drops the exactness claim).

    Scale shape: the reference LM is vocab-sized regardless of corpus
    size — a BROADCAST build side; the probe is one equi-join of the
    exploded word stream against it, then a map-side-combinable
    per-url aggregation; the two corpus constants are a 1-row dim
    cross-joined (broadcast) into the final projection. No corpus-side
    sort, no all-pairs.

    An EMPTY reference split (no url hits the md5 slice — possible on
    tiny corpora or a mischosen ref_mod) makes the score undefined:
    commonness_micro is emitted as NULL for every row, guarded
    explicitly so both dialects agree (unguarded, Spark's ``div 0``
    returns NULL while DuckDB's ``// 0`` raises — a parity trap).
    """
    nw = N_WORDS_EXPR
    gen = explode_series("1", nw, "i", d)
    is_ref = f"({md5_slice_int('url', 1, 4, d)} % {ref_mod} = 1)"
    hint = "/*+ BROADCAST(lm) */ " if d == SPARK else ""
    micro = ("CASE WHEN v = 0 THEN NULL ELSE "
             + idiv("(1000000 * (hit_mass + n_words))",
                    "(n_words * (coalesce(n_tot, 0) + v))", d)
             + " END")
    oov_micro = idiv("(1000000 * oov_words)", "n_words", d)
    return f"""
WITH docs AS ({documents_wide_sql(d, 'documents')}),
positions AS (
  SELECT url, text, {gen} FROM docs
),
words AS (
  SELECT url, split_part(text, ' ', cast(i as int)) AS w
  FROM positions
),
lm AS (
  SELECT w, cast(count(*) as bigint) AS c
  FROM words WHERE {is_ref} GROUP BY w
),
consts AS (
  SELECT cast(sum(c) as bigint) AS n_tot, cast(count(*) as bigint) AS v
  FROM lm
),
scored AS (
  SELECT {hint}dw.url,
    cast(count(*) as bigint) AS n_words,
    cast(sum(coalesce(lm.c, 0)) as bigint) AS hit_mass,
    cast(sum(CASE WHEN lm.w IS NULL THEN 1 ELSE 0 END) as bigint)
      AS oov_words
  FROM words dw LEFT JOIN lm ON lm.w = dw.w
  GROUP BY dw.url
)
SELECT url, n_words, hit_mass, oov_words,
  cast({micro} as bigint) AS commonness_micro,
  cast({oov_micro} as bigint) AS oov_micro
FROM scored CROSS JOIN consts""".strip()


def q_pii_scrub(d: str) -> str:
    """PII redaction — scrub email addresses and phone numbers with
    typed placeholder tokens, carrying per-type match counts so the
    pipeline can audit scrub coverage (a standard pre-training
    compliance stage).

    The synthetic corpus contains no organic PII, so the query first
    PLANTS it deterministically (an md5-derived email + dashed phone
    appended per document — same construction in both dialects), then
    scrubs and counts. The zero-residual columns re-scan the SCRUBBED
    text with the same patterns and must come back 0 for every row —
    the in-query proof that replacement caught everything the counter
    saw, which is exactly the audit a production run ships.

    Patterns avoid backslash classes ([0-9] not \\d) so the same
    literal pattern string parses identically in Java regex (Spark) and
    RE2 (DuckDB). Scale: pure whole-stage-codegen regexp work on the
    scan, no exchange at all; per-type counts are map-side column
    arithmetic, not a groupBy.
    """
    email_pat = "[a-zA-Z0-9._]+@[a-zA-Z0-9.-]+[.][a-zA-Z][a-zA-Z]+"
    phone_pat = "[0-9]{3}-[0-9]{3}-[0-9]{4}"

    def _count(src: str, pat: str) -> str:
        if d == SPARK:
            return f"size(regexp_extract_all({src}, '{pat}', 0))"
        return f"len(regexp_extract_all({src}, '{pat}', 0))"

    def _scrub(src: str, pat: str, token: str) -> str:
        if d == SPARK:
            return f"regexp_replace({src}, '{pat}', '{token}')"
        return f"regexp_replace({src}, '{pat}', '{token}', 'g')"

    h = "substr(md5(concat('pii_', url)), 1, 6)"

    def _num(start: int, modulus: int, width: int) -> str:
        digits = cast_str(f"({md5_slice_int('url', start, 6, d)} % {modulus})", d)
        return f"lpad({digits}, {width}, '0')"

    planted = (f"concat(text, ' contact ', {h}, '@', split_part(url, '/', 3),"
               f" ' or call ', {_num(1, 800, 3)}, '-', {_num(7, 1000, 3)},"
               f" '-', {_num(13, 10000, 4)})")
    scrub1 = _scrub("pii_text", email_pat, "<EMAIL>")
    scrub2 = _scrub(scrub1, phone_pat, "<PHONE>")
    return f"""
WITH docs AS ({documents_wide_sql(d, 'documents')}),
planted AS (
  SELECT url, {planted} AS pii_text FROM docs
),
scrubbed AS (
  SELECT url, pii_text,
    cast({_count('pii_text', email_pat)} as bigint) AS n_emails,
    cast({_count('pii_text', phone_pat)} as bigint) AS n_phones,
    {scrub2} AS clean_text
  FROM planted
)
SELECT url, n_emails, n_phones,
  cast({_count('clean_text', email_pat)} as bigint) AS residual_emails,
  cast({_count('clean_text', phone_pat)} as bigint) AS residual_phones,
  md5(clean_text) AS clean_md5
FROM scrubbed""".strip()
