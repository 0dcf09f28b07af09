"""Primitive-level Spark <-> DuckDB parity for every dialect.py builder
(the foundation the single-source derivations rest on)."""

from __future__ import annotations

import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")

from python_fmask_spark import dialect as D  # noqa: E402

CASES = [
    ("hexint", lambda d: D.hexint("'00ff'", d)),
    ("md5_slice", lambda d: D.md5_slice_int("'abc'", 3, 6, d)),
    ("jitter", lambda d: D.jitter("'seed text'", 7, 9973, d)),
    ("cast_str", lambda d: D.cast_str("12345", d)),
    ("ts_add", lambda d: D.ts_add_seconds(
        "timestamp '2024-06-01 10:00:00'", "98765", d)),
    ("idiv", lambda d: D.idiv("17", "5", d)),
    ("round_even_0.5", lambda d: D.round_half_even("0.5", d)),
    ("round_even_1.5", lambda d: D.round_half_even("1.5", d)),
    ("round_even_2.5", lambda d: D.round_half_even("2.5", d)),
    ("round_even_2.3", lambda d: D.round_half_even("2.3", d)),
    ("ln", lambda d: D.log_natural("7.5", d)),
    ("sha256", lambda d: D.sha256_hex("'payload'", d)),
    ("blob_roundtrip", lambda d: D.blob_to_str(D.to_blob("'héllo'", d), d)),
    ("octet_len", lambda d: D.octet_len(D.to_blob("'héllo'", d), d)),
]


@pytest.mark.parametrize("name,builder", CASES, ids=[c[0] for c in CASES])
def test_primitive_parity(spark, name, builder):
    sv = spark.sql(f"SELECT {builder(D.SPARK)} AS v").collect()[0][0]
    dv = duckdb.sql(f"SELECT {builder(D.DUCKDB)} AS v").fetchone()[0]
    assert str(sv) == str(dv), (name, sv, dv)


def test_explode_series_parity(spark):
    s = spark.sql(
        f"SELECT {D.explode_series('1', '5', 'i', D.SPARK)}").collect()
    d = duckdb.sql(
        f"SELECT {D.explode_series('1', '5', 'i', D.DUCKDB)}").fetchall()
    assert sorted(r[0] for r in s) == sorted(r[0] for r in d) == [1, 2, 3, 4, 5]
