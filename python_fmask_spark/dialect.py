"""Dual-dialect SQL fragment builders (Spark SQL + DuckDB).

Every deterministic derivation in the engine (url synthesis, geocoding,
band features) is defined ONCE as a dialect-parameterized SQL string, so
the Spark pipeline (via ``F.expr``) and the DuckDB correctness oracle
execute literally the same formula. Parity of the primitives below is
covered by tests/test_dialect_parity.py.

Dialects: ``"spark"`` | ``"duckdb"``.
"""

SPARK = "spark"
DUCKDB = "duckdb"


def _check(d: str) -> None:
    if d not in (SPARK, DUCKDB):
        raise ValueError(f"unknown dialect {d!r}")


def hexint(expr: str, d: str) -> str:
    """Parse a hex string expression into a BIGINT."""
    _check(d)
    if d == SPARK:
        return f"cast(conv({expr}, 16, 10) as bigint)"
    return f"(('0x' || {expr})::BIGINT)"


def md5_slice_int(expr: str, start: int, length: int, d: str) -> str:
    """Deterministic integer from a slice of md5(expr) — the engine's
    cross-dialect hash primitive (md5 hex output is identical in both)."""
    return hexint(f"substr(md5({expr}), {start}, {length})", d)


def jitter(expr: str, start: int, modulus: int, d: str) -> str:
    """md5-derived pseudo-random integer in [0, modulus)."""
    return f"({md5_slice_int(expr, start, 4, d)} % {modulus})"


def cast_str(expr: str, d: str) -> str:
    _check(d)
    return f"cast({expr} as string)" if d == SPARK else f"cast({expr} as varchar)"


def ts_add_seconds(ts_expr: str, n_expr: str, d: str) -> str:
    _check(d)
    if d == SPARK:
        return f"({ts_expr} + make_interval(0, 0, 0, 0, 0, 0, {n_expr}))"
    return f"({ts_expr} + {n_expr} * INTERVAL '1 second')"


def to_blob(expr: str, d: str) -> str:
    """UTF-8 string -> binary."""
    _check(d)
    return f"encode({expr}, 'UTF-8')" if d == SPARK else f"encode({expr})"


def blob_to_str(expr: str, d: str) -> str:
    _check(d)
    return f"decode({expr}, 'UTF-8')" if d == SPARK else f"decode({expr})"


def idiv(a: str, b: str, d: str) -> str:
    """Integer division (non-negative operands)."""
    _check(d)
    return f"({a} div {b})" if d == SPARK else f"({a} // {b})"


def round_half_even(expr: str, d: str) -> str:
    """Banker's rounding, matching numpy.round on the reference's
    quantization path (fmask/fmask.py:447). Works for non-negative x."""
    _check(d)
    if d == SPARK:
        return f"bround({expr})"
    # DuckDB: express HALF_EVEN manually (round() is HALF_AWAY there).
    x = expr
    return (
        f"(case when ({x}) - floor({x}) > 0.5 then floor({x}) + 1 "
        f"when ({x}) - floor({x}) < 0.5 then floor({x}) "
        f"when cast(floor({x}) as bigint) % 2 = 0 then floor({x}) "
        f"else floor({x}) + 1 end)"
    )


def log_natural(expr: str, d: str) -> str:
    _check(d)
    # Spark: ln() exists; DuckDB: ln() exists. Shared.
    return f"ln({expr})"


def explode_series(lo: str, hi: str, alias: str, d: str) -> str:
    """SELECT-list row generator producing one row per integer in
    [lo, hi] (inclusive), column named ``alias``."""
    _check(d)
    if d == SPARK:
        return f"explode(sequence({lo}, {hi})) AS {alias}"
    return f"unnest(generate_series({lo}, {hi})) AS {alias}"


def sha256_hex(expr: str, d: str) -> str:
    _check(d)
    return f"sha2({expr}, 256)" if d == SPARK else f"sha256({expr})"


def xor_int(a: str, b: str, d: str) -> str:
    """Bitwise XOR (Spark ``^`` is XOR; DuckDB ``^`` is exponent)."""
    _check(d)
    return f"({a} ^ {b})" if d == SPARK else f"xor({a}, {b})"


def octet_len(expr: str, d: str) -> str:
    """Byte length of a binary value."""
    _check(d)
    return f"length({expr})" if d == SPARK else f"octet_length({expr})"
