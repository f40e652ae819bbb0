"""Engine-portable hashing expression builders.

``md5`` is the one hash primitive both Spark and DuckDB compute
identically (lowercase hex). These helpers turn digest prefixes into
integers using only functions with identical semantics in both engines
(``instr``/``substr``/arithmetic), so the SAME generated SQL text runs on
either side and produces bit-identical values.

Why integers: Spark's HashAggregate supports min/max over fixed-width
types only — a ``min(string)`` falls back to sort-based aggregation. An
int64 minhash keeps the aggregation hash-based and shrinks shuffle rows
(8 bytes vs a 32-char digest).
"""

from __future__ import annotations

HEX_DIGITS = "0123456789abcdef"


def hex_prefix_to_long_sql(col: str, nchars: int = 8) -> str:
    """SQL expression turning the first ``nchars`` hex chars of ``col``
    (a bound column holding a lowercase hex digest) into a BIGINT via
    positional nibble arithmetic. ``nchars <= 15`` keeps the value
    positive in int64. Identical text works in Spark SQL and DuckDB."""
    if not 1 <= nchars <= 15:
        raise ValueError("nchars must be in [1, 15]")
    terms = [
        f"CAST(instr('{HEX_DIGITS}', substr({col}, {i + 1}, 1)) - 1 AS BIGINT)"
        f" * {16 ** (nchars - 1 - i)}"
        for i in range(nchars)
    ]
    return "(" + " + ".join(terms) + ")"
