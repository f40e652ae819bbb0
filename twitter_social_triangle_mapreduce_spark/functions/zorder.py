"""Z-order (Morton) curve expression builders — multi-dimensional data
layout. Sorting a table by the interleaved bits of several columns keeps
rows that are close in EVERY dimension close on disk, so per-file
min/max statistics stay tight on all of them simultaneously — parquet
row-group / file skipping then prunes point and range queries on ANY of
the curve's dimensions, where a plain sort only serves its leading
column. The layout trick behind Delta/Iceberg ``OPTIMIZE ZORDER BY``,
expressed here as plain integer arithmetic.

Engine-portable: the builders emit SQL text (shifts exist in both
dialects as ``<<``/``>>``; the interleave is disjoint-bit addition), so
the DuckDB oracle runs the IDENTICAL expression.
"""

from __future__ import annotations

#: default bits per dimension (two dims → 32-bit z-values)
ZORDER_BITS = 16


def quantize_sql(col: str, lo: float, hi: float, bits: int = ZORDER_BITS) -> str:
    """SQL mapping a numeric column into ``[0, 2**bits)`` by linear
    scaling over ``[lo, hi]`` (values outside clamp). The double
    arithmetic is IEEE-identical in both engines for identical inputs,
    so quantized cells — and therefore z-values — agree bit-exactly."""
    cells = (1 << bits) - 1
    scaled = (
        f"CAST(floor(({col} - {lo!r}) / ({hi!r} - {lo!r}) * {cells}) AS BIGINT)"
    )
    return f"least(greatest({scaled}, 0), {cells})"


def zorder_sql(cols: list[str], bits: int = ZORDER_BITS) -> str:
    """SQL interleaving the low ``bits`` bits of the given (already
    quantized, non-negative) BIGINT expressions into one Morton code.
    Bit ``i`` of dimension ``j`` lands at position ``i*k + j`` — the
    terms occupy disjoint bits, so plain addition assembles the code.
    ``k*bits`` must stay <= 62 (positive int64)."""
    k = len(cols)
    if k * bits > 62:
        raise ValueError("k*bits must be <= 62 for a positive BIGINT z-value")
    terms = [
        f"((({c} >> {i}) & 1) << {i * k + j})"
        for j, c in enumerate(cols)
        for i in range(bits)
    ]
    return " + ".join(terms)
