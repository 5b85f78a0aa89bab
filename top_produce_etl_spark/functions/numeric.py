"""Numeric helpers — exact, order-independent aggregation.

Float summation across N shuffle partitions is order-dependent:
``sum(double)`` can differ bit-wise between runs, between partition
counts, and between engines (SURVEY.md §7 risk #2). Every money-like
aggregate in this engine therefore routes through exact DECIMAL
arithmetic and casts to double only at the very end — deterministic
on any cluster size, and bit-identical to a DuckDB oracle computing
the same decimal expression serially.

This costs little: Spark's decimal hash-aggregate is still
whole-stage-codegen'd JVM code with map-side partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# decimal(18,4) holds money-like doubles exactly after rounding to
# 4 places; sums widen to decimal(38,x) which Spark keeps exact.
DEC = "decimal(18,4)"


def dec(col: Column | str, typ: str = DEC) -> Column:
    """Cast to exact decimal for order-independent arithmetic."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(typ)


def dec_sum(col: Column | str, alias: str | None = None) -> Column:
    """Exact decimal sum surfaced as double (deterministic)."""
    out = F.sum(dec(col)).cast("double")
    return out.alias(alias) if alias else out


def revenue_expr() -> Column:
    """``l_extendedprice * (1 - l_discount)`` as exact decimal.

    The canonical revenue expression over the lineitem fixture;
    decimal-exact so partition order can't perturb the sum.
    """
    one = F.lit(1).cast(DEC)
    return dec("l_extendedprice") * (one - dec("l_discount"))


def safe_div(num: Column, den: Column) -> Column:
    """NULL-on-zero division as double (both engines agree on
    IEEE double division given identical operands)."""
    return F.when(den != 0, num.cast("double") / den.cast("double"))


# ---------------------------------------------------------------------------
# Fixed-point fast path
#
# The decimal path above is exact but slow: every double→decimal cast
# allocates a BigDecimal, and once the product/sum precision exceeds 18
# digits Spark's Decimal leaves its compact-long representation — the
# whole aggregate runs on boxed BigDecimal arithmetic. For money-like
# columns (finite decimal granularity, here 2 dp — asserted in
# tests/test_registry.py) the same exact result is available in pure
# long arithmetic inside whole-stage codegen: scale to integer units
# once per row, sum longs, convert the final per-group total to decimal
# exactly once. Measured ~1.9x faster on the q1 aggregate profile at
# sf0.1 (0.52 s vs 0.97 s), bit-identical output.
#
# Overflow design for 100 TB: a single long accumulator would overflow
# at ~10^8 rows/group for revenue-sized values (10^11 units/row). The
# sum is therefore SPLIT into two long accumulators — low 20 bits and
# the arithmetic-shifted high part — recombined exactly in decimal
# after aggregation. Margins per group: sum(lo) < n·2^20 overflows at
# n ≈ 8.8×10^12 rows; sum(hi) at ~10^14 rows for dollar-scale values.
# TPC-H at 100 TB is ~6×10^11 lineitem rows, so even a single global
# group holds >10x headroom; beyond that, ANSI mode (session default)
# makes long overflow a loud error, never a silent wrap.
# ---------------------------------------------------------------------------

_SPLIT_SHIFT = 20
_SPLIT_BASE = 1 << _SPLIT_SHIFT


def units(col: Column | str, frac_digits: int = 2) -> Column:
    """Exact fixed-point integer units of a money-like double, as long.

    ``round(x·10^f)`` recovers the true f-dp value exactly while
    ``|x|·10^f ≤ 2^53`` (double-integer range) — far above any money
    column. The round() absorbs the representation error of the
    stored double (e.g. 0.05 → 0.05000000000000000277…).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * F.lit(float(10**frac_digits)), 0).cast("long")


def units_sum(u: Column, frac_digits: int, alias: str | None = None) -> Column:
    """Order-independent EXACT sum of fixed-point long units → double.

    Aggregate expression: two long sums (low 20 bits / high part,
    split with shiftright + bitwiseAND so negatives reconstruct
    exactly) recombined in decimal and divided by ``10^frac_digits``
    — bit-identical to the decimal-sum oracle, but the per-row path
    is three codegen'd long ops instead of BigDecimal arithmetic.
    """
    lo = u.bitwiseAND(F.lit(_SPLIT_BASE - 1))
    hi = F.shiftright(u, _SPLIT_SHIFT)
    total = F.sum(hi).cast("decimal(38,0)") * F.lit(_SPLIT_BASE).cast(
        "decimal(7,0)"
    ) + F.sum(lo).cast("decimal(38,0)")
    d = frac_digits + 1
    out = (total / F.lit(10**frac_digits).cast(f"decimal({d},0)")).cast("double")
    return out.alias(alias) if alias else out


def units_sum_over(u: Column, frac_digits: int, w) -> Column:
    """Windowed variant of :func:`units_sum`: the hi/lo long sums run
    ``.over(w)`` (same frame for both, so they see identical rows)
    and recombine exactly per output row."""
    lo = u.bitwiseAND(F.lit(_SPLIT_BASE - 1))
    hi = F.shiftright(u, _SPLIT_SHIFT)
    total = F.sum(hi).over(w).cast("decimal(38,0)") * F.lit(_SPLIT_BASE).cast(
        "decimal(7,0)"
    ) + F.sum(lo).over(w).cast("decimal(38,0)")
    d = frac_digits + 1
    return (total / F.lit(10**frac_digits).cast(f"decimal({d},0)")).cast("double")


def money_sum(col: Column | str, alias: str | None = None, frac_digits: int = 2) -> Column:
    """Fast exact sum of a 2-dp money column (drop-in for
    :func:`dec_sum` where the column granularity is known)."""
    return units_sum(units(col, frac_digits), frac_digits, alias)


def revenue_units() -> Column:
    """``l_extendedprice * (1 - l_discount)`` in exact 1e-6-dollar
    long units: cents × (10000 − discount-basis-points). Pure long
    arithmetic per row; sum with ``units_sum(…, 6)``. Bit-identical
    to ``sum(revenue_expr())`` (pinned in tests/test_registry.py)."""
    cents = units("l_extendedprice", 2)
    bp = units("l_discount", 4)
    return cents * (F.lit(10000) - bp)


def revenue_sum(alias: str | None = None) -> Column:
    """Exact revenue aggregate on the long fast path → double."""
    return units_sum(revenue_units(), 6, alias)
