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
