"""Join operators beyond plain ``df.join``.

Spark picks broadcast-hash / shuffled-hash / sort-merge itself (AQE
can switch at runtime); these helpers encode the cases where the
author knows more than the optimizer:

- ``broadcast_dim_join``: explicit broadcast hint for dimension
  tables (region=5 rows, nation=25). At 100 TB the fact side never
  shuffles for a broadcast join — this is the difference between a
  map-side join and a full-table exchange.
- ``range_join``: equi-key + interval predicate. The equi key keeps
  it a hash/sort-merge join (NOT a cartesian product); the range
  predicate is evaluated post-match.
- ``asof_join``: "latest right-row at-or-before each left row" —
  no native Spark primitive. Implemented as union + window
  ``last(ignorenulls)`` which is a single shuffle on the key
  (union-sort), NOT an O(n·m) range join. This is the scalable
  formulation: one exchange + one per-key ordered scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def broadcast_dim_join(
    fact: DataFrame, dim: DataFrame, on: str | list[str], how: str = "inner"
) -> DataFrame:
    """Join a fact table to a small dimension with a broadcast hint."""
    return fact.join(F.broadcast(dim), on=on, how=how)


def semi_join(left: DataFrame, right: DataFrame, on: str | list[str]) -> DataFrame:
    """Existence filter — no right columns, no row duplication."""
    return left.join(right, on=on, how="left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: str | list[str]) -> DataFrame:
    """Absence filter."""
    return left.join(right, on=on, how="left_anti")


def range_join(
    left: DataFrame,
    right: DataFrame,
    equi_on: list[str | tuple[str, str]],
    left_ts: str,
    right_lo: str,
    right_hi: str,
    how: str = "inner",
) -> DataFrame:
    """Equi + interval join: match when the equi keys agree and
    ``right_lo <= left_ts < right_hi``. The equi keys make this a
    hash/sort-merge join with a residual range filter — never a
    broadcast-nested-loop, so it scales. ``equi_on`` items are a
    shared column name or a ``(left_name, right_name)`` pair."""
    cond = None
    for k in equi_on:
        lk, rk = (k, k) if isinstance(k, str) else k
        c = left[lk] == right[rk]
        cond = c if cond is None else (cond & c)
    rng = (left[left_ts] >= right[right_lo]) & (left[left_ts] < right[right_hi])
    cond = rng if cond is None else (cond & rng)
    return left.join(right, on=cond, how=how)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """As-of join: for each left row, attach the most recent right
    row with the same key and ``right_ts <= left_ts``.

    Strategy (single shuffle): tag both sides, union by name, sort
    per key by (ts, side-tag) with a window, and carry the latest
    right values forward via ``last(..., ignorenulls=True)``. Right
    rows at exactly left_ts match (tag orders right before left at
    equal ts). Left rows with no prior right row get NULLs.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in keys and c != right_ts]

    l_tag = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__lrow"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in right_cols],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("__rts"),
    )
    r_tag = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(l_tag.schema["__lrow"].dataType).alias("__lrow"),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
        F.col(right_ts).alias("__rts"),
    )
    unioned = l_tag.unionByName(r_tag)
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *keys,
        "__side",
        "__lrow",
        *[
            F.last(F.col(f"__r_{c}"), ignorenulls=True).over(w).alias(f"__r_{c}")
            for c in right_cols
        ],
        F.last(F.col("__rts"), ignorenulls=True).over(w).alias("__rts"),
    ).filter(F.col("__side") == 1)
    out = filled.select(
        *[F.col(f"__lrow.{c}").alias(c) for c in left.columns],
        *[F.col(f"__r_{c}").alias(c + suffix if c in left.columns else c) for c in right_cols],
        F.col("__rts").alias(right_ts + suffix),
    )
    return out
