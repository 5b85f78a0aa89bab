"""Slowly-changing-dimension history (SCD Type 2).

Turn a change stream into versioned dimension rows with effective
ranges — the warehouse-ETL staple: each (key, value-version) becomes
one row carrying ``effective_from`` / ``effective_to`` (NULL = open)
/ ``is_current``. Consecutive duplicate values collapse (a change
row that doesn't change the tracked value creates no version), which
is the part naive implementations get wrong.

Plan shape: one shuffle on the key, then three narrow window passes
over the SAME partitioning (lag to detect change → filter → lead for
the closing timestamp); Catalyst reuses the exchange, so the whole
history build costs a single wide dependency regardless of how many
versions a key has.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(
    changes: DataFrame,
    key_cols: str | list[str],
    ts_col: str,
    tracked: str | list[str],
    tiebreak: str | list[str] | None = None,
) -> DataFrame:
    """Build the SCD2 version table from a change stream.

    Output = key cols + tracked cols + ``effective_from`` /
    ``effective_to`` / ``is_current``. Ordering within a key is
    (``ts_col``, tiebreak…) and must be total for determinism —
    pass a unique id as tiebreak when timestamps can collide.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    vals = [tracked] if isinstance(tracked, str) else list(tracked)
    ties = [tiebreak] if isinstance(tiebreak, str) else list(tiebreak or [])
    order = [F.col(ts_col).asc()] + [F.col(t).asc() for t in ties]

    w = Window.partitionBy(*keys).orderBy(*order)
    # change detection vs the previous row's tracked tuple; the
    # null-safe <=> keeps NULL→value and value→NULL transitions
    # (first row has no predecessor → always a version)
    prev_differs = F.lit(False)
    for v in vals:
        prev_differs = prev_differs | ~F.col(v).eqNullSafe(
            F.lag(F.col(v)).over(w)
        )
    first_row = F.row_number().over(w) == 1
    versions = changes.withColumn(
        "__is_version", first_row | prev_differs
    ).filter(F.col("__is_version"))

    # close each version with the NEXT version's start (over the
    # collapsed set — same key partitioning, exchange reused)
    w2 = Window.partitionBy(*keys).orderBy(*order)
    return (
        versions.withColumn(
            "effective_to", F.lead(F.col(ts_col)).over(w2)
        )
        .select(
            *keys,
            *vals,
            F.col(ts_col).alias("effective_from"),
            "effective_to",
            F.col("effective_to").isNull().alias("is_current"),
        )
    )


def pit_lookup(
    facts: DataFrame,
    history: DataFrame,
    key_cols: str | list[str],
    fact_ts: str,
    attrs: list[str] | None = None,
    from_col: str = "effective_from",
    to_col: str = "effective_to",
) -> DataFrame:
    """Point-in-time dimension lookup against an SCD2 history: for
    each fact row, attach the version whose
    ``effective_from <= fact_ts < effective_to`` (open ``to`` = the
    current version). The correctness backbone of temporal ETL —
    joining facts to ``is_current`` instead silently rewrites
    history (training-data leakage / restated reports).

    LEFT join semantics: facts before a key's first version keep
    NULLs. Since SCD2 ranges are non-overlapping per key, each fact
    matches at most one version.

    Scale: an equi-join on the key with a residual range predicate
    (operators/joins.py:range_join — hash/sort-merge, never a
    nested loop); versions-per-key is small by construction, so the
    per-key match work is bounded.
    """
    from top_produce_etl_spark.operators.joins import range_join

    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    if attrs is None:
        attrs = [
            c
            for c in history.columns
            if c not in keys and c not in (from_col, to_col, "is_current")
        ]
    clash = set(attrs) & set(facts.columns)
    if clash:
        raise ValueError(
            f"history attribute(s) {sorted(clash)} collide with fact "
            "columns — rename on one side (the output would be ambiguous)"
        )
    # the history's range/key columns enter the join under RESERVED
    # aliases, so the post-join drop-by-name can never eat a facts
    # column that happens to share from_col/to_col's name (e.g. facts
    # carrying their own 'effective_from' — round-4 advice)
    hist = history.select(
        *[F.col(k).alias(f"__h_{k}") for k in keys],
        *attrs,
        F.col(from_col).alias("__eff_lo"),
        F.coalesce(
            F.col(to_col), F.lit("9999-01-01 00:00:00").cast("timestamp")
        ).alias("__eff_hi"),
    )
    return range_join(
        facts,
        hist,
        equi_on=[(k, f"__h_{k}") for k in keys],
        left_ts=fact_ts,
        right_lo="__eff_lo",
        right_hi="__eff_hi",
        how="left",
    ).drop(*[f"__h_{k}" for k in keys], "__eff_lo", "__eff_hi")
