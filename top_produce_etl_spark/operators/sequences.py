"""Sequential-pattern operators over event streams: session path
extraction and top-path mining (SURVEY.md §2.9/§2.12 analytics tier —
sibling of operators/eventtime.py's funnel and transition matrix).

Reference parity: the reference's event model stops at per-event
transforms (src/transform/core.py is empty); path mining is part of
the beyond-reference training-data/product-analytics surface the
round briefs ask for.

Scale shape: sessionization is ONE user-keyed shuffle (the same
gap-and-island contract as operators/eventtime.py::session_window_agg);
the per-session path is built by an ordered in-group fold whose state
is one session's events — bounded by the session gap, never by
|corpus|. Top-path counting is ONE path-keyed hash agg with map-side
partial aggregation; the final top-N cut is a rank over |distinct
paths| rows, partition-pruned by Spark's TakeOrderedAndProject when N
is small. Nothing touches the driver.

Path strings are truncated at ``max_steps`` events (suffix dropped,
marked with a trailing ``>…``) so a runaway session cannot produce an
unbounded group-by key — at 100 TB the shuffle key width must be
bounded by construction, not by hope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from top_produce_etl_spark.operators.eventtime import check_interval


def session_paths(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    step_col: str,
    tiebreak: str,
    gap: str = "30 minutes",
    max_steps: int = 20,
    sep: str = ">",
) -> DataFrame:
    """One row per (user, session): the session's ordered step path.

    Ordering inside a session is (ts, tiebreak) — fully deterministic,
    same contract as eventtime.dedup_first_by_time. Output:
    (user, session_start, n_steps, path) where path is the first
    ``max_steps`` step values joined with ``sep`` (``sep + '…'``
    appended when truncated).
    """
    if max_steps < 1:
        raise ValueError(f"max_steps must be >= 1, got {max_steps}")
    check_interval(gap, "gap")
    sess = (
        df.groupBy(
            F.session_window(ts_col, gap).alias("__win"),
            F.col(user_col).alias("user"),
        )
        .agg(
            F.sort_array(
                F.collect_list(F.struct(ts_col, tiebreak, step_col))
            ).alias("__steps"),
        )
        .select(
            "user",
            F.col("__win.start").alias("session_start"),
            F.size("__steps").alias("n_steps"),
            F.concat(
                F.concat_ws(
                    sep,
                    F.slice(
                        F.transform("__steps", lambda s: s[step_col]),
                        1,
                        max_steps,
                    ),
                ),
                F.when(
                    F.size("__steps") > max_steps, F.lit(sep + "…")
                ).otherwise(F.lit("")),
            ).alias("path"),
        )
    )
    return sess


def top_paths(paths: DataFrame, n: int, path_col: str = "path") -> DataFrame:
    """Top-N most frequent paths with a deterministic boundary cut
    (count DESC, then path ASC — the sort key is unique per path row,
    so ties at rank N resolve identically on any engine or
    partitioning). Output: (path, n_sessions).

    Spark plans the sort+limit as TakeOrderedAndProject (per-partition
    top-N then a driver-side merge of N-row heads) — no global sort,
    no unpartitioned window (the plan-audit rule in plans/audit.py
    forbids data-sized global windows for exactly this case)."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    counts = paths.groupBy(F.col(path_col).alias("path")).agg(
        F.count(F.lit(1)).alias("n_sessions")
    )
    return counts.orderBy(
        F.col("n_sessions").desc(), F.col("path").asc()
    ).limit(n)
