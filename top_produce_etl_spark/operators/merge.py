"""Keyed merge operators — the batch MERGE/CDC-apply surface.

A table-format-free engine still needs MERGE semantics: nightly
snapshots take upsert batches, CDC feeds (Debezium-style
insert/update/delete rows) compact into current state. Both are
expressible as ONE shuffle on the merge key plus a ranking window —
no driver-side state, no iterative logic, no row-at-a-time UDFs —
so they scale like any keyed aggregate and AQE handles skewed keys.

- ``upsert``: apply a batch of key-addressed rows onto a base
  snapshot. Updates beat base rows for the same key (source
  priority), recency (``order_col``) breaks ties within a side.
- ``apply_cdc``: compact an I/U/D change stream onto a base
  snapshot: the LATEST change per key wins; ``D`` removes the key,
  ``I``/``U`` replace the row, untouched base keys pass through.
  This is the standard "CDC compaction" plan: latest-change window
  + one full-outer join — semantically what Delta/Iceberg MERGE
  does, built from primitives.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _keys(on: str | list[str]) -> list[str]:
    return [on] if isinstance(on, str) else list(on)


def upsert(
    base: DataFrame,
    updates: DataFrame,
    on: str | list[str],
    order_col: str,
    tiebreak: str | list[str] | None = None,
) -> DataFrame:
    """Latest-wins keyed merge; the updates side has priority over
    base at equal ``order_col``. Columns are aligned by name
    (both sides must share the schema)."""
    keys = _keys(on)
    ties = [tiebreak] if isinstance(tiebreak, str) else list(tiebreak or [])
    tagged = base.withColumn("__src", F.lit(0)).unionByName(
        updates.withColumn("__src", F.lit(1))
    )
    w = Window.partitionBy(*keys).orderBy(
        F.col("__src").desc(),
        F.col(order_col).desc(),
        *[F.col(t).desc() for t in ties],
    )
    return (
        tagged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__src")
    )


def apply_cdc(
    base: DataFrame,
    changes: DataFrame,
    on: str | list[str],
    seq_col: str,
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Compact a change stream onto a snapshot.

    ``changes`` carries the base columns plus ``op_col`` (values like
    I/U/D) and a total-ordering ``seq_col`` per key (commit LSN,
    event id…). Result = base with the latest change per key
    applied; a latest ``delete_op`` removes the key entirely —
    including keys that never existed in base (delete-before-insert
    streams compact to nothing, matching log-compaction semantics).
    """
    keys = _keys(on)
    payload = [c for c in base.columns if c not in keys]

    w = Window.partitionBy(*keys).orderBy(F.col(seq_col).desc())
    latest = (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            *keys,
            F.col(op_col).alias("__op"),
            *[F.col(c).alias(f"__c_{c}") for c in payload],
        )
    )
    merged = base.join(latest, on=keys, how="full_outer")
    kept = merged.filter(
        F.col("__op").isNull() | (F.col("__op") != delete_op)
    )
    out_cols = [F.col(k) for k in keys] + [
        F.when(F.col("__op").isNotNull(), F.col(f"__c_{c}"))
        .otherwise(F.col(c))
        .alias(c)
        for c in payload
    ]
    return kept.select(*out_cols)


def merge_agg_state(
    state: DataFrame,
    delta: DataFrame,
    keys: str | list[str],
    sum_cols: list[str] | None = None,
    cnt_col: str = "cnt",
) -> DataFrame:
    """Incremental aggregate maintenance for algebraic aggregates:
    fold a DELTA of partial aggregates into the stored STATE without
    re-scanning history — the pattern that turns a daily 100 TB
    re-aggregation into a |new data|-sized job.

    Both inputs carry (keys…, cnt, sum_cols…) where the delta comes
    from aggregating only the NEW rows with the same grouping. The
    merge is union + re-aggregate: counts and sums are associative,
    so state ⊕ delta ≡ the full re-computation (the equivalence a
    DuckDB oracle checks in queries/analytics_q.py). Derived metrics
    (avg = sum/cnt) re-derive after merging — never store averages,
    they don't merge.

    One |state|+|delta| shuffle on the grouping keys; with the state
    table bucketed on those keys (io/bucketing.py) even that
    exchange drops to delta-only.
    """
    ks = _keys(keys)
    sums = sum_cols or []
    cols = ks + [cnt_col] + sums
    unioned = state.select(*cols).unionByName(delta.select(*cols))
    return unioned.groupBy(*ks).agg(
        F.sum(cnt_col).alias(cnt_col),
        *[F.sum(c).alias(c) for c in sums],
    )


def table_diff(
    old: DataFrame,
    new: DataFrame,
    on: str | list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Snapshot diff: classify every key across two table versions as
    ``added`` (only in new), ``removed`` (only in old), or
    ``changed`` (in both, any compared column differs null-safely).
    Unchanged keys are omitted — at 100 TB the diff is the small
    output, the inputs are the big ones. Output: key cols +
    ``change_type``.

    The reconciliation primitive behind incremental re-publication
    (ship only what changed), snapshot auditing, and CDC validation
    (does apply_cdc(base, stream) equal the next snapshot? diff must
    be empty). One full-outer shuffle join on the key, column
    comparison as a narrow expression — no hashing, so engines agree
    without a portable-hash contract.
    """
    keys = _keys(on)
    if compare_cols is None:
        compare_cols = [c for c in old.columns if c not in keys]
    missing = [c for c in compare_cols if c not in new.columns]
    if missing:
        raise ValueError(
            f"compare column(s) {missing} absent from the new side — "
            "diff would misreport them as changed"
        )
    o = old.select(
        *[F.col(k).alias(f"__ko_{k}") for k in keys],
        *[F.col(c).alias(f"__o_{c}") for c in compare_cols],
        F.lit(1).alias("__in_old"),
    )
    n = new.select(
        *[F.col(k).alias(f"__kn_{k}") for k in keys],
        *[F.col(c).alias(f"__n_{c}") for c in compare_cols],
        F.lit(1).alias("__in_new"),
    )
    cond = None
    for k in keys:
        c = o[f"__ko_{k}"] == n[f"__kn_{k}"]
        cond = c if cond is None else (cond & c)
    joined = o.join(n, cond, "full_outer")
    differs = F.lit(False)
    for c in compare_cols:
        differs = differs | ~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}"))
    change = (
        F.when(F.col("__in_old").isNull(), "added")
        .when(F.col("__in_new").isNull(), "removed")
        .when(differs, "changed")
    )
    return (
        joined.withColumn("change_type", change)
        .filter(F.col("change_type").isNotNull())
        .select(
            *[
                F.coalesce(F.col(f"__ko_{k}"), F.col(f"__kn_{k}")).alias(k)
                for k in keys
            ],
            "change_type",
        )
    )

def cdc_agg_deltas(
    changes: DataFrame,
    group_cols: list[str],
    sum_cols: list[str],
    op_col: str = "op",
    before_prefix: str = "before_",
    cnt_col: str = "cnt",
) -> DataFrame:
    """Turn a CDC batch (with before-images) into signed partial
    aggregates — the retraction half of incremental aggregate
    maintenance. ``merge_agg_state`` handles insert-only feeds;
    this handles the full I/U/D stream: every insert/update-after
    contributes ``+1`` and ``+measures`` under its (new) grouping,
    every delete/update-before contributes ``-1`` and ``-measures``
    under its OLD grouping (``before_<col>`` columns — the Debezium
    "before" image). An update that MOVES a row between groups
    therefore retracts from the old group and adds to the new one in
    the same batch.

    Output: (group_cols…, cnt, sum_cols…) with possibly-negative
    values — fold into the stored state with ``merge_agg_state`` and
    drop groups whose merged ``cnt`` reaches 0 (all facts deleted).
    One |batch|-sized shuffle; the fact history is never re-read,
    which is the whole point at 100 TB.
    """
    plus = changes.filter(F.col(op_col).isin("I", "U")).select(
        *group_cols,
        F.lit(1).alias(cnt_col),
        *[F.col(c).alias(c) for c in sum_cols],
    )
    minus = changes.filter(F.col(op_col).isin("U", "D")).select(
        *[
            F.col(f"{before_prefix}{c}").alias(c)
            for c in group_cols
        ],
        F.lit(-1).alias(cnt_col),
        *[
            (-F.col(f"{before_prefix}{c}")).alias(c)
            for c in sum_cols
        ],
    )
    return (
        plus.unionByName(minus)
        .groupBy(*group_cols)
        .agg(
            F.sum(cnt_col).cast("bigint").alias(cnt_col),
            *[F.sum(c).alias(c) for c in sum_cols],
        )
    )


def merge_agg_cdc(
    state: DataFrame,
    changes: DataFrame,
    group_cols: list[str],
    sum_cols: list[str],
    op_col: str = "op",
    before_prefix: str = "before_",
    cnt_col: str = "cnt",
) -> DataFrame:
    """Maintained aggregate under a full I/U/D CDC batch:
    ``state ⊕ cdc_agg_deltas(batch) ≡ recompute over the post-batch
    fact set`` (the equivalence the DuckDB oracle checks in
    queries/etl_q.py). Groups whose count reaches zero disappear,
    matching the recomputed aggregate exactly."""
    delta = cdc_agg_deltas(
        changes, group_cols, sum_cols,
        op_col=op_col, before_prefix=before_prefix, cnt_col=cnt_col,
    )
    merged = merge_agg_state(
        state, delta, group_cols, sum_cols=sum_cols, cnt_col=cnt_col
    )
    return merged.filter(F.col(cnt_col) != 0)
