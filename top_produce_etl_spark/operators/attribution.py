"""Multi-touch marketing attribution — distributing conversion
value across the touchpoints that preceded it.

Completes the attribution family: the as-of join
(operators/joins.py) is LAST-touch, the strict funnel
(operators/eventtime.py) is path-existence; this operator assigns
fractional credit to EVERY qualifying touch:

- ``linear``: each of the n touches gets 1/n;
- ``position``: 40% first touch, 40% last, the middle 20% split
  evenly across interior touches (the standard U-shaped model);
  n=1 → 100%, n=2 → 50/50.

Determinism contract: weights are evaluated in a fixed double
expression tree from integer (rank, count) inputs and shipped as
1e6 fixed-point, so the DuckDB oracle reproduces them bit-for-bit
(same IEEE ops, same order). Touch ordering is total via the
(ts, touch-id) tiebreak.

Scale shape: one equi+interval join (user-keyed hash join with a
residual time predicate — operators/joins.py:range_join, never a
nested loop), then a per-conversion window whose partition size is
touches-per-conversion (bounded by the lookback, not by data
volume). No driver state, no all-pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from top_produce_etl_spark.operators.eventtime import check_interval

WEIGHT_SCALE = 1_000_000


def multi_touch_attribution(
    conversions: DataFrame,
    touches: DataFrame,
    user_col: str,
    conv_id: str,
    conv_ts: str,
    value_col: str,
    touch_id: str,
    touch_ts: str,
    lookback: str = "7 days",
    model: str = "position",
) -> DataFrame:
    """Credit each touch within ``lookback`` before its user's
    conversion. Output: (conv_id, touch_id, touch_rank, n_touches,
    weight_micro, attributed_micro). Conversions with no touches
    emit no rows (inner join — report them via the funnel/as-of
    paths)."""
    if model not in ("linear", "position"):
        raise ValueError(f"model must be linear|position, got {model!r}")
    t = touches.select(
        F.col(user_col).alias("__t_user"),
        F.col(touch_id),
        F.col(touch_ts).alias("__t_ts"),
    )
    c = conversions.select(
        F.col(user_col), F.col(conv_id), F.col(conv_ts), F.col(value_col)
    )
    joined = c.join(
        t,
        (c[user_col] == t["__t_user"])
        & (t["__t_ts"] >= c[conv_ts] - F.expr(f"INTERVAL {check_interval(lookback, 'lookback')}"))
        & (t["__t_ts"] < c[conv_ts]),
    )
    w = Window.partitionBy(conv_id).orderBy(
        F.col("__t_ts").asc(), F.col(touch_id).asc()
    )
    wall = Window.partitionBy(conv_id)
    ranked = joined.withColumn("touch_rank", F.row_number().over(w)).withColumn(
        "n_touches", F.count(F.lit(1)).over(wall)
    )
    n = F.col("n_touches").cast("double")
    rn = F.col("touch_rank")
    if model == "linear":
        weight = F.lit(1.0) / n
    else:
        weight = (
            F.when(F.col("n_touches") == 1, F.lit(1.0))
            .when((rn == 1) | (rn == F.col("n_touches")), F.lit(0.4))
            .otherwise(F.lit(0.2) / (n - F.lit(2.0)))
        )
        # n=2: the two 0.4 endpoints would under-credit; standard
        # position model gives 50/50
        weight = F.when(F.col("n_touches") == 2, F.lit(0.5)).otherwise(weight)
    return ranked.select(
        F.col(conv_id),
        F.col(touch_id),
        "touch_rank",
        "n_touches",
        F.round(weight * WEIGHT_SCALE).cast("bigint").alias("weight_micro"),
        F.round(F.col(value_col) * weight * WEIGHT_SCALE)
        .cast("bigint")
        .alias("attributed_micro"),
    )
