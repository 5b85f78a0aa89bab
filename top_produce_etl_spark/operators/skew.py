"""Skew-mitigation operators (SURVEY.md §4; 100 TB design notes).

Skewed keys are the dominant failure mode of big shuffles: one hot
group/join key serializes into one straggler task (or OOMs it). AQE
handles skewed *sort-merge joins* automatically
(``spark.sql.adaptive.skewJoin``), but two shapes still need manual
salting at extreme scale:

1. Low-cardinality / hot-key AGGREGATION — ``salted_agg``: add a
   deterministic salt, pre-aggregate on (key, salt) so every
   partition reduces locally, then combine the k partials per key.
   Exact for any algebraic aggregate (sum/count/min/max and
   re-aggregable combinations); the second shuffle carries only
   k·|groups| rows.

2. Hot-key LARGE⨝LARGE equi-join — ``salted_join``: salt the
   probe side deterministically (hash of its other columns mod k),
   replicate the build side k× (one copy per salt value), join on
   (key, salt). Row multiplication is confined to the build side's
   k replicas; each hot key now spreads across k tasks. Exact —
   every original pair appears exactly once.

Salts are DETERMINISTIC (xxhash64 of payload columns, not rand()):
retried tasks must re-derive the same salt or shuffle retries
produce duplicate/lost rows.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_ALGEBRAIC = {
    "sum": F.sum,
    "count": F.sum,  # partial counts combine by summation
    "min": F.min,
    "max": F.max,
}


def _salt_col(df: DataFrame, exclude: list[str], k: int) -> Column:
    payload = [c for c in df.columns if c not in exclude] or exclude
    return F.pmod(F.xxhash64(*[F.col(c) for c in payload]), F.lit(k))


def salted_agg(
    df: DataFrame,
    group_by: str | list[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 32,
) -> DataFrame:
    """Two-stage salted aggregation, exact for algebraic aggregates.

    ``aggs`` maps output column → (kind, input column) with kind in
    {sum, count, min, max}. Example::

        salted_agg(li, "l_returnflag",
                   {"n": ("count", "*"), "qty": ("sum", "l_quantity")})
    """
    groups = [group_by] if isinstance(group_by, str) else list(group_by)
    salted = df.withColumn("__salt", _salt_col(df, groups, salt_buckets))

    partials = []
    for out, (kind, col) in aggs.items():
        if kind not in _ALGEBRAIC:
            raise ValueError(f"non-algebraic aggregate: {kind}")
        expr = F.count(F.lit(1)) if kind == "count" else {
            "sum": F.sum, "min": F.min, "max": F.max
        }[kind](col)
        partials.append(expr.alias(out))
    stage1 = salted.groupBy(*groups, "__salt").agg(*partials)

    finals = [
        _ALGEBRAIC[kind](out).alias(out) for out, (kind, _) in aggs.items()
    ]
    return stage1.groupBy(*groups).agg(*finals)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Hot-key large⨝large equi-join: salt left, replicate right k×.

    Use when BOTH sides are too big to broadcast and the key
    distribution is skewed beyond what AQE's skew-join splitting
    handles. Supports inner and left joins (right/full would need
    the mirror construction).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got: {how}")
    keys = [on] if isinstance(on, str) else list(on)

    l_salted = left.withColumn("__salt", _salt_col(left, keys, salt_buckets))
    r_replicated = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    out = l_salted.join(r_replicated, keys + ["__salt"], how)
    return out.drop("__salt")


_AQE_SKEW_CONFS = (
    "spark.sql.autoBroadcastJoinThreshold",
    "spark.sql.adaptive.skewJoin.enabled",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes",
    "spark.sql.adaptive.coalescePartitions.enabled",
)


@contextmanager
def aqe_skew_tuning(
    spark,
    factor: str = "1",
    threshold: str = "16KB",
    advisory: str = "16KB",
):
    """Temporarily tune AQE's skew-join thresholds down to
    cluster-proportional values so the OptimizeSkewedJoin rewrite is
    observable at TEST data sizes, restoring confs on exit.

    This is the runtime HALF of the skew story: :func:`salted_agg` /
    :func:`salted_join` are the author-side rewrite for KNOWN-skewed
    keys (they change the plan unconditionally); AQE skew handling
    is the safety net for skew you didn't predict — it measures the
    actual map-output sizes at the shuffle boundary and splits
    oversized partitions into parallel sub-joins, replicating the
    matching build-side rows. At 100 TB the DEFAULTS (factor 5,
    256 MB) are right; this helper only scales the thresholds to the
    test corpus, it never disables the mechanism.

    Broadcast is also turned off inside the context — a skewed probe
    side that broadcast-joins never shuffles, so there is nothing
    for the skew optimizer to split (and at real scale the build
    side wouldn't fit anyway, which is exactly the regime this
    rehearses).
    """
    old = {k: spark.conf.get(k, None) for k in _AQE_SKEW_CONFS}
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor", factor
        )
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            threshold,
        )
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", advisory
        )
        spark.conf.set(
            "spark.sql.adaptive.coalescePartitions.enabled", "false"
        )
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def skew_report(
    df: DataFrame, key_cols: list[str], top_n: int = 10
) -> DataFrame:
    """Join/agg-key skew diagnosis: the top-``top_n`` heaviest keys
    with their share of all rows and their ratio to the mean key
    weight — the report an engineer reads BEFORE choosing a salt
    factor for :func:`salted_agg`/:func:`salted_join` or trusting
    AQE's skew split (a ratio_to_mean of ~1 means salting is wasted
    work; 100× means one task will run 100× longer than median).

    ONE key-counts agg (map-side partials), a 1-row totals relation
    riding the non-foldable always-0-key broadcast (house pattern),
    and a TakeOrderedAndProject cut — no global sort, no window, no
    driver state. Deterministic boundary: (count DESC, key ASC).

    Output: (*key_cols, n, share_micro, ratio_to_mean_micro) — 1e6
    fixed-point integers, oracle-exact.
    """
    if not key_cols:
        raise ValueError("skew_report requires >= 1 key column")
    if top_n < 1:
        raise ValueError(f"top_n must be >= 1, got {top_n}")
    counts = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("n"))
    totals = F.broadcast(
        counts.agg(
            F.sum("n").alias("__total"),
            F.count(F.lit(1)).alias("__nkeys"),
        ).withColumn(
            "__k", F.pmod(F.col("__total"), F.lit(1)).cast("int")
        )
    )
    top = (
        counts.withColumn(
            "__k", F.pmod(F.xxhash64(*key_cols), F.lit(1)).cast("int")
        )
        .join(totals, "__k")
        .orderBy(F.col("n").desc(), *[F.col(c).asc() for c in key_cols])
        .limit(top_n)
    )
    micro = lambda c: F.round(c * F.lit(1e6)).cast("bigint")  # noqa: E731
    return top.select(
        *key_cols,
        "n",
        micro(
            F.col("n").cast("double") / F.col("__total").cast("double")
        ).alias("share_micro"),
        micro(
            F.col("n").cast("double")
            * F.col("__nkeys").cast("double")
            / F.col("__total").cast("double")
        ).alias("ratio_to_mean_micro"),
    )
