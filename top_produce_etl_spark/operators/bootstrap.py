"""Poisson bootstrap confidence intervals (statistics tier).

The classical bootstrap resamples n rows WITH replacement B times —
inherently serial and data-sized per replicate. The POISSON
bootstrap (Chamandy et al., "Estimating Uncertainty for Massive
Data Streams", Google 2012 — public) is the distributed form:
each row independently receives a Poisson(1) multiplicity in each
replicate, so a replicate is a narrow per-row WEIGHT — no global
resample, no coordination, and the replicate dimension is a plain
explode. At 100 TB: one explode (×B) + one (group, replicate)
hash-agg + a B-row-per-group order statistic. Nothing data-sized
crosses the driver.

Determinism + cost contract: the EXPENSIVE portable string hash
runs ONCE PER ROW; per (row, replicate) entropy comes from a cheap
counter-based quadratic-mod-prime mix of (row_hash, replicate) —
the random_projection sign-matrix precedent
(operators/similarity.py::random_project) — all pure int64
arithmetic under p = 2³¹−1 with identical literals on both engines
(products stay < 2⁶² — no overflow divergence). The Poisson(1) draw
inverts the CDF on u = (mix + 0.5)/p against literal cumulative
thresholds; weighted sums route through exact DECIMAL; the CI
bounds are ORDER STATISTICS picked by row_number (ceil(q·B) ranks),
not an interpolating percentile function. Every replicate mean is
bit-identical cross-engine. (The mix is a deterministic counter RNG
at 31-bit granularity — ample for Poisson(1) weights, and the whole
point is that re-runs and engines agree.)

Reference parity: the reference (a 98-LoC config scaffold,
src/transform/top3_logic.py:1 empty) has no statistics surface;
this extends the beyond-reference applied-statistics tier beside
the A/B z-test and CUPED operators (SURVEY.md §2.12).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from top_produce_etl_spark.functions.portable_hash import (
    composite_hash_col,
    composite_hash_sql,
)

_P = 2147483647  # 2^31 - 1
_A1, _B1, _C1 = 1103515245, 12345, 7
_A2, _B2 = 69069, 104729

# cumulative Poisson(1) CDF, truncated at multiplicity 8 (mass
# beyond ~1e-5 at k=8; truncation bias is far below bootstrap noise)
_POIS_CDF = [
    sum(math.exp(-1.0) / math.factorial(j) for j in range(k + 1))
    for k in range(8)
]


def _pois_case(u_sql: str) -> str:
    """CASE ladder mapping u∈(0,1) to Poisson(1) multiplicity —
    the identical literal thresholds are inlined on both engines."""
    whens = " ".join(
        f"WHEN {u_sql} < {t!r} THEN {k}"
        for k, t in enumerate(_POIS_CDF)
    )
    return f"(CASE {whens} ELSE 8 END)"


def _u_sql(h_sql: str, rep_sql: str) -> str:
    """The per-(row, replicate) uniform: two rounds of
    quadratic-mod-prime mixing of (row hash mod p, replicate)."""
    a = f"(({h_sql}) % {_P})"
    x1 = f"((({a}) * {_A1} + ({rep_sql}) * {_B1} + {_C1}) % {_P})"
    x2 = (
        f"(((({x1}) * ({x1})) % {_P}"
        f" + (({x1}) * {_A2}) % {_P}"
        f" + ({rep_sql}) * {_B2}) % {_P})"
    )
    return f"((({x2}) + 0.5) / {float(_P)!r})"


def bootstrap_means(
    df: DataFrame,
    group_cols: list[str],
    key_sql: str,
    value_sql: str,
    b: int = 50,
    salt: str = "boot-v1",
    hasher: str = "portable",
) -> DataFrame:
    """Per-(group, replicate) Poisson-bootstrap means.

    Output: group cols + (rep int, boot_mean double). One string
    hash per ROW, one explode (×b), one hash-agg; weights are a
    codegen'd integer mix + CASE ladder, weighted sums are exact
    DECIMAL (integer weight × decimal — no decimal×decimal precision
    renegotiation to diverge cross-engine).

    ``hasher``: "portable" (oracle-checkable cross-engine — the
    battery path) or "xxhash64" (one fused JVM intrinsic masked
    non-negative — the production path; a different but equally
    valid replicate randomization, so CIs shift within bootstrap
    noise while the estimator is unchanged — the countmin/kmv
    fast-twin precedent)."""
    if hasher == "xxhash64":
        h = F.expr(
            f"xxhash64(concat('{salt}', CAST({key_sql} AS STRING)))"
            f" & 9223372036854775807"
        )
    elif hasher == "portable":
        h = composite_hash_col(
            f"concat('{salt}', CAST({key_sql} AS STRING))"
        )
    else:
        raise ValueError(f"unknown hasher: {hasher!r}")
    base = df.select(
        *group_cols,
        F.expr(value_sql).cast("decimal(28,6)").alias("__v"),
        h.alias("__h"),
    )
    # Round-robin the narrow base BEFORE the ×b explode: a compact
    # source (one parquet file at small SF — or one hot input split
    # anywhere) would otherwise put the entire exploded weight
    # pipeline on a single task; the shuffle moves |rows| narrow
    # rows to parallelize b×|rows| downstream work (measured 8.2 s →
    # ~1 s at sf0.1 / 32 cores).
    base = base.repartition(
        df.sparkSession.sparkContext.defaultParallelism
    )
    reps = base.select(
        *group_cols,
        "__v",
        "__h",
        F.explode(F.sequence(F.lit(1), F.lit(b))).alias("__rep"),
    )
    w = F.expr(_pois_case(_u_sql("__h", "__rep")))
    weighted = reps.select(
        *group_cols,
        F.col("__rep").alias("rep"),
        w.alias("__w"),
        F.col("__v"),
    )
    return (
        weighted.groupBy(*group_cols, "rep")
        .agg(
            F.sum(F.col("__v") * F.col("__w")).alias("__wx"),
            F.sum("__w").alias("__sw"),
        )
        .where(F.col("__sw") > 0)
        .select(
            *group_cols,
            "rep",
            (F.col("__wx").cast("double") / F.col("__sw"))
            .alias("boot_mean"),
        )
    )


def bootstrap_ci(
    df: DataFrame,
    group_cols: list[str],
    key_sql: str,
    value_sql: str,
    b: int = 50,
    lo: float = 0.025,
    hi: float = 0.975,
    salt: str = "boot-v1",
    hasher: str = "portable",
) -> DataFrame:
    """Percentile-bootstrap CI per group: the (ceil(lo·b), ceil(hi·b))
    ORDER STATISTICS of the b replicate means, plus the point
    estimate (exact-decimal group mean). Output: group cols +
    (point_est, ci_lo, ci_hi, n_reps)."""
    means = bootstrap_means(
        df, group_cols, key_sql, value_sql, b, salt, hasher
    )
    k_lo = max(1, math.ceil(lo * b))
    k_hi = min(b, math.ceil(hi * b))
    w = Window.partitionBy(*group_cols).orderBy(
        F.col("boot_mean").asc(), F.col("rep").asc()
    )
    ranked = means.withColumn("__rn", F.row_number().over(w))
    picks = (
        ranked.groupBy(*group_cols)
        .agg(
            F.max(
                F.when(F.col("__rn") == k_lo, F.col("boot_mean"))
            ).alias("ci_lo"),
            F.max(
                F.when(F.col("__rn") == k_hi, F.col("boot_mean"))
            ).alias("ci_hi"),
            F.count(F.lit(1)).alias("n_reps"),
        )
    )
    point = df.groupBy(*group_cols).agg(
        (
            F.sum(F.expr(value_sql).cast("decimal(28,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("point_est")
    )
    return point.join(picks, group_cols).select(
        *group_cols, "point_est", "ci_lo", "ci_hi", "n_reps"
    )


def bootstrap_means_oracle_sql(
    from_sql: str,
    group_sql: list[str],
    key_sql: str,
    value_sql: str,
    b: int = 50,
    salt: str = "boot-v1",
) -> str:
    """DuckDB twin of :func:`bootstrap_means` (bit-identical).

    AS MATERIALIZED pins the one-hash-per-row shape: inlined, DuckDB
    would re-evaluate the interpreted polynomial hash in every CASE
    branch (measured: the inlined per-(row,rep) form blew past a
    10-minute budget; this one runs in seconds)."""
    h = composite_hash_sql(f"concat('{salt}', CAST({key_sql} AS VARCHAR))")
    gsel = ", ".join(group_sql)
    u = _u_sql("__h", "__rep")
    return f"""
        SELECT {gsel}, __rep AS rep,
               CAST(SUM(__v * __w) AS DOUBLE) / SUM(__w) AS boot_mean
        FROM (
            SELECT {gsel}, __rep, __v,
                   {_pois_case(u)} AS __w
            FROM (
                WITH base AS MATERIALIZED (
                    SELECT {gsel},
                           CAST({value_sql} AS DECIMAL(28,6)) AS __v,
                           ({h}) AS __h
                    FROM {from_sql}
                )
                SELECT base.*, r.__rep
                FROM base, unnest(range(1, {b} + 1)) AS r(__rep)
            )
        )
        GROUP BY {gsel}, __rep
        HAVING SUM(__w) > 0
    """
