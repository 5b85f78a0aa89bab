"""DDSketch: mergeable quantiles with RELATIVE error.

The fixed-bin histogram rollup (operators/sketches.py) gives
mergeable quantiles with ABSOLUTE bin error — fine when the value
range is known, useless across orders of magnitude. DDSketch
(Masson, Rim, Lee — VLDB 2019, the Datadog latency sketch) buckets
on a LOG grid: bucket(x) = ⌊log_γ x⌋, so every estimate is within a
multiplicative (γ−1)-ish factor of the truth at any scale, and the
sketch is plain (bucket, count) rows — merge = SUM, the same
stored-rollup algebra as the CMS/HLL/KMV tier.

Spark-first design (100 TB shape): build is ONE hash-agg whose
distinct-key count is log-bounded (a γ=1.02 grid spans 1e-9..1e18
in ~3100 buckets); quantile extraction runs a cumulative window
over the |buckets|-row sketch per group — bounded by the GRID, not
the data, so the window is scale-safe by construction.

Cross-engine determinism: the log-bucket index is computed in
micro-nat integer space — bucket = FLOOR(L(x) / L(γ)) with
L(v) = round(ln v · 1e6) — so the boundary cases that raw
floor(ln x / ln γ) could flip across engines (a ratio of doubles
landing within 1 ulp of an integer) become exact integer division;
the estimate re-materializes as exp((b + 0.5)·lnγ) rounded to 4 dp
(both engines compute the identical double product before the
round). Non-positive values are rejected — the classic DDSketch
splits stores by sign; this engine's fixtures are positive money.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

INFO_SCALE = 1_000_000
GAMMA = 1.02


def _l_gamma_micro(gamma: float) -> int:
    import math

    return round(math.log(gamma) * INFO_SCALE)


def dd_bucket(value_sql: str, gamma: float = GAMMA):
    """Integer log-bucket of a positive value: FLOOR(L(x) / L(γ)).

    Floor — not truncate-toward-zero — is load-bearing: truncation
    would give bucket 0 the double-width span (γ⁻¹, γ), so values
    just above γ⁻¹ would be estimated at γ^0.5 with worst-case
    relative error ≈ γ^1.5−1 (~3% at γ=1.02), silently exceeding
    the advertised (γ−1) DDSketch guarantee for sub-1 values. Spark
    ``DIV`` truncates, so the floor is spelled sign-explicitly
    (ceil-of-negated for negative numerators; lg > 0 always)."""
    lg = _l_gamma_micro(gamma)
    h = (
        f"CAST(round(ln(CAST({value_sql} AS DOUBLE)) * {INFO_SCALE}) "
        f"AS BIGINT)"
    )
    return F.expr(
        f"(CASE WHEN {h} >= 0 THEN ({h}) DIV {lg}L"
        f" ELSE -((-({h}) + {lg - 1}L) DIV {lg}L) END)"
    )


def dd_bucket_sql(value_sql: str, gamma: float = GAMMA) -> str:
    """DuckDB twin of :func:`dd_bucket`. DuckDB ``//`` truncates
    toward zero on NEGATIVE integers exactly like Spark ``DIV``
    (measured: ``(-7) // 2 = -3``, not −4), so the floor must be
    spelled sign-explicitly on BOTH engines — the same
    ceil-of-negated form as the Spark side."""
    lg = _l_gamma_micro(gamma)
    h = f"CAST(round(ln(CAST({value_sql} AS DOUBLE)) * {INFO_SCALE}) AS BIGINT)"
    return (
        f"(CASE WHEN {h} >= 0 THEN ({h}) // {lg}"
        f" ELSE -((-({h}) + {lg - 1}) // {lg}) END)"
    )


def dd_build(
    df: DataFrame,
    group_cols: list[str],
    value_sql: str,
    gamma: float = GAMMA,
) -> DataFrame:
    """(group…, bucket, cnt): the mergeable sketch. Raises no rows
    for NULL values; non-positive values would produce NULL/NaN
    logs — filter them, they need the sign-split variant."""
    return (
        df.where(F.expr(f"({value_sql}) > 0"))
        .select(*group_cols, dd_bucket(value_sql, gamma).alias("bucket"))
        .groupBy(*group_cols, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def dd_merge(sketches: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merge sketches built at the same γ: SUM by (group, bucket)."""
    return sketches.groupBy(*group_cols, "bucket").agg(
        F.sum("cnt").alias("cnt")
    )


def dd_quantiles(
    sketch: DataFrame,
    group_cols: list[str],
    qs: list[float],
    gamma: float = GAMMA,
) -> DataFrame:
    """Per-group quantile estimates from the sketch.

    rank_q = ceil(q·n); the answer bucket is the first whose
    cumulative count reaches it (cumulative window over the
    grid-bounded sketch rows); estimate = γ^(b+0.5) via the micro-
    nat ln γ, rounded to 4 dp. Output: group…, q, est."""
    import math

    lg = _l_gamma_micro(gamma)
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(F.col("bucket").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = sketch.withColumn("cum", F.sum("cnt").over(w))
    totals = sketch.groupBy(*group_cols).agg(F.sum("cnt").alias("n"))
    cum = cum.join(totals, group_cols)
    out = None
    for q in qs:
        picked = (
            cum.where(
                F.col("cum") >= F.ceil(F.lit(q) * F.col("n"))
            )
            .groupBy(*group_cols)
            .agg(F.min("bucket").alias("bucket"))
            .withColumn("q", F.lit(q))
        )
        out = picked if out is None else out.unionByName(picked)
    est = F.round(
        F.exp((F.col("bucket").cast("double") + 0.5) * (lg / 1e6)),
        4,
    )
    return out.select(*group_cols, "q", est.alias("est"))


def dd_quantiles_oracle_sql(
    from_sql: str,
    group_sql: str,
    value_sql: str,
    qs: list[float],
    gamma: float = GAMMA,
) -> str:
    """DuckDB twin: same micro-nat buckets, cumulative window,
    rank pick, and 4 dp estimate."""
    lg = _l_gamma_micro(gamma)
    b = dd_bucket_sql(value_sql, gamma)
    q_rows = ", ".join(f"({q})" for q in qs)
    return f"""
        WITH sk AS (
            SELECT {group_sql} AS g, {b} AS bucket, COUNT(*) AS cnt
            FROM {from_sql} WHERE ({value_sql}) > 0
            GROUP BY 1, 2
        ),
        cum AS (
            SELECT g, bucket, cnt,
                   SUM(cnt) OVER (PARTITION BY g ORDER BY bucket
                       ROWS UNBOUNDED PRECEDING) AS cum,
                   SUM(cnt) OVER (PARTITION BY g) AS n
            FROM sk
        ),
        qs(q) AS (VALUES {q_rows})
        SELECT g AS {group_sql}, CAST(q AS DOUBLE) AS q,
               -- parenthesized ({lg} / 1e6) to match Spark's
               -- x * (lg/1e6) association — (x*lg)/1e6 rounds
               -- differently in the last ulps
               ROUND(exp((MIN(bucket) + 0.5) * ({lg} / 1e6)), 4) AS est
        FROM cum, qs
        WHERE cum >= ceil(q * n)
        GROUP BY g, q
    """
