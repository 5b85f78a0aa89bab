"""Statistical outlier detection per group (data-quality tier,
sibling of operators/quality.py's declarative checks).

Two classic fences over a numeric column within each group:

- **IQR fence**: value > Q3 + k·(Q3 − Q1) (Tukey upper fence;
  k=1.5 classically — tighten k for short-tailed distributions,
  where the 1.5 fence provably never fires, e.g. uniform data).
- **z-score**: (value − mean) / stddev, reported alongside so
  downstream thresholds can differ per consumer.

Scale shape: ONE aggregate pass computes every per-group statistic
(exact interpolated percentiles + decimal-exact moment sums —
map-side partial agg, |groups| rows out), then the stats frame —
bounded by |groups|, not data size — broadcasts back onto the rows.
No window over the raw data, no second shuffle of the fact table.

Engine-portability: moment sums accumulate in DECIMAL (associative
— partition-order independent and bit-comparable to a serial SQL
oracle, see functions.numeric rationale); the mean/variance/z
arithmetic is a fixed-order double expression on those exact sums.
Percentiles use Spark's exact interpolated ``percentile``, matching
DuckDB's ``quantile_cont`` (same convention as
queries/advanced.py's stats_moments_lineitem).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from top_produce_etl_spark.functions.numeric import dec


def group_outlier_stats(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    dec_type: str = "decimal(12,2)",
    fence_k: float = 1.5,
) -> DataFrame:
    """Per-group stats: n, mean, stddev (sample), q1, q3, and the
    Tukey upper fence — one aggregate pass.

    ``dec_type`` sizes the exact accumulators; its SQUARE must fit
    an int128 decimal so the sum-of-squares stays portable to a
    DuckDB oracle (decimal(12,2) covers money-like domains;
    decimal(18,4)² overflows DuckDB's decimal multiply)."""
    n = F.count(F.lit(1))
    s = F.sum(dec(value_col, dec_type)).cast("double")
    # dec()² keeps the sum of squares exact and associative
    sq = F.sum(dec(value_col, dec_type) * dec(value_col, dec_type)).cast(
        "double"
    )
    mean = s / n
    var = (sq - s * s / n) / (n - F.lit(1))
    q1 = F.expr(f"percentile({value_col}, 0.25)")
    q3 = F.expr(f"percentile({value_col}, 0.75)")
    return df.groupBy(*group_cols).agg(
        n.alias("n"),
        mean.alias("mean"),
        F.sqrt(var).alias("stddev"),
        q1.alias("q1"),
        q3.alias("q3"),
        (q3 + F.lit(float(fence_k)) * (q3 - q1)).alias("fence_hi"),
    )


def iqr_outlier_rows(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    keep_cols: list[str] | None = None,
    fence_k: float = 1.5,
) -> DataFrame:
    """Rows above their group's Tukey upper fence, annotated with a
    z-score. The stats frame is |groups|-sized → broadcast join; the
    fact side never shuffles."""
    stats = group_outlier_stats(df, group_cols, value_col, fence_k=fence_k)
    keep = keep_cols if keep_cols is not None else df.columns
    joined = df.join(F.broadcast(stats), on=group_cols)
    return (
        joined.filter(F.col(value_col) > F.col("fence_hi"))
        .select(
            *keep,
            F.round(
                (F.col(value_col) - F.col("mean")) / F.col("stddev"), 6
            ).alias("zscore6"),
            F.round(F.col("fence_hi"), 6).alias("fence_hi6"),
        )
    )


def seasonal_zscores(
    df: DataFrame,
    ts_col: str,
    season_expr: str = "dayofweek",
) -> DataFrame:
    """Season-aware volume anomaly scores: each day's event count
    z-scored against ITS OWN season's baseline (same day-of-week by
    default) — the metric that catches "this Tuesday is unlike other
    Tuesdays" where a flat baseline hides the weekly cycle.

    Determinism: per-day counts are integers, per-season moments are
    integer sums, and the z-score evaluates in a fixed IEEE double
    tree from those integers → 1e6 fixed point, DuckDB-oracle-exact.
    Seasons with zero variance yield NULL z.

    Scale: one day-grain aggregate over the stream (map-side
    partial), then |seasons|-row stats joined back via broadcast —
    the fact-side day table never re-shuffles.
    """
    if season_expr not in ("dayofweek", "month"):
        raise ValueError(f"unsupported season_expr: {season_expr}")
    season = (
        F.dayofweek(F.col("day"))
        if season_expr == "dayofweek"
        else F.month(F.col("day"))
    )
    daily = (
        df.groupBy(F.date_trunc("day", ts_col).alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("season", season.cast("int"))
    )
    stats = daily.groupBy("season").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("n").alias("s1"),
        F.sum(F.col("n") * F.col("n")).alias("s2"),
    )
    joined = daily.join(F.broadcast(stats), "season")
    cnt = F.col("cnt").cast("double")
    s1 = F.col("s1").cast("double")
    s2 = F.col("s2").cast("double")
    mean = s1 / cnt
    var = (cnt * s2 - s1 * s1) / (cnt * cnt)
    z = F.when(var > 0, (F.col("n").cast("double") - mean) / F.sqrt(var))
    return joined.select(
        "day",
        "season",
        "n",
        F.round(z * F.lit(1_000_000)).cast("bigint").alias("z_micro"),
    )


def psi_report(
    df: DataFrame,
    value_col: str,
    is_current_col: str,
    quantiles: int = 10,
) -> DataFrame:
    """Population Stability Index between a REFERENCE slice and a
    CURRENT slice of one numeric column — the standard production
    drift metric (banking/scorecard lineage) beside the chi² gate
    for categoricals: PSI = Σ_bins (p_cur − p_ref)·ln(p_cur/p_ref),
    with bins = the reference slice's quantile edges, so the
    reference lands ~uniformly and drift shows as mass imbalance.

    Determinism: edges are exact `percentile` values rounded to 6 dp
    (both engines pin this — see price_quantiles_by_priority);
    binning is a count of edges below the value (a constant-width
    array fold, codegen'd); per-bin PSI contributions round to 1e6
    fixed point BEFORE any cross-bin sum. Empty bins on either side
    yield NULL contributions (ln 0) — report rows keep the counts so
    the consumer sees WHY.

    Shape: one agg on the reference slice for edges (1-row broadcast
    on the non-foldable key), one (slice, bin) hash agg, one |bins|-
    row pivot — the data is scanned twice (edges need the full
    reference pass first; unavoidable for exact quantile edges) and
    never shuffled wider than |bins|.

    Output: (bin, n_ref, n_cur, psi_contrib_micro), bin 0..quantiles-1.
    """
    if quantiles < 2:
        raise ValueError(f"quantiles must be >= 2, got {quantiles}")
    v = F.col(value_col).cast("double")
    cur = F.col(is_current_col).cast("int")
    probs = [i / quantiles for i in range(1, quantiles)]
    prob_arr = ", ".join(repr(p) for p in probs)
    edges_row = (
        df.filter(cur == 0)
        .agg(
            F.expr(
                f"transform(percentile(CAST({value_col} AS DOUBLE),"
                f" array({prob_arr})), e -> round(e, 6))"
            ).alias("__edges")
        )
        .withColumn("__k", F.pmod(F.size("__edges"), F.lit(1)).cast("int"))
    )
    keyed = df.select(
        v.alias("__v"),
        cur.alias("__cur"),
        F.pmod(F.xxhash64(value_col), F.lit(1)).cast("int").alias("__k"),
    )
    binned = keyed.join(F.broadcast(edges_row), "__k").select(
        F.size(F.filter("__edges", lambda e: F.col("__v") > e)).alias("bin"),
        "__cur",
    )
    counts = binned.groupBy("bin").agg(
        F.sum(F.when(F.col("__cur") == 0, 1).otherwise(0)).alias("n_ref"),
        F.sum(F.when(F.col("__cur") == 1, 1).otherwise(0)).alias("n_cur"),
    )
    tot = F.broadcast(
        counts.agg(
            F.sum("n_ref").alias("__tr"), F.sum("n_cur").alias("__tc")
        ).withColumn("__k", F.pmod(F.col("__tr"), F.lit(1)).cast("int"))
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    p_ref = F.try_divide(d("n_ref"), d("__tr"))
    p_cur = F.try_divide(d("n_cur"), d("__tc"))
    contrib = F.when(
        (F.col("n_ref") > 0) & (F.col("n_cur") > 0),
        F.round(
            (p_cur - p_ref) * F.log(p_cur / p_ref) * F.lit(1e6)
        ).cast("bigint"),
    )
    return (
        counts.withColumn("__k", F.pmod(F.col("n_ref"), F.lit(1)).cast("int"))
        .join(tot, "__k")
        .select("bin", "n_ref", "n_cur", contrib.alias("psi_contrib_micro"))
    )


# Benford's-law expected first-digit probabilities log10(1 + 1/d),
# precomputed as Python doubles and inlined into BOTH engines so no
# engine's log10 participates (the EWMA weight-literal trick).
BENFORD_P = {
    d: __import__("math").log10(1.0 + 1.0 / d) for d in range(1, 10)
}


def benford_report(df: DataFrame, value_col: str) -> DataFrame:
    """First-significant-digit distribution vs Benford's law — the
    classic bulk fraud / fabricated-data screen for naturally-spread
    positive amounts: per digit d ∈ 1..9, observed share vs
    log10(1+1/d) and the χ² contribution n·(obs−exp)²/exp.

    The digit comes from the DECIMAL(18,2) string rendering (first
    character), not floating log10 — integer-exact in both engines
    for positive amounts ≥ 1. One digit-keyed agg (9 groups) + a
    1-row total on the non-foldable key; shares and χ² contributions
    are a fixed double tree over exact counts → 1e6 fixed point.

    Output: (digit, n, obs_micro, exp_micro, chi2_contrib_micro).
    """
    digit = F.substring(
        F.col(value_col).cast("decimal(18,2)").cast("string"), 1, 1
    )
    counts = (
        df.filter(F.col(value_col) >= 1)
        .groupBy(digit.alias("digit"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = F.broadcast(
        counts.agg(F.sum("n").alias("__t")).withColumn(
            "__k", F.pmod(F.col("__t"), F.lit(1)).cast("int")
        )
    )
    exp_map = F.create_map(
        *[
            x
            for d, p in BENFORD_P.items()
            for x in (F.lit(str(d)), F.lit(p))
        ]
    )
    j = counts.withColumn(
        "__k", F.pmod(F.col("n"), F.lit(1)).cast("int")
    ).join(tot, "__k")
    obs = F.col("n").cast("double") / F.col("__t").cast("double")
    exp = exp_map[F.col("digit")]
    micro = lambda c: F.round(c * F.lit(1e6)).cast("bigint")  # noqa: E731
    chi2 = (
        F.col("__t").cast("double") * (obs - exp) * (obs - exp) / exp
    )
    return j.select(
        "digit",
        "n",
        micro(obs).alias("obs_micro"),
        micro(exp).alias("exp_micro"),
        micro(chi2).alias("chi2_contrib_micro"),
    )


def ks_two_sample(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    is_current_col: str,
) -> DataFrame:
    """Per-group two-sample Kolmogorov-Smirnov statistic between a
    reference slice and a current slice — the nonparametric member
    of the drift suite (χ² for categoricals, PSI for binned numerics,
    KS for raw numeric distributions): D = max_x |F_ref(x) − F_cur(x)|
    over the empirical CDFs.

    One partitioned window pass over the combined slices ordered by
    (value, slice): running per-slice counts give both ECDFs at every
    step; each step's |ΔF| rounds to 1e6 fixed point BEFORE the
    group max, so the statistic is an integer max — engine-exact.
    The window partitions on the GROUP keys (the audit's
    unpartitioned-window rule stays satisfied); within a group the
    pass is the same shape as any ranking window.

    Output: (*keys, n_ref, n_cur, ks_micro).
    """
    from pyspark.sql import Window

    if not keys:
        raise ValueError("ks_two_sample requires >= 1 group key")
    v = F.col(value_col).cast("double")
    cur = F.col(is_current_col).cast("int")
    base = df.select(*keys, v.alias("__v"), cur.alias("__cur"))
    # RANGE frame (value peers included): with ties, the ECDF only
    # exists AFTER the whole tie group — a ROWS frame would evaluate
    # |ΔF| mid-tie and report phantom drift on identical slices
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__v").asc())
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot = Window.partitionBy(*keys)
    stepped = base.withColumn(
        "__cr", F.sum((F.col("__cur") == 0).cast("int")).over(w)
    ).withColumn(
        "__cc", F.sum(F.col("__cur")).over(w)
    ).withColumn(
        "__nr", F.sum((F.col("__cur") == 0).cast("int")).over(tot)
    ).withColumn(
        "__nc", F.sum(F.col("__cur")).over(tot)
    )
    diff_micro = F.round(
        F.abs(
            F.try_divide(F.col("__cr").cast("double"), F.col("__nr").cast("double"))
            - F.try_divide(F.col("__cc").cast("double"), F.col("__nc").cast("double"))
        )
        * F.lit(1e6)
    ).cast("bigint")
    return (
        stepped.withColumn("__d", diff_micro)
        .groupBy(*keys)
        .agg(
            F.max("__nr").alias("n_ref"),
            F.max("__nc").alias("n_cur"),
            F.max("__d").alias("ks_micro"),
        )
    )


def cusum_changepoints(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    value_sql: str,
    k_milli: int = 500,
    h_milli: int = 4000,
) -> DataFrame:
    """Tabular CUSUM changepoint detection per series (r7,
    beyond-reference §2.12) — the sequential drift alarm the
    batch-window gates (PSI/KS/divergence) can't give you: WHERE in
    the series the level shifted, not just that two slices differ.
    Page (1954), the public SPC literature:

        S⁺_t = max(0, S⁺_{t−1} + (x_t − μ − k·σ))
        S⁻_t = max(0, S⁻_{t−1} + (μ − x_t − k·σ))

    alarm when S exceeds h·σ (k = slack in σ units, typically 0.5;
    h = decision interval, typically 4-5).

    Spark-first shape: the recursive clamp LOOKS fold-only, but has
    a closed form over prefix sums — ``S⁺_t = C_t − min(0,
    min_{j≤t} C_j)`` with ``C`` the cumulative sum of the slack-
    adjusted deviations (the clamp resets exactly where the running
    min does). So the whole detector is ONE partition-ordered
    exchange reused by two window passes (cumulative sum, running
    min) — no UDF, no iteration, no driver state.

    Determinism contract: μ and σ derive from exact DECIMAL sums
    (cast to double once), deviations round to 1e6 fixed point per
    row BEFORE the integer prefix sums, thresholds compare in the
    same integer space — bit-identical cross-engine
    (:func:`cusum_oracle_sql`).

    Output: (keys…, order_col, value, s_pos_micro, s_neg_micro,
    alarm_up, alarm_down), the full monitor trace.
    """
    if k_milli < 0 or h_milli <= 0:
        raise ValueError(
            f"k_milli must be >= 0 and h_milli > 0, got {k_milli}, {h_milli}"
        )
    from pyspark.sql import Window

    x = F.expr(value_sql).cast("double")
    series = df.select(
        *keys, F.col(order_col), x.alias("__x"),
        F.expr(value_sql).cast("decimal(28,6)").alias("__xd"),
    )
    # μ/σ as UNORDERED window aggregates over the same key
    # partitioning the ordered CUSUM windows need — the planner
    # satisfies all three passes from ONE exchange, where the
    # agg+join formulation recomputed the (possibly expensive)
    # upstream relation once per branch (observed: 4 exchanges → 1)
    w0 = Window.partitionBy(*keys)
    n = F.count(F.lit(1)).over(w0)
    s1 = F.sum("__xd").over(w0).cast("double")
    s2 = F.sum(F.col("__xd") * F.col("__xd")).over(w0).cast("double")
    mu = s1 / n
    sigma = F.sqrt(
        F.greatest(
            (s2 - s1 * s1 / n) / F.greatest(n - 1, F.lit(1)),
            F.lit(0.0),
        )
    )
    series = series.select(
        *keys, order_col, "__x",
        mu.alias("__mu"), sigma.alias("__sigma"),
    )
    k = k_milli / 1000.0
    lab = series.select(
        *keys, order_col,
        F.col("__x").alias("value"),
        F.round(
            (F.col("__x") - F.col("__mu") - F.lit(k) * F.col("__sigma"))
            * 1e6
        ).cast("bigint").alias("__dp"),
        F.round(
            (F.col("__mu") - F.col("__x") - F.lit(k) * F.col("__sigma"))
            * 1e6
        ).cast("bigint").alias("__dn"),
        F.round(F.col("__sigma") * (h_milli / 1000.0) * 1e6)
        .cast("bigint")
        .alias("__thr"),
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(order_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = lab.select(
        *keys, order_col, "value", "__thr",
        F.sum("__dp").over(w).alias("__cp"),
        F.sum("__dn").over(w).alias("__cn"),
    )
    s_pos = F.col("__cp") - F.least(
        F.lit(0).cast("bigint"), F.min("__cp").over(w)
    )
    s_neg = F.col("__cn") - F.least(
        F.lit(0).cast("bigint"), F.min("__cn").over(w)
    )
    return cum.select(
        *keys, order_col, "value",
        s_pos.alias("s_pos_micro"),
        s_neg.alias("s_neg_micro"),
        (s_pos > F.col("__thr")).alias("alarm_up"),
        (s_neg > F.col("__thr")).alias("alarm_down"),
    )


def cusum_oracle_sql(
    from_sql: str,
    keys: list[str],
    order_sql: str,
    value_sql: str,
    k_milli: int = 500,
    h_milli: int = 4000,
    order_name: str = "ord",
) -> str:
    """DuckDB twin of :func:`cusum_changepoints` (bit-identical)."""
    g = ", ".join(keys)
    k = k_milli / 1000.0
    h = h_milli / 1000.0
    return f"""
    WITH series AS (
        SELECT {g}, {order_sql} AS ord,
               CAST({value_sql} AS DOUBLE) AS x,
               CAST({value_sql} AS DECIMAL(28,6)) AS xd
        FROM {from_sql}
    ),
    st AS (
        SELECT {g},
               CAST(SUM(xd) AS DOUBLE) / COUNT(*) AS mu,
               sqrt(greatest(
                   (CAST(SUM(xd * xd) AS DOUBLE)
                    - CAST(SUM(xd) AS DOUBLE) * CAST(SUM(xd) AS DOUBLE)
                      / COUNT(*))
                   / greatest(COUNT(*) - 1, 1), 0.0)) AS sigma
        FROM series GROUP BY {g}
    ),
    lab AS (
        SELECT s.*, CAST(round((s.x - st.mu - {k!r} * st.sigma) * 1e6)
                    AS BIGINT) AS dp,
               CAST(round((st.mu - s.x - {k!r} * st.sigma) * 1e6)
                    AS BIGINT) AS dn,
               CAST(round(st.sigma * {h!r} * 1e6) AS BIGINT) AS thr
        FROM series s JOIN st USING ({g})
    ),
    cum AS (
        SELECT {g}, ord, x, thr,
               SUM(dp) OVER (PARTITION BY {g} ORDER BY ord
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cp,
               SUM(dn) OVER (PARTITION BY {g} ORDER BY ord
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cn
        FROM lab
    ),
    runmin AS (
        SELECT {g}, ord, x, thr, cp, cn,
               MIN(cp) OVER (PARTITION BY {g} ORDER BY ord
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mp,
               MIN(cn) OVER (PARTITION BY {g} ORDER BY ord
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mn
        FROM cum
    )
    SELECT {g}, ord AS {order_name}, x AS value,
           cp - least(CAST(0 AS BIGINT), mp) AS s_pos_micro,
           cn - least(CAST(0 AS BIGINT), mn) AS s_neg_micro,
           cp - least(CAST(0 AS BIGINT), mp) > thr AS alarm_up,
           cn - least(CAST(0 AS BIGINT), mn) > thr AS alarm_down
    FROM runmin
    """


def mad_outlier_rows(
    df: DataFrame,
    group_cols: list[str],
    value_sql: str,
    keep_cols: list[str] | None = None,
    k_milli: int = 3500,
) -> DataFrame:
    """MAD-based robust outliers per group (r7): flag rows with
    ``|x − median| > (k/1000) · 1.4826 · MAD`` where MAD = the
    median absolute deviation — the robust-statistics gold standard
    (Hampel; Leys et al. 2013): mean/stddev z-scores mask outliers
    because the outliers INFLATE the stddev (a 49%-contaminated
    group still flags under MAD; one wild row can zero out a z-score
    screen), and Tukey fences still lean on moments of the middle.
    1.4826 makes MAD a consistent σ estimate under normality, so
    k ≈ 3.5 matches the classic "3.5 robust z" rule.

    Determinism contract: both medians are ORDER STATISTICS — the
    ceil(n/2)-th smallest picked by row_number (lower median; no
    interpolation convention in play — the bootstrap/conformal
    house rule) with value-then-row ordering so ties break
    identically cross-engine. Two ordered windows over the same
    group partitioning + one broadcast of the |groups|-row stats.

    Output: keep_cols + (med6, mad6, robust_z6) for flagged rows.
    """
    if k_milli <= 0:
        raise ValueError(f"k_milli must be > 0, got {k_milli}")
    from pyspark.sql import Window

    keep = keep_cols if keep_cols is not None else df.columns
    x = F.expr(value_sql).cast("double")
    base = df.withColumn("__x", x).where(F.col("__x").isNotNull())
    w = Window.partitionBy(*group_cols).orderBy(
        F.col("__x").asc(), *[F.col(c) for c in keep]
    )
    wn = Window.partitionBy(*group_cols)
    r1 = base.withColumn("__rk", F.row_number().over(w)).withColumn(
        "__n", F.count(F.lit(1)).over(wn)
    )
    med = (
        r1.where(F.col("__rk") == F.ceil(F.col("__n") / 2))
        .groupBy(*group_cols)
        .agg(F.max("__x").alias("__med"))
    )
    dev = base.join(F.broadcast(med), group_cols).withColumn(
        "__d", F.abs(F.col("__x") - F.col("__med"))
    )
    wd = Window.partitionBy(*group_cols).orderBy(
        F.col("__d").asc(), *[F.col(c) for c in keep]
    )
    r2 = dev.withColumn("__rk", F.row_number().over(wd)).withColumn(
        "__n", F.count(F.lit(1)).over(wn)
    )
    mad = (
        r2.where(F.col("__rk") == F.ceil(F.col("__n") / 2))
        .groupBy(*group_cols)
        .agg(F.max("__d").alias("__mad"))
    )
    scored = dev.join(F.broadcast(mad), group_cols).withColumn(
        "__rz",
        F.col("__d") / (F.lit(1.4826) * F.col("__mad")),
    )
    return (
        scored.filter(
            (F.col("__mad") > 0)
            & (F.col("__rz") > F.lit(k_milli / 1000.0))
        )
        .select(
            *keep,
            F.round(F.col("__med"), 6).alias("med6"),
            F.round(F.col("__mad"), 6).alias("mad6"),
            F.round(F.col("__rz"), 6).alias("robust_z6"),
        )
    )
