"""Data-mixture rebalancing — deterministic downsampling to target
category proportions (training-data tier).

Pre-training corpora are blended to a recipe ("50% en, 20% code,
…"). Given integer target weights per category, this operator keeps
the LARGEST corpus achievable at exactly those proportions without
upsampling: the binding category is kept whole(-ish) and every other
category is deterministically downsampled.

All sizing is integer arithmetic (no float rates), so both engines
agree bit-for-bit:

    W      = Σ weights
    cap_c  = n_c · W div w_c        (total size if c binds)
    S      = min_c cap_c            (achievable total)
    keep_c = w_c · S div W          (≤ n_c by construction)

with n_c taken over EVERY key in ``weights`` (n_c = 0 when the
category has no matching rows — a typo'd name or a post-filter
empty). A zero count caps S at 0, so the result is EMPTY rather
than a corpus at silently-wrong proportions (round-4 advice).

Two selection strategies, both salted + append-stable via the
portable hash (same contract as operators/splits.py):

- ``hash`` (the 100 TB default): keep a row iff
  ``bucket · n_c < keep_c · BUCKETS`` — a narrow per-row predicate
  after a tiny |categories|-row broadcast join. Zero wide shuffle,
  zero sort; hits keep_c in expectation (±binomial noise).
- ``exact``: rank rows per category by (hash, key) and keep the
  first keep_c — exact counts, at the cost of a per-category
  window sort. Fine when categories are balanced; at 100 TB with a
  dominant category prefer ``hash`` (the sort partitions by
  category — the skew note on operators/topn.py applies).

Both strategies are fully deterministic, so both carry complete
DuckDB oracles (queries/text_q.py).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from top_produce_etl_spark.functions.portable_hash import (
    composite_hash_col,
    composite_hash_sql,
)
from top_produce_etl_spark.operators.splits import BUCKETS, _check_safe

_SAFE_CATEGORY = re.compile(r"[A-Za-z0-9_.\-]+")


def _validate(
    weights: dict[str, int], salt: str, category_col: str, key_col: str
) -> int:
    _check_safe(salt, key_col)
    _check_safe("x", category_col)  # identifier check only
    if not weights:
        raise ValueError("weights must be non-empty")
    for cat, w in weights.items():
        if not _SAFE_CATEGORY.fullmatch(cat):
            raise ValueError(
                f"category value must match {_SAFE_CATEGORY.pattern!r}, "
                f"got {cat!r} (values are interpolated into SQL)"
            )
        if not isinstance(w, int) or w <= 0:
            raise ValueError(f"weights must be positive ints, got {cat}={w!r}")
    return sum(weights.values())


def _keep_counts(
    df: DataFrame, category_col: str, weights: dict[str, int], W: int
) -> DataFrame:
    """|categories|-row frame (category, n, keep) via the integer
    sizing rule; rides broadcast joins thereafter.

    Absent-category rule: counting starts from the WEIGHTS relation
    (left join to the observed counts), so a weighted category with
    zero matching rows contributes cap = 0, which forces S = 0 and
    an EMPTY result — the only corpus that matches the recipe when
    an ingredient is missing. Defined behavior beats the silent
    alternative (dropping the key and returning a corpus at the
    WRONG proportions); it stays lazy (no eager validation count)
    and both engines share it."""
    cats = df.sparkSession.createDataFrame(
        [(c, w) for c, w in weights.items()],
        f"{category_col} string, __w bigint",
    )
    cnt = (
        # broadcast the RIGHT (non-preserved) side: the |categories|-
        # row count aggregate. Hinting the preserved side of an outer
        # join is unsupported (planner warns and ignores it).
        cats.join(
            F.broadcast(
                df.filter(F.col(category_col).isin(*weights))
                .groupBy(category_col)
                .agg(F.count(F.lit(1)).alias("__n"))
            ),
            category_col,
            "left",
        )
        .withColumn("__n", F.coalesce(F.col("__n"), F.lit(0)))
        .withColumn("__cap", F.expr(f"__n * {W} DIV __w"))
    )
    s = cnt.agg(F.min("__cap").alias("__s")).withColumn(
        "__k", F.pmod(F.col("__s"), F.lit(1)).cast("int")
    )
    return (
        cnt.withColumn("__k", F.pmod(F.col("__cap"), F.lit(1)).cast("int"))
        .join(F.broadcast(s), "__k")
        .withColumn("__keep", F.expr(f"__w * __s DIV {W}"))
        .select(category_col, "__n", "__keep")
    )


def rebalance_mixture(
    df: DataFrame,
    category_col: str,
    key_col: str,
    weights: dict[str, int],
    salt: str = "mix-v1",
    strategy: str = "hash",
) -> DataFrame:
    """Downsample ``df`` to the target category mixture. Returns the
    kept rows (original columns). See module docstring for the
    sizing rule and the two strategies."""
    W = _validate(weights, salt, category_col, key_col)
    if strategy not in ("hash", "exact"):
        raise ValueError(f"strategy must be hash|exact, got {strategy!r}")
    keep = _keep_counts(df, category_col, weights, W)
    bucket = (
        composite_hash_col(f"concat('{salt}', CAST({key_col} AS STRING))")
        % BUCKETS
    )
    cols = df.columns
    joined = df.join(F.broadcast(keep), category_col)
    if strategy == "hash":
        out = joined.filter(bucket * F.col("__n") < F.col("__keep") * BUCKETS)
    else:
        # stage the composite hash in its OWN projection: the
        # avalanche-mixed polynomial is a large expression tree, and
        # referenced inside a window ORDER BY it is re-analyzed /
        # re-codegen'd across the sort and window nodes (measured
        # ~5 s of pure fixed overhead at sf0.1 in cap_per_category —
        # the k-means literal-centroid lesson, clustering.py:44)
        w = Window.partitionBy(category_col).orderBy("__b", key_col)
        out = (
            joined.withColumn("__b", bucket)
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= F.col("__keep"))
        )
    return out.select(*cols)


def mixture_oracle_sql(
    weights: dict[str, int],
    category_col: str,
    key_col: str,
    salt: str = "mix-v1",
    strategy: str = "hash",
    table: str = "documents",
    select_cols: str | None = None,
) -> str:
    """DuckDB twin computing the identical kept-row set."""
    W = _validate(weights, salt, category_col, key_col)
    select_cols = select_cols or f"{key_col}, {category_col}"
    vals = ", ".join(f"('{c}', {w})" for c, w in weights.items())
    in_list = ", ".join(f"'{c}'" for c in weights)
    keyed = f"('{salt}' || CAST({key_col} AS VARCHAR))"
    bucket = f"(({composite_hash_sql(keyed)}) % {BUCKETS})"
    # counting starts from the weights VALUES relation (left join) so
    # an absent weighted category yields __n = 0 → S = 0 → empty —
    # the same defined behavior as _keep_counts on the Spark side
    base = f"""
    base AS (
        SELECT *, {bucket} AS __b
        FROM {table}
        WHERE {category_col} IN ({in_list})
    ), wts(__wc, __cw) AS (
        VALUES {vals}
    ), cnt AS (
        SELECT w.__wc AS __c, w.__cw AS __cw,
               COUNT(b.{category_col}) AS __n
        FROM wts w LEFT JOIN base b ON b.{category_col} = w.__wc
        GROUP BY 1, 2
    ), s AS (
        SELECT MIN(__n * {W} // __cw) AS __s FROM cnt
    ), keep AS (
        SELECT __c, __n, __cw * __s // {W} AS __keep FROM cnt, s
    )"""
    if strategy == "hash":
        return f"""
    WITH {base}
    SELECT {select_cols}
    FROM base JOIN keep ON base.{category_col} = keep.__c
    WHERE __b * __n < __keep * {BUCKETS}
    """
    return f"""
    WITH {base}
    SELECT {select_cols}
    FROM (
        SELECT base.*, __keep,
               ROW_NUMBER() OVER (
                   PARTITION BY {category_col} ORDER BY __b, {key_col}
               ) AS __rn
        FROM base JOIN keep ON base.{category_col} = keep.__c
    )
    WHERE __rn <= __keep
    """


_PPM = 1_000_000  # per-million fixed point for derived proportions


def temperature_rebalance(
    df: DataFrame,
    category_col: str,
    key_col: str,
    salt: str = "temp-v1",
) -> DataFrame:
    """Temperature-smoothed mixture sampling (α = 0.5): downsample
    so category shares move from p_c toward p_c^α — the standard
    multilingual/multi-source flattening (big sources shrink, small
    sources keep more of their mass; see e.g. the XLM-R sampling
    rule). Unlike :func:`rebalance_mixture`, the recipe is DERIVED
    FROM THE DATA in-plan — no driver-side weights, fully lazy:

        n_c    = per-category count            (|categories| rows)
        w_c    = floor(sqrt(n_c))              (α=0.5; sqrt is
                 IEEE-correctly-rounded, so both engines agree
                 bit-for-bit — the reason α is fixed at 0.5 rather
                 than a free pow(), whose cross-engine rounding is
                 not contractual)
        p_c    = max(1, w_c · 1e6 div W)       (per-million integer
                 proportion; the max(1) guards pathological
                 #categories > 1e6)
        cap_c  = n_c · 1e6 div p_c             (total if c binds)
        S      = min_c cap_c
        keep_c = p_c · S div 1e6

    All products stay under int64 for corpora to ~10^12 rows per
    category — the per-million normalization is what keeps n_c · W
    out of the formula (that product overflows at petascale).
    Selection is the same salted-hash narrow predicate as
    ``rebalance_mixture(strategy="hash")``: one count aggregate,
    one |categories|-row broadcast back, zero wide shuffle."""
    _check_safe(salt, key_col)
    _check_safe("x", category_col)
    cnt = (
        df.groupBy(category_col)
        .agg(F.count(F.lit(1)).alias("__n"))
        .withColumn("__w", F.floor(F.sqrt(F.col("__n"))))
    )
    tot = cnt.agg(F.sum("__w").alias("__tw")).withColumn(
        "__k", F.pmod(F.col("__tw"), F.lit(1)).cast("int")
    )
    sized = (
        cnt.withColumn("__k", F.pmod(F.col("__w"), F.lit(1)).cast("int"))
        .join(F.broadcast(tot), "__k")
        .withColumn(
            "__p",
            F.greatest(F.expr(f"__w * {_PPM} DIV __tw"), F.lit(1)),
        )
        .withColumn("__cap", F.expr(f"__n * {_PPM} DIV __p"))
    )
    s = sized.agg(F.min("__cap").alias("__s")).withColumn(
        "__k", F.pmod(F.col("__s"), F.lit(1)).cast("int")
    )
    keep = (
        sized.join(F.broadcast(s), "__k")
        .withColumn("__keep", F.expr(f"__p * __s DIV {_PPM}"))
        .select(category_col, "__n", "__keep")
    )
    bucket = (
        composite_hash_col(f"concat('{salt}', CAST({key_col} AS STRING))")
        % BUCKETS
    )
    cols = df.columns
    return (
        df.join(F.broadcast(keep), category_col)
        .filter(bucket * F.col("__n") < F.col("__keep") * BUCKETS)
        .select(*cols)
    )


def temperature_oracle_sql(
    category_col: str,
    key_col: str,
    salt: str = "temp-v1",
    table: str = "documents",
    select_cols: str | None = None,
) -> str:
    """DuckDB twin of :func:`temperature_rebalance` — derives the
    identical integer recipe from the data (floor-div via ``//``,
    never a rounding decimal cast)."""
    _check_safe(salt, key_col)
    select_cols = select_cols or f"{key_col}, {category_col}"
    keyed = f"('{salt}' || CAST({key_col} AS VARCHAR))"
    bucket = f"(({composite_hash_sql(keyed)}) % {BUCKETS})"
    return f"""
    WITH cnt AS (
        SELECT {category_col} AS __c, COUNT(*) AS __n,
               CAST(FLOOR(SQRT(COUNT(*))) AS BIGINT) AS __w
        FROM {table} GROUP BY 1
    ), tot AS (SELECT SUM(__w) AS __tw FROM cnt),
    sized AS (
        SELECT __c, __n,
               GREATEST(__w * {_PPM} // __tw, 1) AS __p
        FROM cnt, tot
    ), s AS (
        SELECT MIN(__n * {_PPM} // __p) AS __s FROM sized
    ), keep AS (
        SELECT __c, __n, __p * __s // {_PPM} AS __keep FROM sized, s
    )
    SELECT {select_cols}
    FROM {table} t JOIN keep ON t.{category_col} = keep.__c
    WHERE {bucket} * __n < __keep * {BUCKETS}
    """


def budget_select(
    df: DataFrame,
    score_col,
    tokens_col,
    budget: int,
    n_buckets: int = 1000,
) -> DataFrame:
    """Token-budget corpus selection: keep the highest-quality slice
    of the corpus whose total token count fits ``budget``, at
    score-BUCKET granularity (the largest prefix of score buckets,
    best first, whose cumulative tokens stay ≤ budget).

    Bucket granularity is the honest 100 TB semantics: exact greedy
    per-document knapsack is inherently sequential over the whole
    corpus, while the bucket rollup is one hash agg to ≤ n_buckets
    rows, a model-sized driver fold to pick the threshold bucket
    (same contract as the k-means centroid collect), and a narrow
    filter broadcast back as a literal. No global window, no sort.
    A boundary bucket that would overflow the budget is excluded
    whole — the result NEVER exceeds budget.

    Returns the kept rows with ``__bucket`` added (callers audit
    with it; drop it if not wanted)."""
    sc = F.col(score_col) if isinstance(score_col, str) else score_col
    tk = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    bkt = F.least(
        F.greatest(F.floor(sc * n_buckets).cast("int"), F.lit(0)),
        F.lit(n_buckets - 1),
    )
    rollup = (
        df.select(bkt.alias("__bucket"), tk.alias("__t"))
        .groupBy("__bucket")
        .agg(F.sum("__t").alias("__t"))
        .collect()
    )
    cum, keep_min = 0, None
    for r in sorted(rollup, key=lambda r: -r["__bucket"]):
        if cum + r["__t"] > budget:
            break
        cum += r["__t"]
        keep_min = r["__bucket"]
    out = df.withColumn("__bucket", bkt)
    if keep_min is None:
        return out.filter(F.lit(False))
    return out.filter(F.col("__bucket") >= F.lit(keep_min))


def cap_per_category(
    df: DataFrame,
    category_col: str,
    key_col: str,
    cap: int,
    salt: str = "cap-v1",
    strategy: str = "hash",
) -> DataFrame:
    """Frequency capping: keep at most ~``cap`` rows per category —
    the per-domain document cap of web-corpus curation (no single
    domain may dominate the training mixture). keep_c =
    min(n_c, cap); small categories pass through whole.

    ``hash`` (100 TB default): the salted-bucket narrow predicate
    (expectation-exact, ±binomial noise) — one count agg, one
    |categories|-row broadcast, ZERO sort/window, immune to the hot
    domain being arbitrarily large. ``exact``: per-category
    (hash, key) ranking window — exact counts, pays a sort
    partitioned BY CATEGORY (the hot-domain partition is the skew
    risk; prefer hash at scale). Both append-stable: a row's keep
    decision never changes when other rows arrive, unless its
    category crosses the cap (then the hash path thins
    proportionally)."""
    if not isinstance(cap, int) or cap <= 0:
        raise ValueError(f"cap must be a positive int, got {cap!r}")
    _check_safe(salt, key_col)
    _check_safe("x", category_col)
    if strategy not in ("hash", "exact"):
        raise ValueError(f"strategy must be hash|exact, got {strategy!r}")
    keep = (
        df.groupBy(category_col)
        .agg(F.count(F.lit(1)).alias("__n"))
        .withColumn("__keep", F.least(F.col("__n"), F.lit(cap)))
    )
    bucket = (
        composite_hash_col(f"concat('{salt}', CAST({key_col} AS STRING))")
        % BUCKETS
    )
    cols = df.columns
    joined = df.join(F.broadcast(keep), category_col)
    if strategy == "hash":
        out = joined.filter(
            bucket * F.col("__n") < F.col("__keep") * BUCKETS
        )
    else:
        # staged projection — same rationale as rebalance_mixture's
        # exact branch above
        w = Window.partitionBy(category_col).orderBy("__b", key_col)
        out = (
            joined.withColumn("__b", bucket)
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= F.col("__keep"))
        )
    return out.select(*cols)


def cap_oracle_sql(
    category_col: str,
    key_col: str,
    cap: int,
    salt: str = "cap-v1",
    strategy: str = "hash",
    table: str = "documents",
    select_cols: str | None = None,
) -> str:
    """DuckDB twin of :func:`cap_per_category`."""
    _check_safe(salt, key_col)
    select_cols = select_cols or f"{key_col}, {category_col}"
    keyed = f"('{salt}' || CAST({key_col} AS VARCHAR))"
    bucket = f"(({composite_hash_sql(keyed)}) % {BUCKETS})"
    base = f"""
    keep AS (
        SELECT {category_col} AS __c, COUNT(*) AS __n,
               LEAST(COUNT(*), {cap}) AS __keep
        FROM {table} GROUP BY 1
    )"""
    if strategy == "hash":
        return f"""
    WITH {base}
    SELECT {select_cols}
    FROM {table} t JOIN keep ON t.{category_col} = keep.__c
    WHERE {bucket} * __n < __keep * {BUCKETS}
    """
    return f"""
    WITH {base}
    SELECT {select_cols}
    FROM (
        SELECT t.*, keep.__keep,
               ROW_NUMBER() OVER (
                   PARTITION BY t.{category_col}
                   ORDER BY {bucket}, t.{key_col}
               ) AS __rn
        FROM {table} t JOIN keep ON t.{category_col} = keep.__c
    )
    WHERE __rn <= __keep
    """


def curriculum_stages(
    df: DataFrame,
    score_col,
    n_stages: int = 4,
    out: str = "stage",
) -> DataFrame:
    """Curriculum staging: bucket documents into ``n_stages``
    difficulty/quality stages at the score's own quantile cuts
    (stage 0 = bottom quantile … n-1 = top) — the ordering signal a
    curriculum-learning dataloader consumes, assigned without any
    global sort. One exact-percentile aggregate produces the n-1
    cut points (model-sized driver state, broadcast back as
    literals, 6 dp-rounded — the cross-engine determinism contract
    of price_quantiles_by_priority); stage = how many cuts lie
    strictly below the score, a narrow array expression.
    exact ``percentile`` is the oracle path; swap
    ``approx_percentile`` in at 100 TB for one cheap pass (same
    plan shape, documented like the NDV twin)."""
    if n_stages < 2:
        raise ValueError("n_stages must be >= 2")
    sc = F.col(score_col) if isinstance(score_col, str) else score_col
    qs = [i / n_stages for i in range(1, n_stages)]
    row = df.select(
        F.percentile(sc, F.array(*[F.lit(q) for q in qs])).alias("__t")
    ).collect()[0]
    cuts = [round(float(t), 6) for t in row["__t"]]
    arr = F.array(*[F.lit(c) for c in cuts])
    return df.withColumn(
        out,
        F.size(F.filter(arr, lambda t: sc > t)).cast("int"),
    )


def upsample_mixture(
    df: DataFrame,
    category_col: str,
    key_col: str,
    epochs: dict[str, float],
    salt: str = "epoch-v1",
) -> DataFrame:
    """Epoch-aware UPSAMPLING — the complement of
    :func:`rebalance_mixture`: repeat scarce high-value categories a
    fractional number of epochs (the pretraining-mixture move of
    running Wikipedia-class sources 2-4 epochs while web text runs
    one). A category with epochs ``e`` replicates every row
    ``floor(e)`` times, plus one more copy for the deterministic
    ``frac(e)`` fraction of keys (salted portable-hash buckets — the
    same append-stable contract as rebalance/splits). Categories NOT
    in ``epochs`` pass through at one epoch (a NULL category never
    equals any recipe key, so NULL rows pass through too); ``e = 0``
    drops the category.

    Output: the original columns plus ``epoch`` (1..copies), so each
    replica is distinguishable downstream (sequence packing and
    shuffle-shard keys need distinct rows, not multiplicity).

    Fractions are snapped to BUCKETS-ths (integer arithmetic end to
    end — both engines agree bit-for-bit; BUCKETS = 1e6, far finer
    than any recipe). Scale shape: one chained-CASE projection (the
    |categories|-size recipe is an EXPRESSION, nothing joins), one
    guarded ``sequence`` explode — zero shuffles, and the output
    size is Σ n_c·e_c by construction, never data-squared.
    """
    _check_safe(salt, key_col)
    _check_safe("x", category_col)
    if not epochs:
        raise ValueError("epochs must be non-empty")
    plan: dict[str, tuple[int, int]] = {}
    for cat, e in epochs.items():
        if not _SAFE_CATEGORY.fullmatch(cat):
            raise ValueError(
                f"category value must match {_SAFE_CATEGORY.pattern!r}, "
                f"got {cat!r} (values are interpolated into SQL)"
            )
        if not isinstance(e, (int, float)) or e < 0 or e != e or e > 1000:
            raise ValueError(
                f"epochs must be floats in [0, 1000], got {cat}={e!r}"
            )
        whole = int(e)
        plan[cat] = (whole, round((e - whole) * BUCKETS))

    whole_expr = F.lit(1)
    frac_expr = F.lit(0)
    for cat, (whole, fb) in plan.items():
        cond = F.col(category_col) == cat
        whole_expr = F.when(cond, F.lit(whole)).otherwise(whole_expr)
        frac_expr = F.when(cond, F.lit(fb)).otherwise(frac_expr)
    bucket = (
        composite_hash_col(f"concat('{salt}', CAST({key_col} AS STRING))")
        % BUCKETS
    )
    copies = (whole_expr + (bucket < frac_expr).cast("int")).alias(
        "__copies"
    )
    staged = df.select("*", copies)
    # sequence(a, b) steps DOWNWARD when a > b (the shingles_of
    # guard) — an explicit empty array drops zero-copy rows instead
    # of fabricating epoch 0 and -1.
    seq = F.when(
        F.col("__copies") >= 1,
        F.sequence(F.lit(1), F.col("__copies")),
    ).otherwise(F.array().cast("array<int>"))
    return staged.select(
        *df.columns, F.explode(seq).alias("epoch")
    )


def upsample_oracle_sql(
    category_sql: str,
    key_sql: str,
    epochs: dict[str, float],
    salt: str = "epoch-v1",
) -> str:
    """DuckDB fragment computing the identical copy count; compose as
    ``..., unnest(range(1, ({fragment}) + 1)) r(epoch)``."""
    _check_safe(salt)
    plan = {
        cat: (int(e), round((e - int(e)) * BUCKETS))
        for cat, e in epochs.items()
    }
    keyed = f"('{salt}' || CAST({key_sql} AS VARCHAR))"
    bucket = f"(({composite_hash_sql(keyed)}) % {BUCKETS})"
    whole = " ".join(
        f"WHEN {category_sql} = '{c}' THEN {w}" for c, (w, _) in plan.items()
    )
    frac = " ".join(
        f"WHEN {category_sql} = '{c}' THEN {fb}" for c, (_, fb) in plan.items()
    )
    return (
        f"(CASE {whole} ELSE 1 END"
        f" + CASE WHEN {bucket} < (CASE {frac} ELSE 0 END)"
        f" THEN 1 ELSE 0 END)"
    )
