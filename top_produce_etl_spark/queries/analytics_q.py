"""Analytics + scale-surface queries (round 4, extended tier):
runtime bloom-filter join pruning, cohort retention, exact heavy
hitters with sketch-bounded shuffles, per-group outlier detection,
and int8-quantized ANN. Every query here is oracle-checked — the
approximation in the sketch/quantized paths is confined to stages
whose output is then made exact (verify pass) or is itself
deterministic (quantization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from top_produce_etl_spark.functions.numeric import revenue_expr
from top_produce_etl_spark.io.sources import load_table
from top_produce_etl_spark.operators.joins import maybe_broadcast
from top_produce_etl_spark.queries import query
from top_produce_etl_spark.queries.relational import REV_DEC


@query(
    "runtime_pruned_revenue", extended=True,
    oracle=f"""
    SELECT l_returnflag,
           CAST(SUM({REV_DEC}) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_orderkey IN (
        SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
    )
    GROUP BY l_returnflag
    """,
)
def runtime_pruned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selective semi-join then aggregate — the shape Catalyst's
    runtime bloom filter accelerates at scale (a ``might_contain``
    predicate lands on the lineitem scan so non-urgent rows die
    before the exchange; operators/runtime_filter.py, injection
    plan-tested in tests/test_plan_shape.py). Results are exact at
    any conf: the bloom filter is plan-level only."""
    from top_produce_etl_spark.operators.runtime_filter import pruned_semi_join

    lineitem = load_table(spark, sf_dir, "lineitem")
    urgent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        pruned_semi_join(lineitem, urgent, "l_orderkey", "o_orderkey")
        .groupBy("l_returnflag")
        .agg(
            F.sum(revenue_expr()).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "cohort_retention_weekly", extended=True,
    oracle="""
    WITH first AS (
        -- DuckDB's date_trunc('week') yields DATE; Spark's yields
        -- TIMESTAMP — cast so the hashed values agree.
        SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS TIMESTAMP)
                   AS cohort_week
        FROM events GROUP BY user_id
    ), active AS (
        SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events
    ), matrix AS (
        SELECT cohort_week,
               CAST(date_diff('day', CAST(cohort_week AS DATE),
                              CAST(wk AS DATE)) / 7 AS INT) AS week_offset,
               COUNT(DISTINCT user_id) AS n_active
        FROM active JOIN first USING (user_id)
        GROUP BY 1, 2
    )
    SELECT cohort_week, week_offset, n_active,
           CAST(n_active AS DOUBLE) /
           CAST(MAX(CASE WHEN week_offset = 0 THEN n_active END)
                    OVER (PARTITION BY cohort_week) AS DOUBLE) AS retention
    FROM matrix
    """,
)
def cohort_retention_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix over events
    (operators/eventtime.py::cohort_retention): users bucketed by
    first-activity week, tracked across week offsets. Two key
    shuffles total; the offset-0 denominator comes from a window
    over the |cohorts × weeks| matrix, never a raw re-scan."""
    from top_produce_etl_spark.operators.eventtime import cohort_retention

    events = load_table(spark, sf_dir, "events")
    return cohort_retention(events, "user_id", "ts")


# Threshold fraction for the heavy-hitter query: just above the mean
# bigram frequency on the near-uniform fixture (≈1/920), so the
# result is the genuinely-frequent tail at every scale factor.
_HH_PHI = 0.00115


@query(
    "frequent_bigrams", extended=True,
    oracle=f"""
    WITH toks AS (
        SELECT string_split(text, ' ') AS t FROM documents
    ), grams AS (
        SELECT array_to_string(t[i:i+1], ' ') AS item
        FROM toks, unnest(range(1, len(t))) r(i)
    ), tot AS (SELECT COUNT(*) AS n FROM grams)
    SELECT item, COUNT(*) AS cnt
    FROM grams, tot
    GROUP BY item, tot.n
    HAVING COUNT(*) >= CAST(ceil(n * {_HH_PHI}) AS BIGINT)
    """,
)
def frequent_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy hitters (count ≥ φ·N) over the corpus bigram
    stream via Misra-Gries summaries + exact verification
    (operators/heavy.py). The verify pass makes the output exact —
    hence this oracle — while the sketch bounds the count shuffle to
    candidate tokens at scale. Bigrams (not unigrams) because the
    fixture vocabulary is only 31 words; the bigram space is ~930."""
    from top_produce_etl_spark.operators.heavy import frequent_items_exact

    docs = load_table(spark, sf_dir, "documents")
    grams = (
        docs.select(F.split("text", " ").alias("t"))
        .filter(F.size("t") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(t) - 1),"
                    " i -> concat_ws(' ', t[i-1], t[i]))"
                )
            ).alias("item")
        )
    )
    return frequent_items_exact(grams, "item", phi=_HH_PHI, capacity=1024)


@query(
    "segment_price_outliers", extended=True,
    oracle="""
    WITH j AS (
        SELECT o.o_orderkey, c.c_mktsegment, o.o_totalprice
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ), stats AS (
        SELECT c_mktsegment,
               COUNT(*) AS n,
               -- DECIMAL(12,2): wide enough for the price domain,
               -- narrow enough that its square stays inside
               -- DuckDB's int128 decimal multiply (18,4 overflows)
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS s,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)) *
                        CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sq,
               quantile_cont(o_totalprice, 0.25) AS q1,
               quantile_cont(o_totalprice, 0.75) AS q3
        FROM j GROUP BY c_mktsegment
    ), fence AS (
        SELECT c_mktsegment,
               -- k=0.25 (not the classic 1.5): o_totalprice is
               -- near-uniform, so the 1.5 fence (≈ q3 + 0.75·range)
               -- provably exceeds the max and flags nothing at any
               -- SF; 0.25 exercises the fence on the top tail
               q3 + 0.25 * (q3 - q1) AS fence_hi,
               s / n AS mean,
               sqrt((sq - s * s / n) / (n - 1)) AS sd
        FROM stats
    )
    SELECT j.o_orderkey, j.c_mktsegment, j.o_totalprice,
           round((j.o_totalprice - f.mean) / f.sd, 6) AS zscore6,
           round(f.fence_hi, 6) AS fence_hi6
    FROM j JOIN fence f USING (c_mktsegment)
    WHERE j.o_totalprice > f.fence_hi
    """,
)
def segment_price_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment Tukey-fence outliers with z-scores
    (operators/anomaly.py): one stats pass (decimal-exact moments +
    exact percentiles), |segments|-sized stats broadcast back — the
    orders side never shuffles for the annotation."""
    from top_produce_etl_spark.operators.anomaly import iqr_outlier_rows

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    j = orders.join(
        maybe_broadcast(customer.select("c_custkey", "c_mktsegment")),
        orders.o_custkey == F.col("c_custkey"),
    )
    return iqr_outlier_rows(
        j,
        group_cols=["c_mktsegment"],
        value_col="o_totalprice",
        keep_cols=["o_orderkey", "c_mktsegment", "o_totalprice"],
        fence_k=0.25,  # see oracle comment: uniform data never
        # crosses the classic 1.5 fence, so that setting would
        # "pass" vacuously with 0 rows at every SF
    )


@query(
    "cosine_topk_quantized", extended=True,
    oracle="""
    WITH sc AS (
        SELECT vec_id,
               127.0 / greatest(
                   list_max(list_transform(embedding,
                                           x -> abs(CAST(x AS DOUBLE)))),
                   1e-12) AS s
        FROM embeddings
    ), ex AS (
        SELECT e.vec_id, r.i,
               CAST(round(CAST(e.embedding[r.i] AS DOUBLE) * sc.s)
                    AS BIGINT) AS qv
        FROM embeddings e JOIN sc USING (vec_id),
             unnest(range(1, 65)) r(i)
    ), norms AS (
        SELECT vec_id, sqrt(CAST(SUM(qv * qv) AS DOUBLE)) AS nrm
        FROM ex GROUP BY vec_id
    ), dots AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               SUM(q.qv * c.qv) AS dot
        FROM ex q JOIN ex c ON q.i = c.i
        WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id
        GROUP BY 1, 2
    )
    SELECT query_id, neighbor_id, qcosine, "rank"
    FROM (
        SELECT d.query_id, d.neighbor_id,
               CAST(d.dot AS DOUBLE) / (nq.nrm * nc.nrm) AS qcosine,
               ROW_NUMBER() OVER (
                   PARTITION BY d.query_id
                   ORDER BY CAST(d.dot AS DOUBLE) / (nq.nrm * nc.nrm) DESC,
                            d.neighbor_id ASC
               ) AS "rank"
        FROM dots d
        JOIN norms nq ON d.query_id = nq.vec_id
        JOIN norms nc ON d.neighbor_id = nc.vec_id
    )
    WHERE "rank" <= 3
    """,
)
def cosine_topk_quantized_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 cosine on int8-quantized embeddings
    (operators/similarity.py::cosine_topk_quantized) for the same
    probe set as the float baseline. 4× smaller vectors at scale;
    quantization is deterministic (unlike float fast paths) so the
    WHOLE pipeline is oracle-checked — recall vs the exact float
    result is separately pinned in tests."""
    from top_produce_etl_spark.operators.similarity import (
        cosine_topk_quantized,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return cosine_topk_quantized(emb, queries, "vec_id", "embedding", k=3)
