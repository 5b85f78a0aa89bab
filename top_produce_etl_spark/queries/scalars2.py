"""Second scalar/array/map pack (SURVEY.md §2.8): fuzzy string
matching, higher-order array ops over embeddings, map extraction
from JSON, exact percentiles."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from top_produce_etl_spark.io.sources import load_table
from top_produce_etl_spark.queries import query


@query(
    "fuzzy_part_match",
    oracle="""
    SELECT p_partkey, p_name,
           levenshtein(p_name, 'red gear') AS edit_dist
    FROM part
    WHERE levenshtein(p_name, 'red gear') <= 4
    """,
)
def fuzzy_part_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance fuzzy matching with length-band blocking: an
    edit distance ≤ d implies |len(a) - len(b)| ≤ d, so the cheap
    ``length`` predicate runs first — it pushes into the parquet
    scan (plan-tested) and the O(n·m) levenshtein only evaluates on
    the surviving band. Results are provably identical to the
    unfiltered query, so the oracle needs no band."""
    part = load_table(spark, sf_dir, "part")
    target, max_d = "red gear", 4
    band = F.abs(F.length("p_name") - F.lit(len(target))) <= max_d
    dist = F.levenshtein(F.col("p_name"), F.lit(target))
    return (
        part.filter(band)
        .withColumn("edit_dist", dist)
        .filter(F.col("edit_dist") <= max_d)
        .select("p_partkey", "p_name", "edit_dist")
    )


@query(
    "array_ops_embeddings",
    oracle="""
    SELECT vec_id,
           len(embedding)                          AS dim,
           CAST(embedding[1] AS DOUBLE)            AS first_val,
           CAST(list_max(embedding) AS DOUBLE)     AS max_val,
           CAST(list_min(embedding) AS DOUBLE)     AS min_val,
           len(list_filter(embedding, x -> x > 0)) AS n_positive
    FROM embeddings
    """,
)
def array_ops_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions over the embedding column —
    size/element_at/array_max/filter, all JVM-side."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.element_at("embedding", 1).cast("double").alias("first_val"),
        F.array_max("embedding").cast("double").alias("max_val"),
        F.array_min("embedding").cast("double").alias("min_val"),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_positive"),
    )


@query(
    "map_pack_events", extended=True,
    oracle="""
    SELECT event_id,
           array_to_string(list_sort(json_keys(props)), ',') AS prop_keys_csv,
           array_to_string(
               list_transform(list_sort(json_keys(props)),
                   k -> CAST(CAST(json_extract(props, '$.' || k) AS INT)
                             AS VARCHAR)),
               ',') AS prop_values_csv
    FROM events
    """,
)
def map_pack_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON → typed map → keys/values (map functions, §2.8). Keys
    and values are emitted as SORTED comma-joins: raw array columns
    crashed the round-1 driver canonicalizer (unhashable lists), so
    list-shaped final projections are always stringified."""
    events = load_table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,int>")
    keys_sorted = F.array_sort(F.map_keys(m))
    return events.select(
        "event_id",
        F.array_join(keys_sorted, ",").alias("prop_keys_csv"),
        F.array_join(
            F.transform(keys_sorted, lambda k: F.element_at(m, k).cast("string")),
            ",",
        ).alias("prop_values_csv"),
    )


@query(
    "brand_price_median", extended=True,
    oracle="""
    SELECT p_brand,
           quantile_cont(p_retailprice, 0.5) AS median_price,
           COUNT(*) AS n_parts
    FROM part
    GROUP BY p_brand
    """,
)
def brand_price_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT median (linear-interpolated percentile — both engines
    implement the same lower+(upper-lower)·frac formula over sorted
    doubles). The approx sketch variant (percentile_approx) is what
    you'd run at 100 TB; its engine-specific values are covered by
    a relative-error unit test instead."""
    part = load_table(spark, sf_dir, "part")
    return part.groupBy("p_brand").agg(
        F.expr("percentile(p_retailprice, 0.5)").alias("median_price"),
        F.count(F.lit(1)).alias("n_parts"),
    )


@query(
    "ansi_try_pack", extended=True,
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_linenumber % 3 = 0 THEN NULL
                ELSE l_quantity / CAST(l_linenumber % 3 AS DOUBLE)
           END AS safe_div,
           TRY_CAST(l_returnflag AS INT) AS cast_miss,
           string_split(l_returnflag || ' ' || l_linestatus, ' ')[l_linenumber]
               AS maybe_tok
    FROM lineitem
    WHERE l_orderkey % 100 = 0
    """,
)
def ansi_try_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-mode error-safe scalar surface: Spark 4 runs with
    ``spark.sql.ansi.enabled=true`` (division by zero / bad casts /
    overflow RAISE instead of silently corrupting — the correct
    default for a pipeline engine), and the ``try_*`` family is the
    per-expression escape hatch that degrades to NULL where the
    author expects dirty data:

    - ``try_divide`` → NULL on zero divisor (vs ANSI raise);
    - ``try_cast`` → NULL on unparseable strings;
    - ``try_element_at`` → NULL beyond array bounds (1-based).

    The oracle encodes the same semantics with explicit guards —
    which is exactly the boilerplate ``try_*`` replaces."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    toks = F.split(
        F.concat_ws(" ", F.col("l_returnflag"), F.col("l_linestatus")), " "
    )
    return lineitem.filter(F.col("l_orderkey") % 100 == 0).select(
        "l_orderkey",
        "l_linenumber",
        F.try_divide(
            F.col("l_quantity"), (F.col("l_linenumber") % 3).cast("double")
        ).alias("safe_div"),
        F.col("l_returnflag").try_cast("int").alias("cast_miss"),
        F.try_element_at(toks, F.col("l_linenumber").cast("int")).alias(
            "maybe_tok"
        ),
    )


@query(
    "collation_group_pack", extended=True,
    oracle="""
    SELECT lower(p_type) AS type_ci, COUNT(*) AS n,
           COUNT(DISTINCT p_type) AS case_variants
    FROM part GROUP BY 1
    """,
)
def collation_group_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 COLLATIONS: grouping/equality under UTF8_LCASE
    compares case-insensitively WITHOUT rewriting every expression
    through lower() — the collation is a property of the comparison,
    so joins/aggregations/sorts all honor it and Catalyst still
    prunes and pushes down. DuckDB has no session collations here,
    so the oracle states the same semantics via lower(); the output
    key is normalized to lower for cross-engine comparability
    (collated GROUP BY keeps an arbitrary representative case)."""
    part = load_table(spark, sf_dir, "part")
    ci = F.collate(F.col("p_type"), "UTF8_LCASE")
    return (
        part.groupBy(ci.alias("__k"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct(F.collate(F.col("p_type"), "UTF8_BINARY")).alias(
                "case_variants"
            ),
        )
        .select(F.lower("__k").alias("type_ci"), "n", "case_variants")
    )


@query(
    "explode_outer_semantics", extended=True,
    oracle="""
    WITH src AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 3 = 0 THEN []
                    ELSE string_split(o_orderpriority, '-')
               END AS arr
        FROM orders WHERE o_orderkey % 50 = 0
    )
    SELECT 'inner' AS op, COUNT(*) AS n
    FROM (SELECT o_orderkey, unnest(arr) FROM src)
    UNION ALL
    SELECT 'outer', COUNT(*)
    FROM (
        SELECT o_orderkey,
               CASE WHEN len(arr) = 0 THEN [NULL] ELSE arr END AS arr2
        FROM src
    ) t, LATERAL (SELECT unnest(arr2)) u
    UNION ALL
    SELECT 'pos_max', COALESCE(MAX(p), -1)
    FROM (
        SELECT generate_subscripts(arr, 1) - 1 AS p
        FROM src WHERE len(arr) > 0
    )
    """,
)
def explode_outer_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-explosion semantics pack: ``explode`` DROPS rows with
    empty/NULL arrays (an inner lateral — the silent row-loss
    footgun when flattening optional nested data), ``explode_outer``
    keeps them with NULL elements, and ``posexplode`` carries the
    0-based ordinal. Counts + max ordinal, oracle-matched."""
    orders = load_table(spark, sf_dir, "orders")
    src = orders.filter(F.col("o_orderkey") % 50 == 0).select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % 3 == 0, F.array().cast("array<string>")
        )
        .otherwise(F.split("o_orderpriority", "-"))
        .alias("arr"),
    )

    def cnt(op, df):
        return df.agg(F.count(F.lit(1)).alias("n")).select(
            F.lit(op).alias("op"), "n"
        )

    inner = src.select("o_orderkey", F.explode("arr"))
    outer = src.select("o_orderkey", F.explode_outer("arr"))
    pos_max = (
        src.select(F.posexplode("arr").alias("p", "v"))
        .agg(F.coalesce(F.max("p"), F.lit(-1)).alias("n"))
        .select(F.lit("pos_max").alias("op"), F.col("n").cast("long"))
    )
    return cnt("inner", inner).unionByName(cnt("outer", outer)).unionByName(
        pos_max
    )
