"""Record-linkage / entity-resolution queries
(operators/linkage.py): blocking → declarative comparison →
transitive closure → golden records, all oracle-checked (DuckDB's
``levenshtein`` computes the identical classic edit distance, and
the components step reuses the recursive-CTE oracle scheme of
queries/dedup_q.py).

Fixture semantics: parts sharing (p_name, p_brand) with a small
type edit distance and a small size gap are treated as the same
catalog entity listed with minor variations — the master-data
consolidation shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from top_produce_etl_spark.io.sources import load_table
from top_produce_etl_spark.queries import query

_MATCH_PRED = (
    "levenshtein(a_p_type, b_p_type) <= 5"
    " AND abs(a_p_size - b_p_size) <= 3"
)

_PAIRS_SQL = """
    SELECT a.p_partkey AS a_id, b.p_partkey AS b_id,
           a.p_type AS a_type, b.p_type AS b_type,
           levenshtein(a.p_type, b.p_type) AS type_dist,
           abs(a.p_size - b.p_size) AS size_gap
    FROM part a JOIN part b
      ON a.p_name = b.p_name AND a.p_brand = b.p_brand
    WHERE a.p_partkey < b.p_partkey
      AND levenshtein(a.p_type, b.p_type) <= 5
      AND abs(a.p_size - b.p_size) <= 3
"""


@query("entity_pairs_parts", extended=True, oracle=_PAIRS_SQL)
def entity_pairs_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linkage stage 1+2 (operators/linkage.py::blocked_pairs):
    exact blocking on (p_name, p_brand) — an equi-join, never
    all-pairs — then the declarative attribute comparison as a
    codegen'd filter (levenshtein intrinsic + numeric tolerance)."""
    from top_produce_etl_spark.operators.linkage import blocked_pairs

    part = load_table(spark, sf_dir, "part")
    pairs = blocked_pairs(
        part,
        "p_partkey",
        ["p_name", "p_brand"],
        _MATCH_PRED,
        attrs=["p_type", "p_size"],
    )
    return pairs.select(
        "a_id",
        "b_id",
        F.col("a_p_type").alias("a_type"),
        F.col("b_p_type").alias("b_type"),
        F.levenshtein("a_p_type", "b_p_type").alias("type_dist"),
        F.abs(F.col("a_p_size") - F.col("b_p_size")).alias("size_gap"),
    )


@query(
    "entity_golden_parts",
    extended=True,
    oracle=f"""
    WITH RECURSIVE pairs AS ({_PAIRS_SQL}),
    edges AS (
        SELECT a_id AS s, b_id AS t FROM pairs
        UNION ALL
        SELECT b_id AS s, a_id AS t FROM pairs
    ),
    cc AS (
        SELECT s AS id, s AS label FROM edges
        UNION
        SELECT e.s AS id, cc.label FROM edges e JOIN cc ON cc.id = e.t
    ),
    comp AS (SELECT id, MIN(label) AS rep_id FROM cc GROUP BY id),
    assign AS (
        SELECT p.p_partkey AS id,
               COALESCE(c.rep_id, p.p_partkey) AS entity_id
        FROM part p LEFT JOIN comp c ON c.id = p.p_partkey
    )
    SELECT a.entity_id,
           COUNT(*) AS n_records,
           MIN(p.p_name) AS p_name,
           MIN(p.p_brand) AS p_brand,
           MAX(p.p_retailprice) AS best_price,
           MIN(p.p_size) AS min_size
    FROM part p JOIN assign a ON p.p_partkey = a.id
    GROUP BY a.entity_id
    """,
)
def entity_golden_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full linkage pipeline end-to-end
    (operators/linkage.py::resolve_entities + golden_records):
    matched pairs → connected components → one merged GOLDEN row per
    entity under declared survivorship aggregates (max price, min
    size; name/brand are block keys, constant per entity). Oracle:
    the recursive-CTE transitive closure over the identical pair
    SQL."""
    from top_produce_etl_spark.operators.linkage import (
        golden_records,
        resolve_entities,
    )

    part = load_table(spark, sf_dir, "part")
    assign = resolve_entities(
        part,
        "p_partkey",
        ["p_name", "p_brand"],
        _MATCH_PRED,
        attrs=["p_type", "p_size"],
    )
    return golden_records(
        part,
        assign,
        "p_partkey",
        {
            "n_records": "count(*)",
            "p_name": "min(p_name)",
            "p_brand": "min(p_brand)",
            "best_price": "max(p_retailprice)",
            "min_size": "min(p_size)",
        },
    )


@query(
    "entity_block_stats",
    extended=True,
    oracle="""
    SELECT p_name, p_brand, n_rows,
           CAST(n_rows * (n_rows - 1) / 2 AS BIGINT) AS n_pairs
    FROM (
        SELECT p_name, p_brand, COUNT(*) AS n_rows
        FROM part GROUP BY 1, 2
    )
    ORDER BY n_rows DESC, p_name, p_brand LIMIT 20
    """,
)
def entity_block_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The blocking pre-flight (operators/linkage.py::block_stats):
    the 20 largest (p_name, p_brand) blocks with row and candidate-
    pair counts — the report that catches a degenerate block key
    before the self-join goes quadratic inside it. Total order
    (count desc, then key) so the LIMIT boundary is deterministic
    cross-engine."""
    from top_produce_etl_spark.operators.linkage import block_stats

    part = load_table(spark, sf_dir, "part")
    return block_stats(part, ["p_name", "p_brand"], top=20)
