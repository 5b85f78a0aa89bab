"""Record linkage / entity resolution (SURVEY.md §2.12 tier).

Near-dup text dedup (operators/dedup.py) matches DOCUMENTS by
content overlap; record linkage matches STRUCTURED ROWS that
describe the same real-world entity with attribute-level variation
— the classic master-data / catalog-consolidation problem. The
standard pipeline (Fellegi-Sunter shape, public literature):

  1. BLOCKING: only rows sharing a cheap exact key ever meet — the
     step that makes linkage sub-quadratic. One equi-join on the
     block key; block sizes are bounded by construction (a hot
     block is a data-quality bug — :func:`block_stats` is the
     pre-flight that surfaces it BEFORE the join runs, the
     orderkey_skew_report pattern).
  2. COMPARISON: a declarative match predicate over the candidate
     pair's attribute columns (edit distance, numeric tolerance,
     equality) — a codegen'd filter on the join output, no UDFs
     (``levenshtein`` is a JVM intrinsic, and DuckDB computes the
     identical classic edit distance, so the whole stage is
     oracle-checkable).
  3. RESOLUTION: matched pairs → transitive closure → entity ids —
     delegated verbatim to the verified
     :func:`~top_produce_etl_spark.operators.dedup.connected_components`.
  4. GOLDEN RECORD: one merged row per entity, attributes combined
     by declared SQL aggregates (max price, min size, count — the
     survivorship rules of MDM).

Scale shape: one blocked equi-join (never all-pairs), the
components loop's bounded iterations, one golden-record hash-agg.
No data-sized driver state anywhere.

Reference parity: the reference has no linkage surface
(/root/reference is a 98-LoC config scaffold); this extends the
north-star curation tier the way dedup/similarity do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def block_stats(
    df: DataFrame, block_cols: list[str], top: int = 20
) -> DataFrame:
    """Blocking pre-flight: the ``top`` largest blocks with their row
    and candidate-pair counts (n·(n−1)/2). Run BEFORE
    :func:`blocked_pairs` on a new dataset — a hot block makes the
    self-join quadratic within it, and the fix (a finer block key, or
    excluding the degenerate key value) is a data decision this
    report informs. One hash-agg + a bounded TakeOrdered."""
    return (
        df.groupBy(*block_cols)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .withColumn(
            "n_pairs", F.col("n_rows") * (F.col("n_rows") - 1) / 2
        )
        .withColumn("n_pairs", F.col("n_pairs").cast("bigint"))
        .orderBy(F.col("n_rows").desc(), *block_cols)
        .limit(top)
    )


def blocked_pairs(
    df: DataFrame,
    id_col: str,
    block_cols: list[str],
    match_pred: str,
    attrs: list[str] | None = None,
) -> DataFrame:
    """Candidate pairs under exact blocking + a declarative match
    predicate.

    Rows meet only when ALL ``block_cols`` are equal (nulls never
    block together — SQL equality semantics); each side's ``attrs``
    are exposed to ``match_pred`` as ``a_<col>`` / ``b_<col>``.
    Output: (a_id, b_id, a_attrs…, b_attrs…) with a_id < b_id.

    The self-join is an equi-join on the block key — Catalyst plans
    a hash join, never a cartesian (the plan audit's contract) — and
    the match predicate is a codegen'd filter on its output.
    """
    attrs = attrs or []
    left = df.select(
        F.col(id_col).alias("a_id"),
        *[F.col(c).alias(f"__bk_{c}") for c in block_cols],
        *[F.col(c).alias(f"a_{c}") for c in attrs],
    )
    right = df.select(
        F.col(id_col).alias("b_id"),
        *[F.col(c).alias(f"__bk_{c}") for c in block_cols],
        *[F.col(c).alias(f"b_{c}") for c in attrs],
    )
    return (
        left.join(right, [f"__bk_{c}" for c in block_cols])
        .where(F.col("a_id") < F.col("b_id"))
        .where(F.expr(match_pred))
        .drop(*[f"__bk_{c}" for c in block_cols])
    )


def resolve_entities(
    df: DataFrame,
    id_col: str,
    block_cols: list[str],
    match_pred: str,
    attrs: list[str] | None = None,
) -> DataFrame:
    """Blocking + comparison + transitive closure in one call:
    (id, entity_id) for EVERY input row — matched rows share their
    component's min-id label, unmatched rows are their own entity.
    """
    from top_produce_etl_spark.operators.dedup import connected_components

    pairs = blocked_pairs(df, id_col, block_cols, match_pred, attrs)
    comp = connected_components(pairs.select("a_id", "b_id"))
    return (
        df.select(F.col(id_col).alias("id"))
        .join(comp, "id", "left")
        .select(
            "id",
            F.coalesce(F.col("rep_id"), F.col("id")).alias("entity_id"),
        )
    )


def golden_records(
    df: DataFrame,
    assignments: DataFrame,
    id_col: str,
    agg_exprs: dict[str, str],
) -> DataFrame:
    """One merged row per resolved entity — the survivorship step.

    ``assignments`` is :func:`resolve_entities` output; ``agg_exprs``
    maps output column → SQL aggregate over the entity's rows (e.g.
    ``{"n_records": "count(*)", "best_price": "max(p_retailprice)"}``).
    Output: (entity_id, aggs…) — one hash-agg, map-side combinable.
    """
    # Alias the assignments side to reserved names BEFORE joining:
    # drop-by-name drops ALL columns with that name, so when
    # id_col == 'id' the old ``.drop('id')`` nuked the data side too,
    # and a pre-existing 'entity_id' column would silently collide
    # (ADVICE r6).
    if "__link_id" in df.columns or "__link_entity" in df.columns:
        raise ValueError(
            "golden_records: df already has a __link_id/__link_entity "
            "column (reserved)"
        )
    if "entity_id" in df.columns:
        raise ValueError(
            "golden_records: df already has an 'entity_id' column — "
            "rename it before survivorship (output grouping key)"
        )
    asg = assignments.select(
        F.col("id").alias("__link_id"),
        F.col("entity_id").alias("__link_entity"),
    )
    labeled = (
        df.join(asg, df[id_col] == asg["__link_id"])
        .drop("__link_id")
        .withColumnRenamed("__link_entity", "entity_id")
    )
    aggs = [F.expr(e).alias(name) for name, e in agg_exprs.items()]
    return labeled.groupBy("entity_id").agg(*aggs)
