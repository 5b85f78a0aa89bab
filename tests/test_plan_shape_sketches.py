"""Physical-plan shape for the round-5 sketch/curation operators:
the fixed-size model relations (CMS cells, DSIR λ) must BROADCAST —
the data side never shuffles for them; KMV's per-group rank filter
must compile to WindowGroupLimit (bounded state) and its global
variant to TakeOrderedAndProject (no full sort)."""

from __future__ import annotations

from top_produce_etl_spark.queries import get_all_queries
from tests.test_plan_shape import plan


def test_cms_estimate_broadcasts_sketch(spark, sf_dir):
    p = plan(
        get_all_queries()["countmin_user_event_counts"](spark, sf_dir)
    )
    assert "BroadcastHashJoin" in p, p
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_dsir_lambda_model_broadcasts(spark, sf_dir):
    """The B-row λ relation rides a broadcast join into the scoring
    pass — the (doc, bucket) side shuffles once for the per-doc sum
    and never for the model."""
    p = plan(get_all_queries()["dsir_selection_fast"](spark, sf_dir))
    assert "BroadcastHashJoin" in p, p
    assert "CartesianProduct" not in p
    # top-100 selection must not materialize a global sort
    assert "TakeOrderedAndProject" in p, p


def test_kmv_grouped_sketch_uses_window_group_limit(spark, sf_dir):
    """The per-group k-smallest filter must run as WindowGroupLimit
    (bounded per-partition top-k state), not an unbounded rank over
    fully sorted groups."""
    p = plan(get_all_queries()["kmv_userdays_fast"](spark, sf_dir))
    assert "WindowGroupLimit" in p, p


def test_kmv_global_sketch_is_take_ordered(spark, sf_dir):
    """The ungrouped sketch compiles to TakeOrderedAndProject — a
    global row_number window here would serialize the distinct-hash
    stream through one partition."""
    from top_produce_etl_spark.operators.kmv import kmv_sketch

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    sk = kmv_sketch(ev, [], "CAST(user_id AS STRING)", hasher="xxhash64")
    p = plan(sk)
    assert "TakeOrderedAndProject" in p, p
    assert "Window" not in p, p


def test_pq_encode_is_map_side_only(spark, sf_dir):
    """Encoding the corpus to PQ codes must be a pure map stage —
    the model joins as a broadcast, the codes are narrow argmin
    expressions, and NO shuffle Exchange appears (the property that
    makes 'encode and store 100 TB' a single pass)."""
    from top_produce_etl_spark.operators.pq import pq_encode, pq_train

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    books = pq_train(emb, "vec_id", "embedding", dim=64)
    p = plan(pq_encode(emb, "vec_id", "embedding", books))
    assert "BroadcastHashJoin" in p, p
    # broadcast exchange is fine; a shuffle exchange is not
    assert "Exchange hashpartitioning" not in p, p
