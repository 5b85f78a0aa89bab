"""plan_audit / assert_scalable API over known plan shapes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from top_produce_etl_spark.plans.audit import assert_scalable, plan_audit
from top_produce_etl_spark.queries import get_all_queries, get_queries


def test_audit_flagship(spark, sf_dir):
    audit = plan_audit(get_all_queries()["flagship_top3_region"](spark, sf_dir))
    assert audit["broadcast_joins"] >= 4
    assert not audit["cartesian"]
    assert not audit["python_row_udf"]
    assert audit["partial_agg"]
    assert audit["aqe"]


def test_audit_detects_cartesian(spark):
    a = spark.range(10)
    b = spark.range(10).withColumnRenamed("id", "id2")
    with pytest.raises(AssertionError, match="cartesian"):
        assert_scalable(a.crossJoin(b))


def test_audit_detects_row_udf(spark):
    from pyspark.sql.types import LongType

    slow = F.udf(lambda x: x + 1, LongType())
    df = spark.range(10).select(slow("id").alias("y"))
    with pytest.raises(AssertionError, match="python_row_udf"):
        assert_scalable(df)
    # Arrow-batched pandas UDFs are the sanctioned path
    audit = plan_audit(df)
    assert audit["python_row_udf"] and not audit["arrow_udf"]


def test_audit_exchange_budget(spark, sf_dir):
    q1 = get_all_queries()["q1_pricing_summary"](spark, sf_dir)
    audit = assert_scalable(q1, max_exchanges=1)
    assert audit["exchanges"] == 1  # the single group-by shuffle
    with pytest.raises(AssertionError, match="exchanges"):
        assert_scalable(q1, max_exchanges=0)


def test_audit_arrow_udf_flagged(spark, sf_dir):
    df = get_all_queries()["sessionize_pandas_gap"](spark, sf_dir)
    audit = plan_audit(df)
    assert audit["arrow_udf"] and not audit["python_row_udf"]


def test_registry_wide_scale_audit(spark, sf_dir):
    """EVERY registered query must plan without cartesian products
    and without row-at-a-time Python UDFs — the two plan features
    that cannot survive a 100 TB scale-up. Exceptions are explicit
    and by design: the exact brute-force cosine baseline broadcasts
    a deliberate cross join (it exists as the small-scale oracle for
    the LSH/IVF scale paths), and the cross-join query demonstrates
    the operator itself."""
    allowed_cartesian = {
        "cosine_topk_bruteforce",  # deliberate broadcast cross: exact baseline
        "cosine_topk_fast",  # double-scoring twin of the same shape
        "cross_join_region_status",  # the cross-join demo itself (extended)
        "semi_anti_cross_pack",  # contains the cross-join branch
        "cosine_topk_numpy",  # same broadcast-queries shape as bruteforce
        "cosine_topk_quantized",  # broadcast-queries cross on int8 vectors
        "cosine_topk_adc",  # same shape — int8 corpus, float queries
        "pq_topk_embeddings",  # same shape — codeword-reconstructed
        # corpus (8-byte codes at rest), float queries
        "pq_topk_fast",  # double-kernel twin, same cross shape
        "semantic_contamination_check",  # broadcast TEST-benchmark
        # cross (the fixed-suite small side; split_decontamination
        # argument)
        "quantized_recall_report",  # composes bruteforce + quantized —
        # the cross is the SAME broadcast-small-queries attach those
        # two entries exempt; the evaluation itself is equi-join + agg
        "ann_rerank_exact",  # stage 1 IS pq_topk (the exempt
        # broadcast-queries cross above); the rerank stage itself is
        # broadcast-shortlist + id-keyed equi-joins
        "hybrid_rrf_retrieval",  # fuses the two exempt cosine rank
        # lists; the fusion itself is |Q|·k equi-joins + one window
        "hybrid_serve_pipeline",  # the YAML composition of the two
        # rows above (r9): stage 1 is the exempt PQ/quantized
        # broadcast-queries cross; fuse + rerank are |Q|·k equi-joins
        "mmr_diverse_topk",  # stage 1 IS the bruteforce baseline; the
        # greedy stages are equi-joins on |Q|·pool² relations
        "event_audience_overlap_hll",  # pair enumeration over the
        # |groups|-row SKETCH relation (segments, not members) — the
        # cross is bounded by the segmentation cardinality squared;
        # the member-scale work happened in the sketch agg before it
        "rp_topk_embeddings",  # the bruteforce broadcast-queries
        # cross over 16-dim PROJECTED vectors (same exempted shape,
        # quarter the bytes — the compression is the point)
        "rp_topk_fast",  # double-scoring twin of rp_topk_embeddings,
        # same broadcast-queries cross shape
        "rp_quality_report",  # same broadcast-queries cross, scoring
        # both spaces at once for the JL error report
        "supplier_efficiency_skyline",  # phase-2 dominance anti-join
        # runs over the UNION OF BATCH-LOCAL SKYLINES only (phase 1
        # pruned the corpus mapInPandas-side; skyline is distributive
        # over union, so candidates are O(local-skyline · batches),
        # not data-sized) — see operators/pareto.py module doc
    }
    # the one deliberate Python-UDTF query: API-surface coverage whose
    # production twin (token_runs_expr) is the pure-codegen path
    allowed_udtf = {"token_runs_udtf"}
    for name, fn in sorted(get_all_queries().items()):
        audit = plan_audit(fn(spark, sf_dir))
        if name not in allowed_cartesian:
            assert not audit["cartesian"], f"{name} plans a cartesian join"
        assert not audit["python_row_udf"], f"{name} uses a row Python UDF"
        if name not in allowed_udtf:
            assert not audit["python_udtf"], f"{name} plans a Python UDTF"
        # no query may move data-sized input to a single task via an
        # unpartitioned window; sole exemption: the rolling-sketch
        # union, whose window input is the |days|-row STORED daily
        # rollup (bounded by calendar, not data) — single-series
        # rolling frames cannot be partitioned without breaking the
        # frame at partition edges
        # open_orders_daily shares the same bounded shape: its
        # cumulative sum runs over the |days|-row delta rollup of
        # the interval sweep line (operators/intervals.py)
        if name not in {"rolling_active_users_7d", "open_orders_daily"}:
            assert not audit["global_window"], (
                f"{name} plans an unpartitioned (global) window"
            )


def test_headline_exchange_budgets(spark, sf_dir):
    """Lock the shuffle budget of every headline bench query: the
    exchange count is the scale cost model (each one is a full
    cluster-wide data movement at 100 TB), so a regression here is a
    performance bug even with every value still correct."""
    budgets = {
        "flagship_top3_region": 2,     # group-by agg + window repartition
        "q1_pricing_summary": 1,       # the single group-by
        "left_join_order_counts": 1,
        "asof_join_purchase_click": 1,
        "running_customer_spend": 1,
        "top_orders_global": 0,        # TakeOrderedAndProject, no exchange
        "union_all_segments": 0,       # plan merge only
        "json_pack_events": 0,         # narrow projection
        "session_windows_30m": 1,
        "text_stats": 0,
        # primary-tier packs that replaced the above in the driver set
        "json_map_pack_events": 0,     # still a narrow projection
        "text_pack": 0,                # five text queries fused, still narrow
        "window_offset_frames_pack": 1,  # one o_custkey exchange, 4 specs
        "window_rank_pack": 1,         # one p_brand exchange, 2 specs
        "date_null_pack_orders": 0,    # narrow projection
        "multimodal_meta_pack": 0,     # mapInPandas + metadata explode
        "sampling_pack": 1,            # stratified window exchange only
        "sessions_pack": 2,            # session-window agg + grouped-map
        "training_data_ops_pack": 3,   # shard window + contamination agg
                                       # + bm25 1-row stats aggregate
        "setops_pack": 4,              # 4 aggregating branches, bag union free
        "multi_grain_agg_pack": 3,     # one shuffle per lattice branch
        "window_agg_pack": 4,          # tumbling+sliding+daily+monthly aggs
    }
    for name, budget in budgets.items():
        audit = plan_audit(get_all_queries()[name](spark, sf_dir))
        assert audit["exchanges"] <= budget, (
            f"{name}: {audit['exchanges']} exchanges (budget {budget})"
        )
        assert not audit["sortmerge_joins"], f"{name} fell back to SMJ"
