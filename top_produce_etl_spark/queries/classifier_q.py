"""In-engine classifier queries (round 9 — operators/classifier.py):
the hashed-feature quasi-logistic quality classifier, trained AND
scored inside the engine, with the whole training loop oracle-checked
bit-exactly (integer GD, unrolled-CTE DuckDB twin)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from top_produce_etl_spark.io.sources import load_table
from top_produce_etl_spark.operators.classifier import (
    score_quasi_logreg,
    score_quasi_logreg_oracle_sql,
    train_quasi_logreg,
    train_quasi_logreg_oracle_sql,
)
from top_produce_etl_spark.queries import query

N_BUCKETS = 32
ITERS = 12
LR = (1, 50)

# The label must be PREDICTABLE from the text for the demo to show
# learning (the fixture's lang column is independent of its token
# stream — a lang label trains to the majority class): y = 1 iff the
# doc uses 'spark' at least as often as 'table', a linear rule over
# token counts. Trained accuracy 72.6% vs the 59.6% majority
# baseline at sf0.01 — the hashed features carry collision noise by
# construction, so Bayes-optimal is well below 100%.
_LABEL_SQL = (
    "CASE WHEN len(list_filter(string_split(text, ' '), "
    "t -> t = 'spark')) >= len(list_filter(string_split(text, ' '), "
    "t -> t = 'table')) THEN 1 ELSE 0 END"
)


def _with_label(docs: DataFrame) -> DataFrame:
    n = lambda w: F.size(  # noqa: E731
        F.filter(F.split(F.col("text"), " "), lambda t: t == w)
    )
    return docs.withColumn(
        "y", F.when(n("spark") >= n("table"), 1).otherwise(0)
    )


@query(
    "quality_classifier_train",
    extended=True,
    oracle=train_quasi_logreg_oracle_sql(
        label_sql=_LABEL_SQL, n_buckets=N_BUCKETS, iters=ITERS, lr=LR
    ),
)
def quality_classifier_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRAIN a classifier inside the engine (round 9): 12 full-batch
    gradient-descent iterations of quasi-logistic regression over
    32-bucket hashed bag-of-words features, predicting a
    token-count rule (see _LABEL_SQL).
    Every iteration is one broadcast join + two integer aggregations;
    weights stay in micro-unit int64 end to end, so the returned
    model hash-matches DuckDB's unrolled-CTE replay of the SAME
    training loop bit for bit — distributed training with a
    serial-engine proof."""
    docs = _with_label(load_table(spark, sf_dir, "documents"))
    return train_quasi_logreg(
        docs, "doc_id", "text", "y",
        n_buckets=N_BUCKETS, iters=ITERS, lr=LR,
    )


@query(
    "quality_classifier_confusion",
    extended=True,
    oracle=score_quasi_logreg_oracle_sql(
        label_sql=_LABEL_SQL, n_buckets=N_BUCKETS, iters=ITERS, lr=LR
    ),
)
def quality_classifier_confusion(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Train-then-score, rolled up as the confusion matrix with
    per-cell score-mass integers (sum/min/max of the micro-unit
    fast-sigmoid probability) — the model evaluation a curation
    pipeline gates on before applying a learned quality filter.
    Inference is one broadcast model join + one per-doc sum."""
    docs = _with_label(load_table(spark, sf_dir, "documents"))
    model = train_quasi_logreg(
        docs, "doc_id", "text", "y",
        n_buckets=N_BUCKETS, iters=ITERS, lr=LR,
    )
    scored = score_quasi_logreg(
        docs, model, "doc_id", "text", n_buckets=N_BUCKETS
    )
    labels = docs.select(F.col("doc_id").alias("id"), "y")
    return (
        scored.join(labels, "id")
        .groupBy("y", "pred")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("score_micro").cast("bigint").alias("sum_score_micro"),
            F.min("score_micro").cast("bigint").alias("min_score_micro"),
            F.max("score_micro").cast("bigint").alias("max_score_micro"),
        )
    )
