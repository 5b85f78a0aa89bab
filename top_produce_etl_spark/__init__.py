"""top_produce_etl_spark — a PySpark-native analytics engine.

A from-scratch, idiomatic PySpark engine providing the query and
data-processing capabilities of the reference project
``jiazhi110/Top-produce-ETL`` (a config-driven "top-N per group"
batch-ETL scaffold — see reference ``config/config_prod.yaml:10-13``),
generalized into a full relational operator library plus
LLM-data-pipeline extensions (dedup, similarity search, text
analysis, multimodal column plumbing).

Design principles (SURVEY.md §0, §4):
- DataFrame/SQL first: declare logical plans, let Catalyst/Tungsten
  pick physical strategies (predicate pushdown, AQE, broadcast).
- UDFs are the slow path: built-in ``pyspark.sql.functions``
  everywhere possible; Arrow-batched pandas UDFs when not.
- Batch-first event-time semantics identical to Structured
  Streaming so ``read`` → ``readStream`` is the only swap.
"""

from top_produce_etl_spark.session import create_spark_session, detect_environment
from top_produce_etl_spark.config import load_config, JobConfig

__all__ = [
    "create_spark_session",
    "detect_environment",
    "load_config",
    "JobConfig",
]

__version__ = "0.1.0"
