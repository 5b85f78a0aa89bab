from top_produce_etl_spark.plans.builder import build_pipeline, run_topn_job

__all__ = ["build_pipeline", "run_topn_job"]
