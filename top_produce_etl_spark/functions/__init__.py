from top_produce_etl_spark.functions.numeric import dec, dec_sum, revenue_expr, safe_div

__all__ = ["dec", "dec_sum", "revenue_expr", "safe_div"]
