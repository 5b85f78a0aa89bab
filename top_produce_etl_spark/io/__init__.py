from top_produce_etl_spark.io.sources import read_table, load_table, load_star, TABLES
from top_produce_etl_spark.io.sinks import write_table

__all__ = ["read_table", "load_table", "load_star", "write_table", "TABLES"]
