"""Query registry — the correctness surface.

Every implemented operator family from SURVEY.md §2 registers one or
more named queries here. A query is a callable ``(spark, sf_dir) ->
DataFrame`` plus (when SQL-expressible) a DuckDB oracle SQL string
computing the same result on the same parquet tables; the driver
compares row-count + schema + order-insensitive value hash
(``__spark_entry__.py`` contract).

Registration is decorator-based so query modules stay self-contained:

    @query("flagship_top3_region", oracle=FLAGSHIP_SQL)
    def flagship(spark, sf_dir): ...

Column-name discipline: Spark aliases and SQL ``AS`` names must
match exactly (the driver sorts columns by name before hashing).
Numeric discipline: money aggregates go through exact DECIMAL in
both engines (see functions.numeric) so values are bit-identical.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def get_queries() -> dict[str, QueryFn]:
    _load_all()
    return dict(_QUERIES)


def get_oracles() -> dict[str, str]:
    _load_all()
    return dict(_ORACLES)


_LOADED = False


def _load_all() -> None:
    """Import all query modules (side-effect: registration)."""
    global _LOADED
    if _LOADED:
        return
    from top_produce_etl_spark.queries import (  # noqa: F401
        advanced,
        aggregates,
        dedup_q,
        eventtime,
        joins_q,
        multimodal_q,
        relational,
        scalars,
        scalars2,
        setops,
        similarity_q,
        text_q,
        tpch_q,
        windows,
    )
    _LOADED = True
