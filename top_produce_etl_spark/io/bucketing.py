"""Bucketed tables — co-located joins and aggregations without
shuffles (SURVEY.md §4 "Partitioning & shuffle").

At 100 TB the fact⨝fact join (e.g. lineitem⨝orders) is the one
join that cannot broadcast; executed naively it shuffles BOTH sides
on every query. Bucketing pays that shuffle once at write time:
``bucketBy(n, key)`` hash-partitions files on disk, and every later
join or aggregation on the bucket key reads co-located buckets with
ZERO exchanges (asserted in tests/test_bucketing.py).

Sizing: pick ``num_buckets`` so one bucket of the LARGER table is
100-500 MB (fits an executor's scan batch). Bucket counts on the two
sides must match (or be multiples, with
``spark.sql.bucketing.coalesceBucketsInJoin.enabled``).

Bucketed writes go through the session catalog (``saveAsTable`` —
bucket metadata lives in the metastore; a plain ``.save(path)``
silently drops it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: str | list[str],
    num_buckets: int,
    sort_by: str | list[str] | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Write ``df`` as a bucketed (and optionally sorted) catalog
    table. Sorting within buckets additionally removes the Sort from
    later sort-merge joins on the key."""
    keys = [bucket_by] if isinstance(bucket_by, str) else list(bucket_by)
    writer = df.write.mode(mode).format(fmt).bucketBy(num_buckets, *keys)
    if sort_by is not None:
        sorts = [sort_by] if isinstance(sort_by, str) else list(sort_by)
        writer = writer.sortBy(*sorts)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed catalog table (bucket metadata applies only
    through the catalog path, never ``spark.read.parquet``)."""
    return spark.table(table)


def cobucket_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str | list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two co-bucketed tables on their bucket key — planner
    reads matching buckets side-by-side, no exchange on either side."""
    keys = [on] if isinstance(on, str) else list(on)
    return spark.table(left_table).join(spark.table(right_table), keys, how)
