"""Z-order layout: multi-dimensional row-group skipping
(operators/layout.py). Verified against real parquet footers: after
z-sort, EVERY z-dimension's per-row-group range narrows, where a
plain single-column sort leaves the other dimension spanning the
whole domain."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from top_produce_etl_spark.io.sinks import write_table
from top_produce_etl_spark.operators.layout import with_zorder_key, zorder_key


def test_zorder_key_is_morton_interleave(spark):
    rows = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (1, 1), (2, 2), (3, 3)], "x long, y long"
    ).select(zorder_key(["x", "y"], bits=2).alias("z"))
    got = [r["z"] for r in rows.collect()]
    # bit b*2 = bit b of x, bit b*2+1 = bit b of y
    assert got == [0b00, 0b01, 0b10, 0b11, 0b1100, 0b1111]


def _col_spans(path, col_idx):
    spans = []
    for f in glob.glob(f"{path}/*.parquet"):
        pf = pq.ParquetFile(f)
        for g in range(pf.metadata.num_row_groups):
            st = pf.metadata.row_group(g).column(col_idx).statistics
            spans.append(st.max - st.min)
    return spans


def test_zorder_narrows_both_dimensions(spark, tmp_path):
    df = (
        spark.range(200_000)
        .select(
            F.pmod(F.xxhash64("id"), F.lit(1024)).alias("x"),
            F.pmod(F.xxhash64("id", F.lit(1)), F.lit(1024)).alias("y"),
        )
        .repartition(1)
    )
    opts = {"parquet.block.size": str(64 * 1024)}

    write_table(df, str(tmp_path / "xsort"), sort_by=["x"], options=opts)
    z = with_zorder_key(df, ["x", "y"], bits=10)
    write_table(
        z.select("x", "y", "__zkey"),
        str(tmp_path / "zsort"),
        sort_by=["__zkey"],
        options=opts,
    )

    domain = 1024.0
    # x-sort: x ranges are tight, y ranges span ~the whole domain
    xsort_y = _col_spans(str(tmp_path / "xsort"), 1)
    assert sum(xsort_y) / len(xsort_y) > domain * 0.9

    # z-sort: BOTH dimensions' ranges are materially narrowed
    zsort_x = _col_spans(str(tmp_path / "zsort"), 0)
    zsort_y = _col_spans(str(tmp_path / "zsort"), 1)
    assert sum(zsort_x) / len(zsort_x) < domain * 0.55
    assert sum(zsort_y) / len(zsort_y) < domain * 0.55


def test_zorder_key_is_injective_on_domain(spark):
    """Morton interleave is a bijection on [0,2^bits)²: no two
    distinct (x, y) pairs may collide (the property that makes
    z-range scans exact, not approximate)."""
    df = (
        spark.range(4096)
        .select((F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("long").alias("y"))
        .select("x", "y", zorder_key(["x", "y"], bits=6).alias("z"))
    )
    assert df.select("z").distinct().count() == 4096
    # and the key is exactly the 12-bit interleave: max < 2^12
    mx = df.agg(F.max("z").alias("m")).collect()[0]["m"]
    assert mx == 4095
