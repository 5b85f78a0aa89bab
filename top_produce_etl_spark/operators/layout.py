"""File-layout operators: multi-dimensional clustering keys.

``io/sinks.py::write_table(sort_by=...)`` clusters row groups on ONE
leading column; predicates on any other column still scan every
group. Z-ordering interleaves the bits of several bounded-int
dimensions into one sortable key, so sorting by it tiles the space —
every dimension's per-row-group min/max range narrows to roughly the
tile width, and point/range predicates on ANY of the z-dimensions
skip row groups (the layout trick behind Delta/Iceberg ``ZORDER
BY``, here as a plain column expression over open formats).

Scale notes: the key is a narrow codegen'd expression (bits × dims
shift-adds, no shuffle of its own); the write pays the same
in-partition sort as any ``sort_by``. Dimensions must first be
bucketized to [0, 2^bits) — :func:`minmax_bucketize` does linear
binning from driver-known bounds (one cheap agg, model-sized)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def minmax_bucketize(
    col: Column | str, lo: float, hi: float, bits: int
) -> Column:
    """Linear-bin a numeric column into integer buckets
    [0, 2^bits), clamped at the edges. ``lo``/``hi`` come from a
    driver-side bounds agg (two scalars) or domain knowledge."""
    c = F.col(col) if isinstance(col, str) else col
    n = float(2**bits)
    scaled = F.floor((c.cast("double") - F.lit(lo)) / F.lit(hi - lo) * n)
    return F.least(
        F.greatest(scaled, F.lit(0)), F.lit(2**bits - 1)
    ).cast("long")


def zorder_key(cols: list[Column | str], bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of each (already-bucketized,
    non-negative) column into one Morton key: output bit
    ``b·n_dims + i`` = bit ``b`` of dimension ``i``. Sorting by the
    key orders rows along the Z space-filling curve."""
    n = len(cols)
    if n * bits > 63:
        raise ValueError(f"{n} dims x {bits} bits exceeds a signed long")
    cs = [F.col(c).cast("long") if isinstance(c, str) else c.cast("long") for c in cols]
    acc = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(cs):
            bit = F.shiftright(c, b).bitwiseAND(F.lit(1))
            acc = acc + F.shiftleft(bit, b * n + i)
    return acc


def with_zorder_key(
    df: DataFrame,
    dims: list[str],
    bits: int = 10,
    out: str = "__zkey",
    bounds: dict[str, tuple[float, float]] | None = None,
) -> DataFrame:
    """Attach a z-order key over ``dims``. Bounds default to one
    min/max agg over the frame (2·|dims| driver scalars)."""
    if bounds is None:
        row = df.agg(
            *[F.min(d).alias(f"lo_{d}") for d in dims],
            *[F.max(d).alias(f"hi_{d}") for d in dims],
        ).collect()[0]
        bounds = {d: (float(row[f"lo_{d}"]), float(row[f"hi_{d}"])) for d in dims}
    bucketed = [
        minmax_bucketize(d, bounds[d][0], bounds[d][1] + 1e-9, bits) for d in dims
    ]
    return df.withColumn(out, zorder_key(bucketed, bits))
