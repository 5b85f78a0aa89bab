"""Column-level profiling and snapshot drift — the data-contract
operator family: "did the SHAPE of this table change?" (null rates,
cardinalities, ranges), complementing the VALUE-distribution drift
gates (chi², PSI, KS in operators/stats.py, anomaly.py).

Reference parity: beyond-reference operations tier (the reference's
transform core is empty).

Scale shape: one aggregation pass computes every per-column metric
as sibling expressions (count / null count / distinct count / min /
max for k columns collapse into ONE wide row), then the per-column
rows unpivot from that single row via ``stack`` — no per-column
scans, no driver loops over data. Exact ``count(distinct)`` over k
columns plans through Spark's Expand (a k× row multiplication before
partial aggregation): acceptable for a profile pass and required for
the DuckDB-exact oracle; at 100 TB swap ``exact_ndv=False`` to
``approx_count_distinct`` (HLL, single-pass, no Expand) — same
report shape, documented estimate semantics.

Engine-portable min/max rendering: values render to strings AFTER
the native-typed aggregate (min of the NATIVE type, then cast), with
the same canonicalization contract as
operators/quality.py::table_fingerprint — timestamps format to
``yyyy-MM-dd HH:mm:ss`` and float/double columns must be pre-cast to
decimal by the caller (raw float rendering differs across engines,
so unlisted doubles raise).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _render(df: DataFrame, c: str) -> Column:
    dt = df.schema[c].dataType.simpleString()
    if dt in ("double", "float"):
        raise ValueError(
            f"column {c!r} is {dt}: cast it to an explicit decimal "
            "before profiling — raw floating-point rendering is not "
            "engine-portable"
        )
    return F.col(c)


def _to_str(col: Column, dt: str) -> Column:
    if dt == "timestamp":
        return F.date_format(col, "yyyy-MM-dd HH:mm:ss")
    if dt == "date":
        return F.date_format(col, "yyyy-MM-dd")
    return col.cast("string")


def column_profile(
    df: DataFrame, cols: list[str] | None = None, exact_ndv: bool = True
) -> DataFrame:
    """Per-column shape profile: (column, n_rows, n_null,
    n_distinct, min_str, max_str) — one row per profiled column,
    computed in a single aggregation pass (see module docstring).
    ``n_distinct`` excludes NULLs (both engines' count-distinct
    semantics)."""
    cols = cols or df.columns
    if not cols:
        raise ValueError("no columns to profile")
    aggs: list[Column] = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cols):
        col = _render(df, c)
        dt = df.schema[c].dataType.simpleString()
        aggs.append(
            F.sum(col.isNull().cast("long")).cast("bigint").alias(f"__nn{i}")
        )
        aggs.append(
            (
                F.countDistinct(col)
                if exact_ndv
                else F.approx_count_distinct(col)
            )
            .cast("bigint")
            .alias(f"__nd{i}")
        )
        aggs.append(_to_str(F.min(col), dt).alias(f"__mn{i}"))
        aggs.append(_to_str(F.max(col), dt).alias(f"__mx{i}"))
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __n, __nn{i}, __nd{i}, __mn{i}, __mx{i}"
        for i, c in enumerate(cols)
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(column, n_rows, n_null, n_distinct, min_str, max_str)"
        )
    )


def profile_drift(
    old: DataFrame,
    new: DataFrame,
    cols: list[str],
    exact_ndv: bool = True,
) -> DataFrame:
    """Contract-drift report between two snapshots: one row per
    column with both profiles side by side plus the null-RATE delta
    in 1e6 fixed point (rate changes are the usual upstream-breakage
    tell; absolute counts just track volume). Output: (column,
    n_old, n_new, null_rate_delta_micro, ndv_old, ndv_new, min_old,
    min_new, max_old, max_new), ordered by column name.

    Two single-pass profiles joined on the |cols|-row report —
    nothing data-sized crosses the join.
    """
    po = column_profile(old, cols, exact_ndv=exact_ndv)
    pn = column_profile(new, cols, exact_ndv=exact_ndv)
    o, n = po.alias("o"), pn.alias("n")

    def rate(side: str) -> Column:
        # integer FLOOR division on both engines (Spark `div`,
        # DuckDB `//`) — a decimal→bigint cast would TRUNCATE in
        # Spark but ROUND in DuckDB, a classic cross-engine trap.
        # n_null * 1e6 needs n_null < ~9.2e12 to stay in BIGINT —
        # fine for any per-table profile.
        return F.expr(f"({side}.n_null * 1000000L) div {side}.n_rows")

    return (
        o.join(n, F.col("o.column") == F.col("n.column"), "full_outer")
        .select(
            F.coalesce(F.col("o.column"), F.col("n.column")).alias("column"),
            F.col("o.n_rows").alias("n_old"),
            F.col("n.n_rows").alias("n_new"),
            (rate("n") - rate("o"))
            .cast("bigint")
            .alias("null_rate_delta_micro"),
            F.col("o.n_distinct").alias("ndv_old"),
            F.col("n.n_distinct").alias("ndv_new"),
            F.col("o.min_str").alias("min_old"),
            F.col("n.min_str").alias("min_new"),
            F.col("o.max_str").alias("max_old"),
            F.col("n.max_str").alias("max_new"),
        )
        .orderBy("column")
    )


def _sql_render(c: str, types: dict[str, str]) -> str:
    t = types.get(c, "")
    if t == "timestamp":
        return f"strftime({{agg}}({c}), '%Y-%m-%d %H:%M:%S')"
    if t == "date":
        return f"strftime({{agg}}({c}), '%Y-%m-%d')"
    return f"CAST({{agg}}({c}) AS VARCHAR)"


def column_profile_oracle_sql(
    relation: str, cols: list[str], types: dict[str, str] | None = None
) -> str:
    """DuckDB twin of :func:`column_profile` (exact_ndv=True) for a
    relation expression (table name or parenthesized subquery):
    UNION ALL of one aggregate select per column — same output, same
    rendering contract. ``types`` flags 'timestamp'/'date' columns
    so min/max render identically."""
    types = types or {}
    parts = []
    for c in cols:
        r = _sql_render(c, types)
        parts.append(
            f"""SELECT '{c}' AS "column",
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_null,
               CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
               {r.format(agg="MIN")} AS min_str,
               {r.format(agg="MAX")} AS max_str
            FROM {relation}"""
        )
    return " UNION ALL ".join(parts)


def profile_drift_oracle_sql(
    old_relation: str,
    new_relation: str,
    cols: list[str],
    types: dict[str, str] | None = None,
) -> str:
    """DuckDB twin of :func:`profile_drift`."""
    po = column_profile_oracle_sql(old_relation, cols, types)
    pn = column_profile_oracle_sql(new_relation, cols, types)
    return f"""
    WITH po AS ({po}), pn AS ({pn})
    SELECT po."column" AS "column",
           po.n_rows AS n_old, pn.n_rows AS n_new,
           CAST((pn.n_null * 1000000) // pn.n_rows
                - (po.n_null * 1000000) // po.n_rows
                AS BIGINT) AS null_rate_delta_micro,
           po.n_distinct AS ndv_old, pn.n_distinct AS ndv_new,
           po.min_str AS min_old, pn.min_str AS min_new,
           po.max_str AS max_old, pn.max_str AS max_new
    FROM po JOIN pn USING ("column")
    ORDER BY "column"
    """
