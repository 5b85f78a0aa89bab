"""Count-min sketch: mergeable point-frequency estimation.

The HLL rollup (operators/sketches.py) answers "how many DISTINCT
keys"; the count-min sketch answers the complementary streaming
question — "roughly how OFTEN does key x occur" — in O(depth·width)
space regardless of key cardinality, with a one-sided guarantee
(estimate ≥ true count, overshoot ≤ εN with probability 1−δ for
width = e/ε, depth = ln 1/δ; Cormode & Muthukrishnan 2005). Stored
per day/partition it composes exactly like the HLL rollup: cells are
plain counts, so a month's sketch is SUM over the dailies — no
re-scan of the raw stream.

Spark-first design (100 TB shape):
- build: each row expands to ``depth`` (row, bucket) coordinates
  and a hash-aggregate reduces them; map-side combine caps the
  shuffle at tasks × depth × width rows, so the wire cost is the
  SKETCH size, not the data size.
- merge: SUM by (depth, bucket) — associative, any grain.
- estimate: the sketch is depth × width rows (KB-scale), so it
  broadcasts; query keys take min over depth of their cells.

Cross-engine determinism: bucket = composite 56-bit portable hash
(functions/portable_hash.py) of ``salt ‖ depth ‖ '_' ‖ key`` mod
width — DuckDB computes bit-identical cells, so build + merge +
estimate are all fully oracle-checked (no tolerance band needed:
counts are integers).

Reference parity: the reference's transform core
(src/transform/core.py) is empty; this extends the beyond-reference
sketch tier the round briefs ask for.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from top_produce_etl_spark.functions.portable_hash import (
    composite_hash_col,
    composite_hash_sql,
)

DEPTH = 4
WIDTH = 512

_SAFE_SALT = re.compile(r"[A-Za-z0-9_.\-]+")


def _check_salt(salt: str) -> None:
    """Salt is interpolated into generated SQL on both engines;
    restrict to a quote-free charset (same rule as splits.py)."""
    if not _SAFE_SALT.fullmatch(salt):
        raise ValueError(f"salt must match {_SAFE_SALT.pattern!r}: {salt!r}")


def _salted(salt: str, j: int, key_sql: str) -> str:
    return f"concat('{salt}{j}_', CAST({key_sql} AS STRING))"


def _bucket(salt: str, j: int, key_sql: str, width: int, hasher: str):
    """Per-depth bucket column. "portable" is the oracle path;
    "xxhash64" is the production path (one fused JVM intrinsic vs
    the interpreted polynomial fold — measured 34 s → sub-second on
    the 1M-row sketch build at sf0.1). NULL keys yield NULL buckets
    in both (xxhash64(NULL) returns the seed, so it needs a guard —
    the kmv.py note)."""
    if hasher == "portable":
        return composite_hash_col(_salted(salt, j, key_sql)) % width
    if hasher == "xxhash64":
        return F.expr(
            f"CASE WHEN ({key_sql}) IS NULL THEN NULL ELSE "
            f"pmod(xxhash64({_salted(salt, j, key_sql)}), {width}) END"
        )
    raise ValueError(f"unknown hasher: {hasher!r}")


def cms_build(
    df: DataFrame,
    key_sql: str,
    depth: int = DEPTH,
    width: int = WIDTH,
    salt: str = "cmsv1",
    value_sql: str | None = None,
    hasher: str = "portable",
) -> DataFrame:
    """Build the sketch: one row per non-empty (depth, bucket) cell.

    ``key_sql`` is a SQL expression (it is inlined into the hash
    expression, like splits.py does). NULL keys hash as NULL buckets
    and are dropped — count NULLs separately if they matter.

    ``value_sql``: None counts occurrences (the classic CMS);
    a BIGINT SQL expression sums it instead (the count-min SUM
    sketch — "estimated revenue per key" in sketch space; the
    one-sided guarantee holds as long as the value is non-negative).

    One explode (depth small: 4-8) + one hash-agg shuffle whose
    distinct-key count is ≤ depth × width — partial aggregation
    collapses the wire cost to sketch-size per task.
    """
    _check_salt(salt)
    coords = F.array(*[
        F.struct(
            F.lit(j).alias("depth"),
            _bucket(salt, j, key_sql, width, hasher).alias("bucket"),
        )
        for j in range(depth)
    ])
    val = F.lit(1) if value_sql is None else F.expr(value_sql)
    return (
        df.select(F.explode(coords).alias("c"), val.alias("__v"))
        .select("c.depth", "c.bucket", "__v")
        .where(F.col("bucket").isNotNull())
        .groupBy("depth", "bucket")
        .agg(F.sum("__v").alias("cnt"))
    )


def cms_merge(sketches: DataFrame) -> DataFrame:
    """Merge any union of sketch relations built with the same
    (depth, width, salt): cells are counts, so merge is SUM."""
    return sketches.groupBy("depth", "bucket").agg(
        F.sum("cnt").alias("cnt")
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = DEPTH,
    width: int = WIDTH,
    salt: str = "cmsv1",
    out: str = "cms_est",
    hasher: str = "portable",
) -> DataFrame:
    """Point-query a (small) key relation against the sketch.
    ``hasher`` must match the build's.

    The sketch is ≤ depth × width rows — broadcast unconditionally
    (fixed-size by construction, like the nation/region dims); keys
    expand to ``depth`` coordinate rows, left-join their cells
    (absent cell = 0), and take MIN over depth. Estimate ≥ true
    count always; equality when none of the key's cells collide.
    """
    _check_salt(salt)
    coords = F.array(*[
        F.struct(
            F.lit(j).alias("depth"),
            _bucket(salt, j, key_col, width, hasher).alias("bucket"),
        )
        for j in range(depth)
    ])
    kb = keys.withColumn("__c", F.explode(coords)).select(
        *keys.columns, F.col("__c.depth"), F.col("__c.bucket")
    )
    joined = kb.join(F.broadcast(sketch), ["depth", "bucket"], "left")
    # NULL probe keys were EXCLUDED by the build ("count NULLs
    # separately"), so a confident 0 would be a lie — surface NULL.
    return (
        joined.groupBy(*keys.columns)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias(out))
        .withColumn(
            # F.expr, not F.col: key_col may be a SQL expression
            # (``_bucket`` accepts one), and the guard must keep that
            # contract (ADVICE r6).
            out,
            F.when(F.expr(key_col).isNull(), F.lit(None)).otherwise(
                F.col(out)
            ),
        )
    )


def cms_cells_oracle_sql(
    from_sql: str,
    key_sql: str,
    depth: int = DEPTH,
    width: int = WIDTH,
    salt: str = "cmsv1",
    value_sql: str | None = None,
) -> str:
    """DuckDB CTE body computing the identical cells: one aggregate
    per depth, UNION ALL (the per-depth salt is baked into each)."""
    _check_salt(salt)
    agg = "COUNT(*)" if value_sql is None else f"SUM({value_sql})"
    parts = []
    for j in range(depth):
        h = composite_hash_sql(
            f"concat('{salt}{j}_', CAST({key_sql} AS VARCHAR))"
        )
        parts.append(
            f"SELECT {j} AS depth, ({h}) % {width} AS bucket,"
            f" {agg} AS cnt FROM {from_sql}"
            f" WHERE {key_sql} IS NOT NULL GROUP BY 2"
        )
    return " UNION ALL ".join(parts)


def cms_key_coords_oracle_sql(
    keys_sql: str,
    key_sql: str,
    depth: int = DEPTH,
    width: int = WIDTH,
    salt: str = "cmsv1",
) -> str:
    """DuckDB CTE body: each key row × its ``depth`` coordinates."""
    _check_salt(salt)
    parts = []
    for j in range(depth):
        h = composite_hash_sql(
            f"concat('{salt}{j}_', CAST({key_sql} AS VARCHAR))"
        )
        parts.append(
            f"SELECT *, {j} AS depth, ({h}) % {width} AS bucket"
            f" FROM ({keys_sql})"
        )
    return " UNION ALL ".join(parts)


def cms_join_size(
    sketch_a: DataFrame,
    sketch_b: DataFrame,
    depth: int = DEPTH,
) -> DataFrame:
    """Equi-join CARDINALITY estimation from two stored CMS sketches
    — the classic sketch inner product (Alon-Matias-Szegedy F2 /
    Cormode-Muthukrishnan §4.3): ``|A ⋈ B| = Σ_k a_k·b_k`` is
    estimated per depth row as ``Σ_bucket cntA·cntB`` (collisions
    only ADD, so each row over-estimates) and the MIN over depths is
    the one-sided estimate, exactly like a point query.

    This is the capacity-planning / pre-flight primitive: the join
    size of two 100 TB relations from two width×depth sketch tables,
    no scan of either side — run it before a backfill to know
    whether the shuffle fits. Both sketches must share (depth,
    width, salt, hasher).

    Plan shape: one (depth, bucket) equi-join of two sketch-sized
    relations + a depth-row agg + a 1-row min — everything after the
    (already stored) sketches is sketch-sized. Output: one row,
    ``est_join_size``.

    Sketch cells are SPARSE (zero buckets are never stored), so a
    depth whose two rows share no bucket has inner product 0 — the
    TIGHTEST estimate. The inner bucket join alone would drop that
    depth (and return NULL when every depth is disjoint); generating
    depths 0..depth-1 explicitly and coalescing missing products to 0
    lets the min reach 0 and makes disjoint inputs return 0, not NULL
    (round-8 advisor fix — which also gives the ``depth`` parameter
    its job).
    """
    a = sketch_a.select("depth", "bucket", F.col("cnt").alias("__ca"))
    b = sketch_b.select("depth", "bucket", F.col("cnt").alias("__cb"))
    per_depth = (
        a.join(b, ["depth", "bucket"])
        .groupBy("depth")
        .agg(F.sum(F.col("__ca") * F.col("__cb")).alias("__ip"))
    )
    depths = sketch_a.sparkSession.range(depth).select(
        F.col("id").cast("int").alias("depth")
    )
    return (
        depths.join(F.broadcast(per_depth), "depth", "left")
        .select(F.coalesce(F.col("__ip"), F.lit(0)).alias("__ip"))
        .agg(F.min("__ip").alias("est_join_size"))
    )


def cms_join_size_oracle_sql(
    cells_a_sql: str,
    cells_b_sql: str,
    depth: int = DEPTH,
) -> str:
    """DuckDB twin of :func:`cms_join_size` over two
    :func:`cms_cells_oracle_sql` bodies (bit-identical with the
    portable hasher). Mirrors the explicit depth generation: a depth
    with zero bucket overlap contributes inner product 0 (the exact
    estimate), and fully disjoint sketches return 0, not NULL."""
    return f"""
    WITH ca AS ({cells_a_sql}),
    cb AS ({cells_b_sql}),
    per_depth AS (
        SELECT ca.depth, SUM(ca.cnt * cb.cnt) AS ip
        FROM ca JOIN cb ON ca.depth = cb.depth AND ca.bucket = cb.bucket
        GROUP BY ca.depth
    ),
    depths AS (
        SELECT CAST(range AS INT) AS depth FROM range({depth})
    )
    SELECT MIN(COALESCE(p.ip, 0)) AS est_join_size
    FROM depths d LEFT JOIN per_depth p ON d.depth = p.depth
    """
