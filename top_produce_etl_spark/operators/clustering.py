"""Iterative clustering (SURVEY.md §2.11 extension tier): Lloyd
k-means over an embedding column — the training step behind the IVF
similarity index (queries.similarity_q.ivf_blocked_neardup uses
label blocking; this learns the blocks instead).

Scale design: the only state that crosses iterations is the k×dim
centroid matrix — tiny — so each Lloyd round is
  1. assignment: a NARROW map (distances against k centroid
     literals folded per-row with ``F.aggregate``; no join, no
     shuffle, whole-stage codegen),
  2. update: one hash aggregate over (cluster, dim) — k·dim groups,
     map-side partial combine — then a k·dim-row collect to the
     driver (the legitimate driver-side step: broadcastable model
     state, NOT data).
At 100 TB the assignment pass dominates and scales linearly with
executors; nothing per-iteration grows with |rows|.

Determinism contract (what makes this oracle-checkable): init =
the k lowest-id vectors; centroids are rounded to 6 dp after every
update (and at init), so both engines feed bit-identical centroid
literals into the next distance pass; per-row distance folds are
sequential left-to-right in both Spark (``F.aggregate``) and DuckDB
(``list_sum`` over ``list_transform``); argmin tie-breaks on
cluster id. Float mean accumulation order across rows differs
between engines, which the 6 dp rounding absorbs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _assign(
    df: DataFrame, id_col: str, vec_col: str, cents: list[tuple[int, list[float]]]
) -> DataFrame:
    """Nearest-centroid assignment as one narrow projection: an
    array of (distance, cid) structs whose ``array_min`` is the
    lexicographic (min-distance, then min-cid) argmin."""
    dists = F.array(
        *[
            F.struct(
                F.aggregate(
                    F.zip_with(
                        F.col(vec_col),
                        F.array(*[F.lit(float(v)) for v in cvec]),
                        lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
                    ),
                    F.lit(0.0),
                    lambda acc, z: acc + z,
                ).alias("d"),
                F.lit(int(cid)).alias("cid"),
            )
            for cid, cvec in cents
        ]
    )
    return df.select(
        F.col(id_col), F.array_min(dists).getField("cid").alias("cluster")
    )


def kmeans_lloyd(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    iters: int = 1,
) -> DataFrame:
    """Lloyd k-means: ``iters`` update rounds, returning the final
    (id, cluster) assignment against the last centroids.

    Deterministic init: the k lowest-id vectors, rounded to 6 dp.
    """
    init_rows = df.select(id_col, vec_col).orderBy(id_col).limit(k).collect()
    cents: list[tuple[int, list[float]]] = [
        (i, [round(float(x), 6) for x in r[vec_col]])
        for i, r in enumerate(init_rows)
    ]
    assign = _assign(df, id_col, vec_col, cents)
    for _ in range(iters):
        # update: per-(cluster, dim) mean, rounded — k·dim rows back
        # to the driver (model state, broadcast next round as
        # literals; at cluster scale this is the classic
        # "small model, big data" iteration shape)
        rows = (
            df.join(assign, id_col)
            .select("cluster", F.posexplode(vec_col).alias("dim", "x"))
            .groupBy("cluster", "dim")
            .agg(F.round(F.avg(F.col("x").cast("double")), 6).alias("v"))
            .collect()
        )
        by_cid: dict[int, dict[int, float]] = {}
        for r in rows:
            by_cid.setdefault(r["cluster"], {})[r["dim"]] = r["v"]
        cents = [
            (cid, [dims[d] for d in sorted(dims)])
            for cid, dims in sorted(by_cid.items())
        ]
        assign = _assign(df, id_col, vec_col, cents)
    return assign
