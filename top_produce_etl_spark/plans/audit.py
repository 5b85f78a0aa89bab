"""Plan audit — programmatic physical-plan linting.

"Run ``.explain`` and iterate until it's the plan you'd want" is a
workflow; this module turns it into an API so pipelines can assert
scale properties in CI instead of eyeballing plan dumps:

    audit = plan_audit(df)
    assert audit["exchanges"] <= 1
    assert not audit["cartesian"]
    assert_scalable(df, max_exchanges=2, forbid=("cartesian",
                    "python_row_udf"))

Checks are string-level over the formatted physical plan (the same
surface ``df.explain("formatted")`` prints — stable enough for the
properties we assert, and requires no JVM internals).
"""

from __future__ import annotations

import re
from typing import Any

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The plan string ``df.explain(mode)`` would print.

    Fast path goes through the JVM gateway (no stdout redirection);
    under Spark Connect or if the private hooks move, fall back to
    capturing ``df.explain`` output — same surface, works on any
    session type."""
    try:
        return df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), mode
        )
    except AttributeError:
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain(mode=mode)
        return buf.getvalue()


def plan_audit(df: DataFrame) -> dict[str, Any]:
    """Summarize scale-relevant properties of the physical plan.

    Keys:
      exchanges            shuffle exchange count (broadcast NOT counted)
      broadcast_exchanges  broadcast exchange count
      broadcast_joins / sortmerge_joins / shuffled_hash_joins
      cartesian            CartesianProduct or BroadcastNestedLoopJoin present
      window_nodes         window operator count (skew-sensitive)
      python_row_udf       row-at-a-time Python UDF present (BatchEvalPython)
      arrow_udf            Arrow-batched pandas UDF present
      pushed_filters       list of PushedFilters entries (non-empty scans)
      read_schemas         list of ReadSchema structs per scan
      partial_agg          a map-side (partial) aggregate exists
      aqe                  plan is adaptive
    """
    p = explain_str(df, "formatted")
    return {
        "exchanges": len(re.findall(r"\(\d+\) Exchange\b", p)),
        "broadcast_exchanges": len(re.findall(r"\(\d+\) BroadcastExchange\b", p)),
        "broadcast_joins": p.count("BroadcastHashJoin"),
        "sortmerge_joins": p.count("SortMergeJoin"),
        "shuffled_hash_joins": p.count("ShuffledHashJoin"),
        "cartesian": "CartesianProduct" in p or "BroadcastNestedLoopJoin" in p,
        "window_nodes": len(re.findall(r"\(\d+\) (?:Running)?Window", p)),
        "python_row_udf": "BatchEvalPython" in p,
        "arrow_udf": "ArrowEvalPython" in p
        or "FlatMapGroupsInPandas" in p
        or "MapInPandas" in p,
        "pushed_filters": [
            m for m in re.findall(r"PushedFilters: \[([^\]]*)\]", p) if m.strip()
        ],
        "read_schemas": re.findall(r"ReadSchema: struct<([^>]*)>", p),
        "partial_agg": "partial_" in p,
        "aqe": "AdaptiveSparkPlan" in p,
    }


_FORBIDDABLE = ("cartesian", "python_row_udf", "sortmerge_joins", "window_nodes")


def assert_scalable(
    df: DataFrame,
    max_exchanges: int | None = None,
    forbid: tuple[str, ...] = ("cartesian", "python_row_udf"),
) -> dict[str, Any]:
    """Raise ``AssertionError`` when the plan violates scale rules;
    return the audit otherwise. ``forbid`` entries come from
    ``_FORBIDDABLE`` (truthiness-checked audit keys)."""
    audit = plan_audit(df)
    problems = []
    if max_exchanges is not None and audit["exchanges"] > max_exchanges:
        problems.append(
            f"{audit['exchanges']} shuffle exchanges (max {max_exchanges})"
        )
    for key in forbid:
        if key not in _FORBIDDABLE:
            raise ValueError(f"unknown forbid key: {key}")
        if audit[key]:
            problems.append(f"forbidden plan feature: {key}={audit[key]}")
    if problems:
        raise AssertionError(
            "; ".join(problems) + "\n" + explain_str(df, "simple")
        )
    return audit
