"""Token run-length encoding: column-expression operator vs native
Python UDTF — edge cases, twin equivalence, and the zero-shuffle /
zero-Python plan invariant for the production path."""

from __future__ import annotations

from top_produce_etl_spark.functions.udtfs import TokenRunsUDTF, register_udtfs
from top_produce_etl_spark.operators.textquality import token_runs

CASES = [
    # (doc_id, text) -> expected (run_start, term, run_len) rows at min_len=2
    (1, "a a a b b c", {(1, "a", 3), (4, "b", 2)}),
    (2, "x", set()),                      # single token: no run
    (3, "x x", {(1, "x", 2)}),           # whole doc is one run
    (4, "a b a b", set()),               # alternation: no runs
    (5, "", set()),                      # empty text -> one '' token
    (6, "a a b b b a a a a", {(1, "a", 2), (3, "b", 3), (6, "a", 4)}),
]


def _expected():
    return {(d, s, t, n) for d, _, exp in CASES for (s, t, n) in exp}


def test_token_runs_expr_edge_cases(spark):
    df = spark.createDataFrame(
        [(d, t) for d, t, _ in CASES], "doc_id long, text string"
    )
    got = {
        (r.doc_id, r.run_start, r.term, r.run_len)
        for r in token_runs(df, "doc_id", "text", min_len=2).collect()
    }
    assert got == _expected()


def test_token_runs_udtf_matches_expr(spark):
    df = spark.createDataFrame(
        [(d, t) for d, t, _ in CASES], "doc_id long, text string"
    )
    df.createOrReplaceTempView("__runs_cases")
    register_udtfs(spark)
    got = {
        (r.doc_id, r.run_start, r.term, r.run_len)
        for r in spark.sql(
            "SELECT d.doc_id, t.* FROM __runs_cases d, "
            "LATERAL token_runs(d.text, 2) t"
        ).collect()
    }
    assert got == _expected()


def test_token_runs_udtf_null_text_yields_no_rows():
    rows = list(TokenRunsUDTF.func().eval(None, 2))
    assert rows == []


def test_token_runs_min_len_filter_inside_array(spark):
    """min_len=3 drops shorter runs before explode."""
    df = spark.createDataFrame([(6, CASES[5][1])], "doc_id long, text string")
    got = {
        (r.run_start, r.term, r.run_len)
        for r in token_runs(df, "doc_id", "text", min_len=3).collect()
    }
    assert got == {(3, "b", 3), (6, "a", 4)}


def test_token_runs_expr_plan_is_narrow(spark, sf_dir):
    """Production path: no shuffle, no Python in the plan — the
    operator must run at scan speed at 100 TB."""
    from top_produce_etl_spark.io.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    plan = (
        token_runs(docs, "doc_id", "text")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan
    for py in ("BatchEvalPython", "ArrowEvalPython", "PythonUDTF"):
        assert py not in plan, plan
