"""Native Python UDTFs (SURVEY.md §2.10 "row-explode UDTF" row).

Spark 4 ships first-class Python user-defined TABLE functions
(`pyspark.sql.functions.udtf`): a class whose ``eval`` yields zero
or more output rows per input row, callable from SQL — including in
a ``LATERAL`` correlated position — after ``spark.udtf.register``.
Earlier SURVEY drafts assumed a pre-3.5 engine floor where this was
unavailable; the engine floor is Spark 4, so the native API is
covered here.

Honest scale note: a Python UDTF is a per-row Python-process path —
Arrow moves the batches but ``eval`` itself is interpreted Python,
so it sits BELOW built-in higher-order array expressions in the
cost hierarchy (pyspark guide: built-ins ≫ pandas UDF ≫ row
Python). ``TokenRunsUDTF`` therefore exists as API-surface
coverage with a codegen'd production twin
(``operators.textquality.token_runs``) that computes the identical
rows with zero Python; both share one DuckDB oracle, which is the
cross-checked proof of equivalence.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf


@udtf(returnType="run_start: int, term: string, run_len: int")
class TokenRunsUDTF:
    """Run-length encoding of a whitespace token stream: one output
    row per maximal run of >= ``min_len`` consecutive equal tokens,
    with the 1-based token offset of the run start."""

    def eval(self, text: str | None, min_len: int):  # noqa: D102
        if text is None:
            return
        toks = text.split(" ")
        start = 1  # 1-based, matches SQL generate_subscripts
        for j in range(2, len(toks) + 2):
            if j == len(toks) + 1 or toks[j - 1] != toks[start - 1]:
                run_len = j - start
                if run_len >= min_len:
                    yield start, toks[start - 1], run_len
                start = j


def register_udtfs(spark: SparkSession) -> None:
    """Idempotently register the UDTF surface for SQL use
    (``SELECT t.* FROM docs d, LATERAL token_runs(d.text, 2) t``)."""
    spark.udtf.register("token_runs", TokenRunsUDTF)
