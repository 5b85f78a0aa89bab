"""Streaming-tier parity queries (SURVEY.md §2.9 watermark row).

These run a REAL watermarked Structured Streaming job
(``readStream`` → ``withWatermark`` → windowed agg → memory sink,
availableNow trigger) and return the sink table, so the driver's
Spark-vs-DuckDB compare checks streaming CORRECTNESS — not just the
pytest parity suite. The oracle is the batch semantics the
incremental engine guarantees for a fully-consumed bounded source:
identical results to the same window aggregate over the static
table.

Extended tier: streaming jobs are stateful side-effecting runs (a
memory sink materializes on the driver — fine for the fixture-sized
sink rows, |windows × types|), so they stay out of the driver's
50-query primary registry; ``oracle_check.py --all`` gates them
every round instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from top_produce_etl_spark.queries import query


@query(
    "stream_tumbling_counts_parity", extended=True,
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_start,
           CAST(date_trunc('day', ts) AS TIMESTAMP) + INTERVAL 1 DAY
               AS window_end,
           event_type,
           COUNT(*) AS n_events
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def stream_tumbling_counts_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling-window counts via the actual streaming
    runtime (streaming/jobs.py:run_windowed_counts_stream): 1-hour
    watermark, 1-day windows, complete-mode memory sink. availableNow
    consumes the whole bounded fixture, so the sink equals the batch
    aggregate — the §2.9 streaming contract, now hash-checked against
    DuckDB instead of only asserted in pytest."""
    from top_produce_etl_spark.streaming.jobs import run_windowed_counts_stream

    return run_windowed_counts_stream(
        spark, sf_dir, sink_table="oracle_stream_counts"
    )


@query(
    "stream_attribution_parity", extended=True,
    oracle="""
    WITH c AS (
        SELECT user_id, event_id AS click_id, ts AS click_ts
        FROM events WHERE event_type = 'click'
    ), p AS (
        SELECT user_id, event_id AS purchase_id, ts AS purchase_ts,
               value AS purchase_value
        FROM events WHERE event_type = 'purchase'
    )
    SELECT p.user_id, p.purchase_id, p.purchase_ts, p.purchase_value,
           c.click_id, c.click_ts
    FROM p JOIN c ON p.user_id = c.user_id
     AND c.click_ts >= p.purchase_ts - INTERVAL 1 HOUR
     AND c.click_ts <  p.purchase_ts
    """,
)
def stream_attribution_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked STREAM-STREAM self-join through the real runtime
    (streaming/jobs.py:purchase_click_attribution_stream): both sides
    buffer state bounded by the 2-hour watermark, append-mode sink.
    The oracle is the identical time-bounded join over the static
    table — inner stream-stream joins emit exactly the matched rows
    once both sides arrive, so a fully-consumed bounded source must
    equal batch row-for-row."""
    from top_produce_etl_spark.streaming.jobs import (
        purchase_click_attribution_stream,
    )

    return purchase_click_attribution_stream(
        spark, sf_dir, sink_table="oracle_stream_attr"
    )


@query(
    "stream_user_totals_parity", extended=True,
    oracle="""
    SELECT user_id, COUNT(*) AS n_events,
           SUM(CAST(CASE WHEN value >= 0 THEN floor(value * 100 + 0.5)
                         ELSE ceil(value * 100 - 0.5) END AS BIGINT))
               / 100.0 AS total_value
    FROM events
    GROUP BY user_id
    """,
)
def stream_user_totals_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSTOM stateful operator through the real runtime
    (streaming/jobs.py:running_user_totals_stream —
    ``applyInPandasWithState``, per-user (count, integer-cents)
    state, update-mode memory sink). The sink holds one emission per
    (user, micro-batch-touching-user); n_events strictly grows per
    emission, so the final state is the per-user max-n row. Because
    state accumulates in per-row HALF_UP integer cents, the final
    totals are independent of micro-batch boundaries and equal the
    batch aggregate — which the DuckDB oracle computes with the
    identical per-row rounding. This closes the last §2.9/§2.10 row
    that was pytest-only (round-3 verdict item #6)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from top_produce_etl_spark.streaming.jobs import (
        running_user_totals_stream,
        stream_events,
    )

    sink = running_user_totals_stream(
        stream_events(spark, sf_dir), sink_table="oracle_stream_totals"
    )
    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    return (
        sink.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


@query(
    "stream_distinct_keys_parity", extended=True,
    oracle="SELECT DISTINCT user_id, event_type FROM events",
)
def stream_distinct_keys_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native streaming dedup (dropDuplicatesWithinWatermark —
    bounded, watermark-evicted state) through the actual streaming
    runtime, hash-checked against batch DISTINCT. Valid because the
    availableNow fixture run is a single micro-batch: no eviction
    occurs, so stream output == exact distinct (the eviction trade
    is documented on the job)."""
    from top_produce_etl_spark.streaming.jobs import distinct_event_keys_stream

    return distinct_event_keys_stream(
        spark, sf_dir, sink_table="oracle_stream_distinct"
    )


@query(
    "stream_outer_attribution_parity", extended=True,
    oracle="""
    SELECT p.user_id, p.purchase_id, c.click_id
    FROM (
        SELECT user_id, event_id AS purchase_id, ts AS purchase_ts
        FROM events WHERE event_type = 'purchase'
    ) p
    LEFT JOIN (
        SELECT user_id AS c_user, event_id AS click_id, ts AS click_ts
        FROM events WHERE event_type = 'click'
    ) c
      ON p.user_id = c.c_user
     AND c.click_ts >= p.purchase_ts - INTERVAL 1 DAY
     AND c.click_ts < p.purchase_ts
    WHERE p.purchase_ts <= (SELECT MAX(ts) FROM events) - INTERVAL 2 DAY
    """,
)
def stream_outer_attribution_parity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """LEFT OUTER watermarked stream-stream join through the real
    streaming runtime — unmatched purchases held in state until the
    watermark proves no click can arrive, then emitted with NULLs.

    Parity is asserted on the provably-CLOSED region: purchases in
    the final watermark window are legitimately unemittable at
    termination (see the job docstring), so BOTH engines filter to
    purchase_ts ≤ max(ts) − 2 days (≫ the 1 h watermark delay) and
    match exactly there."""
    from top_produce_etl_spark.io.sources import load_table
    from top_produce_etl_spark.streaming.jobs import (
        purchase_click_outer_attribution_stream,
    )

    sink = purchase_click_outer_attribution_stream(
        spark, sf_dir, sink_table="oracle_stream_outer_attr"
    )
    bound = (
        load_table(spark, sf_dir, "events")
        .agg(F.max("ts").alias("m"))
        .first()
        .m
    )
    import datetime as dt

    return sink.filter(
        F.col("purchase_ts") <= F.lit(bound - dt.timedelta(days=2))
    ).select("user_id", "purchase_id", "click_id")


@query(
    "stream_session_windows_parity", extended=True,
    oracle="""
    WITH marked AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                      OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
        SELECT user_id, ts,
               SUM(new_sess) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING
               ) AS sess_id
        FROM marked
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           COUNT(*) AS n_events
    FROM numbered
    GROUP BY user_id, sess_id
    """,
)
def stream_session_windows_parity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """SESSION windows through the real streaming runtime
    (streaming/jobs.py:sessionize_stream): state-store-backed
    ``session_window`` aggregation with a 1-hour watermark,
    complete-mode memory sink, availableNow over the bounded
    fixture. The oracle is the same gap-and-island SQL that checks
    the batch session_windows_30m — closing the loop batch =
    stream = oracle for the §2.9 session row (tumbling, join,
    stateful, dedup, and outer-join parities already have theirs)."""
    from top_produce_etl_spark.streaming.jobs import (
        sessionize_stream,
        stream_events,
    )

    events = stream_events(spark, sf_dir)
    return sessionize_stream(
        events, sink_table="oracle_stream_sessions"
    )


@query(
    "stream_countmin_parity", extended=True,
    oracle=__import__(
        "top_produce_etl_spark.operators.countmin",
        fromlist=["cms_cells_oracle_sql"],
    ).cms_cells_oracle_sql("events", "user_id"),
)
def stream_countmin_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch maintained by Structured Streaming
    (streaming/jobs.py:run_cms_stream): the incremental engine's
    bounded state (≤ depth × width cells) after consuming the whole
    fixture must equal the batch-built sketch — and the oracle is
    DuckDB re-deriving the same cells from the portable hash, so
    this one query pins streaming parity AND cross-engine
    determinism of the sketch at once."""
    from top_produce_etl_spark.streaming.jobs import run_cms_stream

    return run_cms_stream(spark, sf_dir, sink_table="oracle_stream_cms")


_KMV_UDAY_SPARK = (
    "concat(CAST(user_id AS STRING), '@', CAST(CAST(ts AS DATE) AS STRING))"
)
_KMV_UDAY_DUCK = (
    "concat(CAST(user_id AS VARCHAR), '@', "
    "CAST(CAST(ts AS DATE) AS VARCHAR))"
)


@query(
    "stream_kmv_parity", extended=True,
    oracle=f"""
    WITH sk AS ({__import__(
        "top_produce_etl_spark.operators.kmv",
        fromlist=["kmv_sketch_oracle_sql"],
    ).kmv_sketch_oracle_sql("events", ["event_type"], _KMV_UDAY_DUCK)})
    SELECT event_type, h FROM sk
    """,
)
def stream_kmv_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV distinct sketch maintained by Structured Streaming via a
    CUSTOM state machine (streaming/jobs.py:run_kmv_stream —
    ``applyInPandasWithState``; the k-min set is not a built-in
    streaming aggregate, unlike the CMS/DDSketch SUM cells). The
    final per-type k-min hash sets after consuming the whole fixture
    must equal the batch kmv_sketch rows — and the oracle is DuckDB
    re-deriving them from the portable hash, pinning streaming
    parity AND cross-engine determinism at once. Final state = the
    max-``n_seen`` emission per key (update-mode sink contract)."""
    from pyspark.sql import Window

    from top_produce_etl_spark.streaming.jobs import run_kmv_stream

    sink = run_kmv_stream(
        spark, sf_dir, _KMV_UDAY_SPARK, sink_table="oracle_stream_kmv"
    )
    w = Window.partitionBy("event_type")
    return (
        sink.withColumn("__mx", F.max("n_seen").over(w))
        .filter(F.col("n_seen") == F.col("__mx"))
        .select("event_type", "h")
        .distinct()
    )


@query(
    "stream_restart_recovery_parity", extended=True,
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_start,
           CAST(date_trunc('day', ts) AS TIMESTAMP) + INTERVAL 1 DAY
               AS window_end,
           event_type,
           COUNT(*) AS n_events
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def stream_restart_recovery_parity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Checkpoint-RESTART semantics through the real runtime (r6
    verdict #4; streaming/jobs.py::restart_recovery_windowed_counts):
    the watermarked day-window aggregation consumes half its input,
    terminates, and a new query resumes from the checkpoint over the
    rest — the crash/redeploy shape. The committed sink after the
    restart must hash-equal the batch aggregate over the whole
    fixture: state restored, every window exactly once."""
    import shutil
    import tempfile

    from top_produce_etl_spark.streaming.jobs import (
        restart_recovery_windowed_counts,
    )

    work = tempfile.mkdtemp(prefix="stream_recovery_")
    try:
        out = restart_recovery_windowed_counts(
            spark, sf_dir, work, n_slices=6, phase1_slices=3
        )
        # materialize before the workdir vanishes
        rows = out.collect()
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return spark.createDataFrame(rows, out.schema)


def _STREAM_NORM_DEDUP_ORACLE() -> str:
    from top_produce_etl_spark.operators.dedup import (
        normalize_for_dedup_sql,
    )

    key = normalize_for_dedup_sql("text")
    return f"""
    WITH base AS (SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0),
    variants AS (
        SELECT text FROM base
        UNION ALL
        SELECT '  ' || upper(text) || ' -- 2024, !!! (99)   ' FROM base
    )
    SELECT DISTINCT {key} AS norm_key FROM variants
    """


@query(
    "stream_normalized_dedup_parity", extended=True,
    oracle=_STREAM_NORM_DEDUP_ORACLE(),
)
def stream_normalized_dedup_parity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CCNet-normalized dedup through the REAL streaming runtime
    (round 9 — streaming/jobs.py:normalized_dedup_stream): cosmetic
    twins are planted inside the streaming plan, the normalized key
    derives at line rate, and streaming ``dropDuplicates`` emits each
    key once. availableNow consumes the bounded fixture, so the sink
    must equal batch DISTINCT over the identical normalization —
    which DuckDB re-derives character-for-character. Extends the r9
    normalization family to §2.9."""
    from top_produce_etl_spark.streaming.jobs import (
        normalized_dedup_stream,
    )

    return normalized_dedup_stream(
        spark, sf_dir, sink_table="oracle_stream_norm_dedup"
    )


def _STREAM_LANGID_ORACLE() -> str:
    from top_produce_etl_spark.operators.langid import (
        synthesize_lang_corpus_oracle,
        train_langid_oracle_sql,
    )

    final = """SELECT s.id, l.lang_true AS lang_true,
           s.lang AS pred_lang, s.z_micro
    FROM (
        SELECT f.id, w.lang, SUM(f.c * w.w_micro) AS z_micro,
               ROW_NUMBER() OVER (PARTITION BY f.id
                   ORDER BY SUM(f.c * w.w_micro) DESC, w.lang) AS rn
        FROM feats f JOIN w3 w USING (bucket)
        GROUP BY f.id, w.lang
    ) s JOIN labels l USING (id)
    WHERE s.rn = 1"""
    return train_langid_oracle_sql(
        "lang_corpus", iters=3, final_select=final,
        pre_ctes=(
            "lang_corpus AS "
            f"({synthesize_lang_corpus_oracle('documents')})"
        ),
    )


@query(
    "stream_langid_scoring_parity", extended=True,
    oracle=_STREAM_LANGID_ORACLE(),
)
def stream_langid_scoring_parity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Language identification through the REAL streaming runtime
    (round 10): model trained batch-side, scoring as the ZERO-SHUFFLE
    expression fold (stateless, hence streaming-legal — the
    aggregate scorer's chained groupBys are not), availableNow over
    the bounded fixture. Every (doc, true lang, prediction, winning
    z) row hash-matches the DuckDB derivation that re-trains the
    model in unrolled CTEs and replays the argmax — train + serve
    proven equivalent across batch, stream, and oracle. Extends the
    r10 langid family to §2.9."""
    from top_produce_etl_spark.streaming.jobs import (
        langid_scoring_stream,
    )

    return langid_scoring_stream(
        spark, sf_dir, sink_table="oracle_stream_langid"
    )


# --- Frozen-cutoff bucket streaming parity (round 11) ---

def _STREAM_FROZEN_ORACLE() -> str:
    from top_produce_etl_spark.operators.textquality import (
        frozen_buckets_oracle_ctes,
    )

    return f"""
    WITH {frozen_buckets_oracle_ctes()}
    SELECT doc_id, lang,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(mean_info_micro AS BIGINT) AS mean_info_micro,
           ppl_bucket
    FROM frozen_buckets
    """


@query(
    "stream_frozen_buckets_parity", extended=True,
    oracle=_STREAM_FROZEN_ORACLE(),
)
def stream_frozen_buckets_parity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Frozen-cutoff CCNet bucketing through the REAL streaming
    runtime (round 11, the r10 verdict #4 streaming leg): reference
    LM + cutoff pairs trained batch-side, scoring and bucketing as
    zero-shuffle expression folds (stateless → streaming-legal),
    availableNow over the bounded fixture. Every per-document row
    hash-matches the DuckDB oracle that re-derives the whole frozen
    lifecycle in SQL — batch train, stream serve, and oracle proven
    equivalent."""
    from top_produce_etl_spark.streaming.jobs import (
        frozen_bucket_stream,
    )

    return frozen_bucket_stream(
        spark, sf_dir, sink_table="oracle_stream_frozen_buckets"
    )


# --- HTML extraction streaming parity (round 11) ---

def _STREAM_HTML_ORACLE() -> str:
    from top_produce_etl_spark.operators.html import (
        extract_html_text_oracle,
        synthesize_html_docs_oracle,
    )

    return f"""
    WITH h AS ({synthesize_html_docs_oracle()}),
    x AS (SELECT doc_id,
                 {extract_html_text_oracle('html')} AS text
          FROM h)
    SELECT doc_id, text,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(length(text)
                - length(replace(text, chr(10), '')) + 1
                AS BIGINT) AS n_lines
    FROM x
    """


@query(
    "stream_html_extract_parity", extended=True,
    oracle=_STREAM_HTML_ORACLE(),
)
def stream_html_extract_parity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Crawl step 0 through the REAL streaming runtime (round 11):
    HTML→text is pure chained regexp_replace — stateless, zero
    state store — so the same operator that batch-processes a
    100 TB crawl archive serves the live fetch stream unchanged.
    availableNow over the bounded fixture; every per-document row
    (full extracted string included) hash-matches the DuckDB
    replay."""
    from top_produce_etl_spark.streaming.jobs import (
        html_extract_stream,
    )

    return html_extract_stream(
        spark, sf_dir, sink_table="oracle_stream_html_extract"
    )


# --- robots gating streaming parity (round 11) ---

def _STREAM_ROBOTS_ORACLE() -> str:
    from top_produce_etl_spark.operators.robots import (
        robots_oracle_ctes,
    )

    return f"""
    WITH {robots_oracle_ctes('documents')}
    SELECT doc_id, domain, path, allowed,
           CAST(matched_len AS INT) AS matched_len
    FROM robots_verdicts
    """


@query(
    "stream_robots_gate_parity", extended=True,
    oracle=_STREAM_ROBOTS_ORACLE(),
)
def stream_robots_gate_parity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """robots.txt gating on the live crawl frontier (round 11): the
    RFC 9309 verdicts become a STATIC per-(domain, path) dimension
    (recomputed when robots change — the production cadence) and
    the URL stream joins it as a stream-static broadcast join,
    append-legal with zero state store. availableNow over the
    bounded fixture; every per-URL row hash-matches the batch
    oracle that re-derives parse, translation and matching."""
    from top_produce_etl_spark.streaming.jobs import (
        robots_gate_stream,
    )

    return robots_gate_stream(
        spark, sf_dir, sink_table="oracle_stream_robots_gate"
    )
