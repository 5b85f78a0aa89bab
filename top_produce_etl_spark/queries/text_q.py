"""Text-analysis queries (SURVEY.md §2.11) over ``documents``:
token statistics, quality scoring, language-ID heuristic, document
fingerprinting. All pure column expressions (no UDFs)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from top_produce_etl_spark.functions.text import (
    LANG_MARKERS,
    predict_lang,
    quality_features,
    quality_score,
)
from top_produce_etl_spark.io.sources import load_table
from top_produce_etl_spark.operators.retrieval import (
    bm25_oracle_sql,
    bm25_scores,
    tfidf_oracle_sql,
    tfidf_top_terms,
)
from top_produce_etl_spark.queries import query


def _marker_sql(markers: tuple[str, ...]) -> str:
    lst = ", ".join(f"'{m}'" for m in markers)
    return f"len(list_filter(string_split(text, ' '), t -> t IN ({lst})))"


@query(
    "text_stats", extended=True,
    oracle=f"""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           length(text)                 AS n_chars_obs,
           CAST(length(replace(text, ' ', '')) AS DOUBLE)
               / len(string_split(text, ' ')) AS avg_token_len,
           CAST({_marker_sql(LANG_MARKERS["en"])} AS DOUBLE)
               / len(string_split(text, ' ')) AS stopword_ratio,
           CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
               / len(string_split(text, ' ')) AS distinct_token_ratio
    FROM documents
    """,
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    feats = quality_features("text")
    return docs.select(
        "doc_id",
        feats["n_tokens"].alias("n_tokens"),
        feats["n_chars_obs"].alias("n_chars_obs"),
        feats["avg_token_len"].alias("avg_token_len"),
        feats["stopword_ratio"].alias("stopword_ratio"),
        feats["distinct_token_ratio"].alias("distinct_token_ratio"),
    )


@query(
    "quality_scores", extended=True,
    oracle=f"""
    SELECT doc_id,
           least(len(string_split(text, ' ')) / 64.0, 1.0) * 0.4
           + (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
              / len(string_split(text, ' '))) * 0.4
           + greatest(0.0, 1.0 - (CAST({_marker_sql(LANG_MARKERS["en"])} AS DOUBLE)
              / len(string_split(text, ' '))) * 2.0) * 0.2 AS quality
    FROM documents
    """,
)
def quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", quality_score("text").alias("quality"))


@query(
    "lang_id_heuristic", extended=True,
    oracle=f"""
    WITH scores AS (
        SELECT doc_id, lang,
               {_marker_sql(LANG_MARKERS["en"])} AS s_en,
               {_marker_sql(LANG_MARKERS["es"])} AS s_es,
               {_marker_sql(LANG_MARKERS["de"])} AS s_de
        FROM documents
    )
    SELECT doc_id, lang AS actual_lang,
           CASE WHEN s_en >= s_es AND s_en >= s_de AND s_en > 0 THEN 'en'
                WHEN s_es >= s_de AND s_es > 0 THEN 'es'
                WHEN s_de > 0 THEN 'de'
                ELSE 'other' END AS predicted_lang
    FROM scores
    """,
)
def lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-list language-ID (mechanism demo on synthetic text —
    see functions.text.LANG_MARKERS)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.col("lang").alias("actual_lang"),
        predict_lang("text").alias("predicted_lang"),
    )


@query(
    "doc_fingerprints", extended=True,
    oracle="""
    SELECT doc_id, md5(lower(trim(text))) AS fingerprint
    FROM documents
    """,
)
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprint over normalized text (md5 — one of the
    few hash functions both engines share bit-for-bit)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", F.md5(F.lower(F.trim(F.col("text")))).alias("fingerprint")
    )


@query(
    "regex_token_count", extended=True,
    oracle="""
    SELECT doc_id,
           len(regexp_extract_all(text, '[a-z]+')) AS n_word_tokens
    FROM documents
    """,
)
def regex_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex-based token counting (BPE-ish pre-tokenization shape)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(F.expr("regexp_extract_all(text, '[a-z]+', 0)")).alias(
            "n_word_tokens"
        ),
    )


@query(
    "quality_weighted_sample", extended=True,
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, lang, n_chars,
               least(len(string_split(text, ' ')) / 64.0, 1.0) * 0.4
               + (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                  / len(string_split(text, ' '))) * 0.4
               + greatest(0.0, 1.0
                  - (CAST({{marker}} AS DOUBLE)
                     / len(string_split(text, ' '))) * 2.0) * 0.2 AS quality,
               ((doc_id * 2654435761) % 4294967296) / 4294967296.0 AS u
        FROM documents
    )
    SELECT doc_id, lang, n_chars, quality FROM scored WHERE u < quality
    """.replace("{marker}", _marker_sql(LANG_MARKERS["en"])),
)
def quality_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted downsampling: keep each document with
    probability equal to its quality score, decided by a
    DETERMINISTIC per-doc uniform (Knuth multiplicative hash of the
    id) instead of an RNG — reproducible across engines, retries,
    and partitionings, auditable after the fact (the curation
    primitive behind 'sample better data more'). Entirely narrow:
    no shuffle, predicate evaluates at the scan."""
    docs = load_table(spark, sf_dir, "documents")
    u = ((F.col("doc_id") * F.lit(2654435761)) % F.lit(4294967296)) / F.lit(
        4294967296.0
    )
    return (
        docs.select(
            "doc_id", "lang", "n_chars",
            quality_score("text").alias("quality"),
            u.alias("__u"),
        )
        .filter(F.col("__u") < F.col("quality"))
        .drop("__u")
    )


# Query terms for the BM25 demo queries: all present in the synthetic
# corpus vocabulary; scores then discriminate by tf and doc length.
BM25_TERMS = ["spark", "join", "window"]


@query(
    "bm25_topk", extended=True,
    oracle=(
        bm25_oracle_sql(BM25_TERMS)
        + " ORDER BY score_scaled DESC, doc_id LIMIT 20"
    ),
)
def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 documents by BM25 relevance to a fixed query — ranked
    retrieval over the corpus with only broadcast state (see
    operators/retrieval.py): one 1-row stats aggregate, narrow
    per-row scoring, global top-k via orderBy+limit
    (TakeOrderedAndProject — no full sort, no extra exchange).
    Fixed-point scores make the cross-engine hash exact."""
    docs = load_table(spark, sf_dir, "documents")
    return bm25_scores(docs, "doc_id", "text", BM25_TERMS).orderBy(
        F.desc("score_scaled"), F.asc("doc_id")
    ).limit(20)


@query("tfidf_top_terms", oracle=tfidf_oracle_sql(), extended=True)
def tfidf_top_terms_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 characteristic terms per document by smoothed TF-IDF:
    the (doc, term) matrix earns one wide shuffle; document
    frequencies broadcast back at |vocabulary| size so the matrix
    never re-shuffles (operators/retrieval.py)."""
    docs = load_table(spark, sf_dir, "documents")
    return tfidf_top_terms(docs, "doc_id", "text", top_k=3)


_SPLIT_FRACTIONS = {"train": 0.9, "val": 0.05, "test": 0.05}


def _split_oracle() -> str:
    from top_produce_etl_spark.operators.splits import split_oracle_sql

    return f"""
    SELECT doc_id,
           {split_oracle_sql("doc_id", _SPLIT_FRACTIONS)} AS split
    FROM documents
    """


@query("train_val_test_split", oracle=_split_oracle(), extended=True)
def train_val_test_split_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic, append-stable train/val/test assignment
    (operators/splits.py): bucket = portable hash of (salt || doc_id)
    so a document's split never changes as the corpus grows — the
    contamination-safety property a row_number split lacks. Narrow
    codegen'd expression, zero shuffle; the DuckDB oracle computes
    the identical label from the identical hash."""
    from top_produce_etl_spark.operators.splits import assign_split

    docs = load_table(spark, sf_dir, "documents")
    return assign_split(docs, "doc_id", _SPLIT_FRACTIONS).select("doc_id", "split")


def _fold_oracle() -> str:
    from top_produce_etl_spark.operators.splits import fold_oracle_sql

    return f"""
    SELECT doc_id, {fold_oracle_sql("doc_id", 5)} AS fold
    FROM documents
    """


@query("cv_fold_assignment", oracle=_fold_oracle(), extended=True)
def cv_fold_assignment_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 5-fold cross-validation assignment
    (operators/splits.py): fold = portable-hash bucket mod k —
    append-stable and salted like the train/val/test split, fully
    oracle-checked via the shared portable hash."""
    from top_produce_etl_spark.operators.splits import assign_fold

    docs = load_table(spark, sf_dir, "documents")
    return assign_fold(docs, "doc_id", k=5).select("doc_id", "fold")


# --------------------------------------------------------------------------
# Split ⨉ contamination composition (round-3 verdict item #5): prove
# that after assigning the deterministic split and removing every
# train document that shares ANY k-shingle with the test split, the
# residual train/test shingle overlap is exactly zero. The proof is
# computed, not assumed — the `residual_overlap_pairs` metric re-runs
# the overlap join on the decontaminated corpus and must hash-match
# the oracle's 0.
# --------------------------------------------------------------------------

DECONTAM_K = 3  # same width rationale as packs.CONTAM_K


def _decontam_oracle() -> str:
    from top_produce_etl_spark.operators.splits import split_oracle_sql

    split = split_oracle_sql("doc_id", _SPLIT_FRACTIONS)
    return f"""
    WITH labeled AS (
        SELECT doc_id, text, {split} AS split FROM documents
    ), toks AS (
        SELECT doc_id, split, string_split(text, ' ') AS t
        FROM labeled WHERE split IN ('train', 'test')
    ), sh AS (
        SELECT DISTINCT doc_id, split,
               array_to_string(t[i:i+{DECONTAM_K - 1}], ' ') AS shingle
        FROM toks, unnest(range(1, len(t) - {DECONTAM_K - 2})) r(i)
        WHERE len(t) >= {DECONTAM_K}
    ), tr AS (
        SELECT doc_id AS train_id, shingle FROM sh WHERE split = 'train'
    ), te AS (
        SELECT doc_id AS test_id, shingle FROM sh WHERE split = 'test'
    ), contaminated AS (
        SELECT DISTINCT train_id FROM tr JOIN te USING (shingle)
    ), clean_tr AS (
        SELECT * FROM tr
        WHERE train_id NOT IN (SELECT train_id FROM contaminated)
    )
    SELECT 'train_docs' AS metric, COUNT(*) AS value
    FROM labeled WHERE split = 'train'
    UNION ALL
    SELECT 'test_docs', COUNT(*) FROM labeled WHERE split = 'test'
    UNION ALL
    SELECT 'contaminated_train_docs', COUNT(*) FROM contaminated
    UNION ALL
    SELECT 'residual_overlap_pairs', COUNT(*)
    FROM clean_tr JOIN te USING (shingle)
    """


@query("split_decontamination_check", oracle=_decontam_oracle(), extended=True)
def split_decontamination_check_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compose assign_split + contamination into the guarantee a
    training pipeline actually needs: ZERO shingle overlap between
    the decontaminated train split and the test split.

    Scale shape: the split label is a narrow zero-shuffle
    expression; the shingle inverted index is built ONCE and
    persisted (dedup.py convention — released via
    ``operators.dedup.unpersist_all``), and the train⨝test overlap
    join runs ONCE: ``contaminated`` is its distinct train side and
    ``residual`` is the same pair set anti-joined against the
    removal list (provably empty — the query computes it rather
    than asserts it). The small TEST shingle side and the
    contaminated-id set ride size-gated broadcasts; no all-pairs
    joins anywhere.
    """
    from top_produce_etl_spark.operators.dedup import _persist
    from top_produce_etl_spark.operators.joins import maybe_broadcast
    from top_produce_etl_spark.operators.splits import assign_split

    docs = assign_split(
        load_table(spark, sf_dir, "documents"), "doc_id", _SPLIT_FRACTIONS
    )
    # staged tokenization: see functions.text.shingles_of inlining note
    from top_produce_etl_spark.functions.text import shingles_of, tokens

    sh = _persist(
        docs.filter(F.col("split").isin("train", "test"))
        .select("doc_id", "split", tokens("text").alias("__toks"))
        .select(
            "doc_id",
            "split",
            F.explode(
                F.array_distinct(shingles_of(F.col("__toks"), DECONTAM_K))
            ).alias("shingle"),
        )
    )
    train_sh = sh.filter(F.col("split") == "train").select(
        F.col("doc_id").alias("train_id"), "shingle"
    )
    test_sh = sh.filter(F.col("split") == "test").select(
        F.col("doc_id").alias("test_id"), "shingle"
    )
    overlap = _persist(
        train_sh.join(maybe_broadcast(test_sh), "shingle").select(
            "train_id", "test_id"
        )
    )
    contaminated = overlap.select("train_id").distinct()
    residual = overlap.join(
        maybe_broadcast(contaminated), "train_id", "left_anti"
    )

    def metric(name: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("value")).select(
            F.lit(name).alias("metric"), "value"
        )

    return (
        metric("train_docs", docs.filter(F.col("split") == "train"))
        .unionByName(metric("test_docs", docs.filter(F.col("split") == "test")))
        .unionByName(metric("contaminated_train_docs", contaminated))
        .unionByName(metric("residual_overlap_pairs", residual))
    )


# Shared oracle for both token-run queries (column-expression twin
# and native Python UDTF): gaps-and-islands — a run is a maximal
# group where position minus per-(doc,term) rank is constant.
TOKEN_RUNS_ORACLE = """
WITH s AS (
    SELECT doc_id, string_split(text, ' ') AS a FROM documents
), toks AS (
    SELECT doc_id, unnest(a) AS term, generate_subscripts(a, 1) AS i
    FROM s
), g AS (
    SELECT doc_id, term, i,
           i - ROW_NUMBER() OVER (PARTITION BY doc_id, term ORDER BY i) AS grp
    FROM toks
)
SELECT doc_id,
       CAST(MIN(i) AS INT)      AS run_start,
       term,
       CAST(COUNT(*) AS INT)    AS run_len
FROM g
GROUP BY doc_id, term, grp
HAVING COUNT(*) >= 2
"""


@query("token_runs_expr", oracle=TOKEN_RUNS_ORACLE, extended=True)
def token_runs_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Localized repetition: run-length encoding of each document's
    token stream (runs of >= 2 equal consecutive tokens) via pure
    higher-order array expressions — the zero-shuffle production
    path (operators/textquality.py:token_runs)."""
    from top_produce_etl_spark.operators.textquality import token_runs

    docs = load_table(spark, sf_dir, "documents")
    return token_runs(docs, "doc_id", "text", min_len=2)


@query("token_runs_udtf", oracle=TOKEN_RUNS_ORACLE, extended=True)
def token_runs_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same rows through the native Python UDTF surface
    (functions/udtfs.py:TokenRunsUDTF) called from SQL in a LATERAL
    correlated position — SURVEY §2.10 row-explode UDTF coverage.
    Hash-matching the column-expression twin's oracle is the proof
    the two paths are equivalent."""
    from top_produce_etl_spark.functions.udtfs import register_udtfs

    docs = load_table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("__token_runs_docs")
    register_udtfs(spark)
    return spark.sql(
        """
        SELECT d.doc_id, t.run_start, t.term, t.run_len
        FROM __token_runs_docs d, LATERAL token_runs(d.text, 2) t
        """
    )


from top_produce_etl_spark.operators.retrieval import surprisal_oracle_sql


@query("unigram_surprisal_scores", extended=True, oracle=surprisal_oracle_sql())
def unigram_surprisal_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM surprisal quality proxy (integer micro-nat fixed
    point; operators/retrieval.py:unigram_surprisal)."""
    from top_produce_etl_spark.operators.retrieval import unigram_surprisal

    docs = load_table(spark, sf_dir, "documents")
    return unigram_surprisal(docs, "doc_id", "text")


MIX_WEIGHTS = {"en": 40, "de": 20, "es": 20, "fr": 10, "zh": 10}


def _mix_query(strategy: str):
    from top_produce_etl_spark.operators.mixture import rebalance_mixture

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = load_table(spark, sf_dir, "documents")
        return rebalance_mixture(
            docs, "lang", "doc_id", MIX_WEIGHTS, strategy=strategy
        ).select("doc_id", "lang")

    fn.__name__ = f"mixture_rebalance_{strategy}"
    fn.__doc__ = (
        "Deterministic data-mixture rebalancing to target language "
        f"proportions, {strategy} strategy (operators/mixture.py)."
    )
    return fn


from top_produce_etl_spark.operators.mixture import mixture_oracle_sql

query(
    "mixture_rebalance_hash", extended=True,
    oracle=mixture_oracle_sql(MIX_WEIGHTS, "lang", "doc_id", strategy="hash"),
)(_mix_query("hash"))
query(
    "mixture_rebalance_exact", extended=True,
    oracle=mixture_oracle_sql(MIX_WEIGHTS, "lang", "doc_id", strategy="exact"),
)(_mix_query("exact"))


def _curation_oracle() -> str:
    from top_produce_etl_spark.operators.retrieval import (
        surprisal_oracle_sql,
    )

    quality = """
        least(len(string_split(text, ' ')) / 64.0, 1.0) * 0.4
        + (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
           / len(string_split(text, ' '))) * 0.4
        + greatest(0.0, 1.0
            - (CAST({stop} AS DOUBLE)
               / len(string_split(text, ' '))) * 2.0) * 0.2
    """.format(stop=_marker_sql(LANG_MARKERS["en"]))
    grams = (
        "list_transform(range(1, len(string_split(text,' ')) - 1), "
        "i -> array_to_string(string_split(text,' ')[i:i+2], ' '))"
    )
    return f"""
    WITH sup AS ({surprisal_oracle_sql()}),
    sig AS (
        SELECT d.doc_id,
               CASE WHEN s_en >= s_es AND s_en >= s_de AND s_en > 0 THEN 'en'
                    WHEN s_es >= s_de AND s_es > 0 THEN 'es'
                    WHEN s_de > 0 THEN 'de'
                    ELSE 'other' END AS plang,
               ({quality}) AS quality,
               CASE WHEN len({grams}) > 0
                    THEN CAST(len({grams})
                              - len(list_distinct({grams})) AS DOUBLE)
                         / len({grams})
                    ELSE 0.0 END AS dupfrac,
               sup.mean_info_micro AS info
        FROM (
            SELECT doc_id, text,
                   {_marker_sql(LANG_MARKERS["en"])} AS s_en,
                   {_marker_sql(LANG_MARKERS["es"])} AS s_es,
                   {_marker_sql(LANG_MARKERS["de"])} AS s_de
            FROM documents
        ) d JOIN sup ON d.doc_id = sup.doc_id
    )
    SELECT doc_id,
           (plang = 'en' AND quality >= 0.65 AND dupfrac <= 0.05
            AND info <= 3450000) AS keep,
           concat_ws(',',
               CASE WHEN plang <> 'en' THEN 'lang' END,
               CASE WHEN quality < 0.65 THEN 'quality' END,
               CASE WHEN dupfrac > 0.05 THEN 'repetition' END,
               CASE WHEN info > 3450000 THEN 'entropy' END
           ) AS fail_reasons
    FROM sig
    """


@query("curation_funnel", extended=True, oracle=_curation_oracle())
def curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation pipeline END-TO-END in one oracle-checked query:
    language-ID × quality score × duplicate-3-gram repetition ×
    unigram surprisal, composed into a keep/drop decision with
    per-rule failure attribution (the audit trail a data-curation
    run must emit — 'dropped: quality,entropy' beats a bare boolean).

    Composition is the point: every signal is an already-verified
    operator (predict_lang, quality_score, repetition_stats'
    dup-fraction, unigram_surprisal), and the only shuffle is the
    surprisal (doc, term) aggregate — the narrow signals ride the
    same scan. Thresholds chosen at the fixture's median so both
    branches of every rule are exercised. Delegates to the reusable
    operator (operators/textquality.py::curation_funnel), which is
    also the config surface: the same funnel is YAML-drivable via
    plans/builder.py's "curation_funnel" op and
    configs/config_curation.yaml, sharing this oracle."""
    from top_produce_etl_spark.operators.textquality import curation_funnel

    docs = load_table(spark, sf_dir, "documents")
    return curation_funnel(
        docs, "doc_id", "text", lang="en", min_quality=0.65,
        max_dup_ngram_frac=0.05, max_mean_info_micro=3_450_000, ngram=3,
    )


@query(
    "tokenizer_fertility_by_lang", extended=True,
    oracle="""
    SELECT lang,
           COUNT(*) AS n_docs,
           SUM(len(string_split(text, ' '))) AS n_tokens,
           CAST(round(
               CAST(SUM(length(text)) AS DOUBLE)
               / CAST(SUM(len(string_split(text, ' '))) AS DOUBLE)
               * 1000000) AS BIGINT) AS chars_per_token_micro,
           CAST(round(
               CAST(SUM(octet_length(CAST(text AS BLOB))) AS DOUBLE)
               / CAST(SUM(len(string_split(text, ' '))) AS DOUBLE)
               * 1000000) AS BIGINT) AS bytes_per_token_micro
    FROM documents GROUP BY lang
    """,
)
def tokenizer_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per language — chars/token and
    bytes/token, THE capacity-planning ratio for token budgets
    (bytes-per-token varies 2-4x across languages for BPE
    vocabularies; here whitespace tokens over the synthetic corpus
    demonstrate the measurement). Integer sums → fixed double tree →
    1e6 fixed point; one hash-agg shuffle on lang."""
    docs = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.split("text", " "))
    agg = docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(n_tok.cast("bigint")).alias("n_tokens"),
        F.sum(F.length("text").cast("bigint")).alias("__chars"),
        F.sum(F.octet_length("text").cast("bigint")).alias("__bytes"),
    )
    def ratio(num):
        return (
            F.round(
                F.col(num).cast("double")
                / F.col("n_tokens").cast("double")
                * 1_000_000
            ).cast("bigint")
        )
    return agg.select(
        "lang", "n_docs", "n_tokens",
        ratio("__chars").alias("chars_per_token_micro"),
        ratio("__bytes").alias("bytes_per_token_micro"),
    )


def _WRS_ORACLE() -> str:
    from top_produce_etl_spark.operators.splits import (
        weighted_reservoir_rank_sql,
    )

    rank = weighted_reservoir_rank_sql(
        "o_orderkey", "o_totalprice", partition_sql="o_orderpriority"
    )
    return f"""
    SELECT o_orderkey, o_orderpriority,
           CAST(o_totalprice AS DOUBLE) AS price
    FROM (
        SELECT o_orderkey, o_orderpriority, o_totalprice,
               {rank} AS rn
        FROM orders
    )
    WHERE rn <= 50
    """


@query("weighted_sample_orders", extended=True, oracle=_WRS_ORACLE())
def weighted_sample_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly 50 orders per priority class, sampled WITHOUT
    replacement with inclusion probability ∝ o_totalprice
    (operators/splits.py::weighted_reservoir — the Efraimidis-
    Spirakis exponential race on a salted portable hash). The
    deterministic counterpart of `df.sample()` for spend-weighted
    audits: same 50 rows on any engine, partitioning, or retry."""
    from top_produce_etl_spark.operators.splits import weighted_reservoir

    orders = load_table(spark, sf_dir, "orders")
    out = weighted_reservoir(
        orders, "o_orderkey", "o_totalprice", 50,
        group_cols=["o_orderpriority"],
    )
    return out.select(
        "o_orderkey",
        "o_orderpriority",
        F.col("o_totalprice").cast("double").alias("price"),
    )


@query(
    "strip_boilerplate_docs", extended=True,
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), chunks AS (
        SELECT doc_id, CAST(i AS INT) AS pos,
               array_to_string(t[i*4+1 : i*4+4], ' ') AS chunk
        FROM toks, unnest(range(0, CAST(ceil(len(t) / 4.0) AS BIGINT))) r(i)
    ), dfreq AS (
        SELECT chunk, COUNT(DISTINCT doc_id) AS d FROM chunks GROUP BY 1
    ), flagged AS (
        SELECT c.doc_id, c.pos, c.chunk, (d.d >= 2) AS is_boiler
        FROM chunks c JOIN dfreq d USING (chunk)
    )
    SELECT doc_id AS id,
           coalesce(
               string_agg(chunk, ' ' ORDER BY pos)
                   FILTER (WHERE NOT is_boiler),
               '') AS cleaned_text,
           COUNT(*) AS n_chunks,
           SUM(CASE WHEN is_boiler THEN 1 ELSE 0 END) AS n_removed
    FROM flagged
    GROUP BY doc_id
    """,
)
def strip_boilerplate_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus boilerplate removal over documents: 4-token chunks seen
    in ≥2 documents are deleted, text reassembled in order
    (operators/textquality.py::strip_boilerplate). The REWRITE
    counterpart of shingle_novelty_scores' scoring — same repeated-
    span signal, but producing the cleaned training text."""
    from top_produce_etl_spark.operators.textquality import (
        strip_boilerplate,
    )

    docs = load_table(spark, sf_dir, "documents")
    return strip_boilerplate(docs, "doc_id", "text", 4, 2)


def _bigram_surprisal_oracle() -> str:
    from top_produce_etl_spark.operators.retrieval import (
        bigram_surprisal_oracle_sql,
    )

    return bigram_surprisal_oracle_sql()


@query(
    "bigram_surprisal_scores", extended=True,
    oracle=_bigram_surprisal_oracle(),
)
def bigram_surprisal_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-conditional surprisal quality proxy
    (operators/retrieval.py::bigram_cond_surprisal): flags incoherent
    token SEQUENCES that unigram surprisal can't see — the next rung
    toward LM-perplexity filtering, same micro-nat integer
    determinism contract."""
    from top_produce_etl_spark.operators.retrieval import (
        bigram_cond_surprisal,
    )

    docs = load_table(spark, sf_dir, "documents")
    return bigram_cond_surprisal(docs, "doc_id", "text")


def _HBOW_ORACLE() -> str:
    from top_produce_etl_spark.operators.retrieval import (
        hashed_bow_oracle_sql,
    )

    return hashed_bow_oracle_sql()


@query("hashed_bow_vectors_docs", extended=True, oracle=_HBOW_ORACLE())
def hashed_bow_vectors_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-hashed 32-dim bag-of-words vectors over documents
    (operators/retrieval.py::hashed_bow_vectors): the model-free
    vectorizer that plugs documents into the cosine / k-means /
    standardization stack without a vocabulary table — no second
    shuffle, bounded dimension, exact integer counts."""
    from top_produce_etl_spark.operators.retrieval import (
        hashed_bow_vectors,
    )

    docs = load_table(spark, sf_dir, "documents")
    return hashed_bow_vectors(docs, "doc_id", "text", 32)


def _HBOW_KMEANS_ORACLE() -> str:
    """Stitch the hashed-BOW vectorizer oracle into the unrolled
    Lloyd oracle: the k-means CTE chain reads a synthesized
    ``embeddings`` relation (doc_id → vec) instead of the fixture
    table — proving the text → vector → cluster pipeline end to end
    in ONE cross-engine-exact statement."""
    from top_produce_etl_spark.operators.retrieval import (
        hashed_bow_oracle_sql,
    )
    from top_produce_etl_spark.queries.similarity_q import _kmeans_oracle

    km = _kmeans_oracle(k=8, iters=2)
    bow = hashed_bow_oracle_sql()
    wrapped = km.replace(
        "WITH cents0 AS (",
        "WITH embeddings AS (\n"
        "  SELECT id AS vec_id, vec AS embedding FROM (" + bow + ") __b\n"
        "), cents0 AS (",
        1,
    )
    return f"SELECT vec_id AS doc_id, cluster FROM ({wrapped})"


@query(
    "doc_clusters_hashed_bow", extended=True, oracle=_HBOW_KMEANS_ORACLE()
)
def doc_clusters_hashed_bow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END text clustering with no model and no vocabulary:
    documents → feature-hashed 32-dim count vectors
    (operators/retrieval.py::hashed_bow_vectors) → 2-round Lloyd
    k-means (operators/clustering.py::kmeans_lloyd, k=8). Every
    stage reuses an independently-oracle-checked operator and the
    composed oracle is the two SQL twins stitched together — the
    pattern for verifying whole pipelines, not just operators."""
    from top_produce_etl_spark.operators.clustering import kmeans_lloyd
    from top_produce_etl_spark.operators.retrieval import (
        hashed_bow_vectors,
    )

    from top_produce_etl_spark.operators._cache import persist_tracked

    docs = load_table(spark, sf_dir, "documents")
    # persist the vectorized relation: kmeans_fit reads it once per
    # round plus the init collect and the final assignment — without
    # the persist the explode+aggregate vectorizer re-executes ~4
    # times (the MMR/LPA lesson, see operators/_cache.py)
    bow = persist_tracked(hashed_bow_vectors(docs, "doc_id", "text", 32))
    out = kmeans_lloyd(bow, "id", "vec", k=8, iters=2)
    return out.select(F.col("id").alias("doc_id"), "cluster")


_BPE_VOCAB_HEAD = """WITH w AS (
    SELECT t.word AS word, COUNT(*) AS freq
    FROM documents, unnest(string_split(text, ' ')) AS t(word)
    WHERE t.word <> '' GROUP BY 1
), v0 AS (SELECT word, freq, string_split(word, '') AS l FROM w)"""


def _bpe_oracle(n_merges: int) -> str:
    """Unrolled BPE training oracle (same chained-CTE technique as
    the kmeans/PageRank oracles): each round is a pair-count CTE, a
    1-row argmax CTE (cnt DESC, then pair lexicographic — the
    operator's tiebreak), and a merged vocabulary CTE whose greedy
    left-to-right merge is a ``list_reduce`` fold over a
    chr(1)-delimited symbol string — the DuckDB twin of
    operators/bpe.py::merge_pair's array fold (verified equivalent
    on overlapping runs: 'aaaa' -> [aa, aa], 'aaa' -> [aa, a])."""
    sql = _BPE_VOCAB_HEAD
    for r in range(n_merges):
        sql += f""",
p{r} AS (
    SELECT l[i] AS a, l[i+1] AS b, SUM(freq) AS cnt
    FROM v{r}, unnest(range(1, len(l))) r(i) GROUP BY 1, 2
),
best{r} AS (SELECT a, b FROM p{r} ORDER BY cnt DESC, a, b LIMIT 1),
v{r + 1} AS (
    SELECT word, freq, string_split(
        list_reduce(l, (acc, s) -> CASE
            WHEN s = best{r}.b AND ends_with(acc, chr(1) || best{r}.a)
                THEN left(acc, length(acc) - length(best{r}.a) - 1)
                     || chr(1) || best{r}.a || best{r}.b
            WHEN s = best{r}.b AND acc = best{r}.a
                THEN best{r}.a || best{r}.b
            ELSE acc || chr(1) || s END), chr(1)) AS l
    FROM v{r}, best{r}
)"""
    return sql


_BPE_MERGES = 3


@query(
    "bpe_top_pairs", extended=True,
    oracle=_BPE_VOCAB_HEAD + """
SELECT l[i] AS a, l[i+1] AS b,
       CAST(SUM(freq) AS BIGINT) AS cnt
FROM v0, unnest(range(1, len(l))) r(i)
GROUP BY 1, 2
ORDER BY cnt DESC, a, b LIMIT 30
""",
)
def bpe_top_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE scoring step: top-30 frequency-weighted adjacent
    character pairs over the corpus word vocabulary. The corpus is
    scanned once into (word, freq) — all tokenizer-training math
    after that is |vocab|-sized (operators/bpe.py)."""
    from top_produce_etl_spark.operators.bpe import pair_counts, word_vocab

    docs = load_table(spark, sf_dir, "documents")
    vocab = word_vocab(docs, "text").withColumn("sym", F.split("word", ""))
    return (
        pair_counts(vocab)
        .orderBy(F.col("cnt").desc(), F.col("a"), F.col("b"))
        .limit(30)
    )


@query(
    "bpe_segmented_vocab", extended=True,
    oracle=_bpe_oracle(_BPE_MERGES) + f"""
SELECT word, freq, array_to_string(l, ' ') AS tokens
FROM v{_BPE_MERGES}
""",
)
def bpe_segmented_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL BPE training loop, oracle-checked end-to-end: learn 3
    merges (argmax pair per round, greedy left-to-right application
    as a codegen fold — no UDF), return the segmented vocabulary.
    Driver state per round is ONE (x, y) pair; every corpus-sized
    cost happens exactly once in the initial word count."""
    from top_produce_etl_spark.operators.bpe import bpe_train

    docs = load_table(spark, sf_dir, "documents")
    _, vocab = bpe_train(docs, "text", _BPE_MERGES)
    return vocab.select(
        "word", "freq", F.array_join("sym", " ").alias("tokens")
    )


_PACK_BUDGET = 256
_PACK_SHARDS = 8

_PACK_ORACLE_REC = f"""WITH RECURSIVE d AS (
    SELECT doc_id, CAST(doc_id % {_PACK_SHARDS} AS INT) AS shard,
           len(string_split(text, ' ')) AS n_tokens,
           ROW_NUMBER() OVER (
               PARTITION BY doc_id % {_PACK_SHARDS} ORDER BY doc_id
           ) AS rn
    FROM documents
), rec AS (
    SELECT shard, rn, doc_id, n_tokens, 0 AS bin,
           CAST(0 AS BIGINT) AS pos, n_tokens AS fill
    FROM d WHERE rn = 1
    UNION ALL
    SELECT d.shard, d.rn, d.doc_id, d.n_tokens,
           CASE WHEN rec.fill + d.n_tokens > {_PACK_BUDGET}
                THEN rec.bin + 1 ELSE rec.bin END,
           CASE WHEN rec.fill + d.n_tokens > {_PACK_BUDGET}
                THEN CAST(0 AS BIGINT) ELSE rec.fill END,
           CASE WHEN rec.fill + d.n_tokens > {_PACK_BUDGET}
                THEN d.n_tokens ELSE rec.fill + d.n_tokens END
    FROM rec JOIN d ON d.shard = rec.shard AND d.rn = rec.rn + 1
)"""


@query(
    "packed_training_layout", extended=True,
    oracle=_PACK_ORACLE_REC
    + "\nSELECT doc_id, shard, bin, pos, n_tokens FROM rec",
)
def packed_training_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sharded greedy sequence packing (operators/packing.py): every
    document gets a (shard, bin, pos) slot in a 256-token packed
    training layout. Shards pack independently in parallel (the scan
    inside each is the only sequential part — DuckDB replays it as a
    recursive CTE, so the full layout hash-compares)."""
    from top_produce_etl_spark.functions.text import tokens
    from top_produce_etl_spark.operators.packing import pack_sequences

    docs = load_table(spark, sf_dir, "documents")
    sized = docs.select("doc_id", F.size(tokens("text")).alias("n_toks"))
    return pack_sequences(
        sized, "doc_id", "n_toks", budget=_PACK_BUDGET,
        n_shards=_PACK_SHARDS,
    )


@query(
    "packed_layout_stats", extended=True,
    oracle=_PACK_ORACLE_REC + f"""
, per_bin AS (
    SELECT shard, bin, SUM(n_tokens) AS toks FROM rec GROUP BY 1, 2
)
SELECT shard, COUNT(*) AS n_bins, SUM(toks) AS total_tokens,
       ROUND(AVG(CAST(LEAST(toks, {_PACK_BUDGET}) AS DOUBLE)
                 / {_PACK_BUDGET}), 6) AS mean_fill
FROM per_bin GROUP BY shard
""",
)
def packed_layout_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packing-efficiency audit per shard: bin count, token mass,
    mean fill fraction at the 256-token budget — the dataloader
    owner's waste metric (operators/packing.py::packing_stats)."""
    from top_produce_etl_spark.functions.text import tokens
    from top_produce_etl_spark.operators.packing import (
        pack_sequences,
        packing_stats,
    )

    docs = load_table(spark, sf_dir, "documents")
    sized = docs.select("doc_id", F.size(tokens("text")).alias("n_toks"))
    packed = pack_sequences(
        sized, "doc_id", "n_toks", budget=_PACK_BUDGET,
        n_shards=_PACK_SHARDS,
    )
    return packing_stats(packed, budget=_PACK_BUDGET)


@query(
    "temperature_mix_sources", extended=True,
    oracle=__import__(
        "top_produce_etl_spark.operators.mixture", fromlist=["x"]
    ).temperature_oracle_sql("source", "doc_id"),
)
def temperature_mix_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """α=0.5 temperature-smoothed source mixture
    (operators/mixture.py::temperature_rebalance): the sampling
    recipe is derived from per-source counts in-plan — big sources
    downsample toward √-proportions, small sources keep their mass.
    One count agg + |sources|-row broadcast + narrow hash predicate;
    the DuckDB twin re-derives the identical integer recipe."""
    from top_produce_etl_spark.operators.mixture import (
        temperature_rebalance,
    )

    docs = load_table(spark, sf_dir, "documents")
    return temperature_rebalance(docs, "source", "doc_id").select(
        "doc_id", "source"
    )


_BUDGET_TOKENS = 20000

_QUALITY_SQL_FRAG = f"""least(len(string_split(text, ' ')) / 64.0, 1.0) * 0.4
           + (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
              / len(string_split(text, ' '))) * 0.4
           + greatest(0.0, 1.0 - (CAST({_marker_sql(LANG_MARKERS["en"])} AS DOUBLE)
              / len(string_split(text, ' '))) * 2.0) * 0.2"""


@query(
    "budget_selected_corpus", extended=True,
    oracle=f"""
    WITH b AS (
        SELECT doc_id,
               LEAST(GREATEST(CAST(FLOOR(({_QUALITY_SQL_FRAG}) * 1000)
                                   AS INT), 0), 999) AS __bucket,
               len(string_split(text, ' ')) AS toks
        FROM documents
    ), roll AS (
        SELECT __bucket, SUM(toks) AS t FROM b GROUP BY 1
    ), cum AS (
        SELECT __bucket, SUM(t) OVER (ORDER BY __bucket DESC) AS c
        FROM roll
    ), thr AS (
        SELECT MIN(__bucket) AS kmin FROM cum WHERE c <= {_BUDGET_TOKENS}
    )
    SELECT b.doc_id, b.__bucket AS bucket, b.toks AS n_tokens
    FROM b, thr WHERE b.__bucket >= thr.kmin
    """,
)
def budget_selected_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget corpus selection
    (operators/mixture.py::budget_select): keep the best quality
    buckets whose cumulative token mass fits a 20k-token budget —
    one rollup agg, a ≤1000-row driver threshold fold, one narrow
    filter. The oracle re-derives the threshold with a window over
    the same bucket rollup."""
    from top_produce_etl_spark.functions.text import quality_score, tokens
    from top_produce_etl_spark.operators.mixture import budget_select

    docs = load_table(spark, sf_dir, "documents")
    sized = docs.select(
        "doc_id",
        quality_score("text").alias("__q"),
        F.size(tokens("text")).alias("n_tokens"),
    )
    kept = budget_select(sized, "__q", "n_tokens", budget=_BUDGET_TOKENS)
    return kept.select(
        "doc_id", F.col("__bucket").alias("bucket"), "n_tokens"
    )


@query(
    "corpus_datasheet", extended=True,
    oracle=f"""
    WITH sig AS (
        SELECT doc_id, source, lang,
               len(string_split(text, ' ')) AS toks,
               length(text) AS chars,
               md5(text) AS h,
               CAST(FLOOR(({_QUALITY_SQL_FRAG}) * 1000000) AS BIGINT)
                   AS q_micro
        FROM documents
    ), hcnt AS (
        SELECT h, COUNT(*) AS n FROM sig GROUP BY 1
    ), flagged AS (
        SELECT sig.*, (hcnt.n > 1) AS is_dup
        FROM sig JOIN hcnt USING (h)
    ), lang_rank AS (
        SELECT source, lang,
               ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY COUNT(*) DESC, lang ASC
               ) AS rn
        FROM sig GROUP BY source, lang
    )
    SELECT f.source,
           COUNT(*) AS n_docs,
           SUM(f.toks) AS total_tokens,
           SUM(f.chars) AS total_chars,
           SUM(CASE WHEN f.is_dup THEN 1 ELSE 0 END) AS dup_docs,
           SUM(CASE WHEN f.is_dup THEN 1 ELSE 0 END)
               * 1000000 // COUNT(*) AS dup_rate_ppm,
           SUM(f.q_micro) // COUNT(*) AS mean_quality_micro,
           COUNT(DISTINCT f.lang) AS n_langs,
           MIN(lr.lang) AS top_lang
    FROM flagged f
    JOIN lang_rank lr ON lr.source = f.source AND lr.rn = 1
    GROUP BY f.source
    """,
)
def corpus_datasheet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset datasheet: the per-source summary a data card quotes —
    doc/token/char mass, exact-duplicate exposure (corpus-wide
    text-hash groups ≥ 2), mean quality in exact integer micro-units
    (per-doc fixed point summed as integers — no float accumulation
    order), language spread and the dominant language (count-desc,
    lang-asc tiebreak). Plan: one corpus-wide hash-count shuffle
    joined back on the hash key, one per-source agg, one
    |sources×langs|-row ranking window — nothing quadratic, nothing
    driver-sized."""
    from pyspark.sql.window import Window

    from top_produce_etl_spark.functions.text import quality_score, tokens

    docs = load_table(spark, sf_dir, "documents")
    sig = docs.select(
        "doc_id", "source", "lang",
        F.size(tokens("text")).alias("toks"),
        F.length("text").alias("chars"),
        F.md5("text").alias("h"),
        F.floor(quality_score("text") * 1000000)
        .cast("bigint").alias("q_micro"),
    )
    hcnt = sig.groupBy("h").agg(F.count(F.lit(1)).alias("__n"))
    flagged = sig.join(hcnt, "h").withColumn("is_dup", F.col("__n") > 1)
    w = Window.partitionBy("source").orderBy(
        F.col("__lc").desc(), F.col("lang").asc()
    )
    top_lang = (
        sig.groupBy("source", "lang")
        .agg(F.count(F.lit(1)).alias("__lc"))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("source", F.col("lang").alias("top_lang"))
    )
    per_source = flagged.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("toks").alias("total_tokens"),
        F.sum("chars").alias("total_chars"),
        F.sum(F.col("is_dup").cast("bigint")).alias("dup_docs"),
        F.expr(
            "SUM(CAST(is_dup AS BIGINT)) * 1000000 DIV COUNT(1)"
        ).alias("dup_rate_ppm"),
        F.expr("SUM(q_micro) DIV COUNT(1)").alias("mean_quality_micro"),
        F.countDistinct("lang").alias("n_langs"),
    )
    return per_source.join(F.broadcast(top_lang), "source")


_CAP_PER_SOURCE = 20


def _cap_oracle() -> str:
    from top_produce_etl_spark.operators.mixture import cap_oracle_sql

    return cap_oracle_sql(
        "source", "doc_id", _CAP_PER_SOURCE, strategy="exact"
    )


@query("capped_docs_per_source", extended=True, oracle=_cap_oracle())
def capped_docs_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source frequency capping
    (operators/mixture.py::cap_per_category): at most 20 documents
    per source — the domain-cap step of web-corpus curation. The
    exact strategy (deterministic (hash, id) ranking) is the oracle
    entry; the hash strategy is the windowless 100 TB path with the
    same |categories|-row broadcast shape as rebalance_mixture."""
    from top_produce_etl_spark.operators.mixture import cap_per_category

    docs = load_table(spark, sf_dir, "documents")
    return cap_per_category(
        docs, "source", "doc_id", _CAP_PER_SOURCE, strategy="exact"
    ).select("doc_id", "source")


@query(
    "bpe_encoded_docs", extended=True,
    oracle=_bpe_oracle(_BPE_MERGES) + f"""
, tok AS (
    SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), ex AS (
    SELECT doc_id, i AS pos, toks[i] AS word
    FROM tok, unnest(range(1, len(toks) + 1)) r(i)
    WHERE toks[i] <> ''
), fl AS (
    SELECT e.doc_id, e.pos, rr.j, v.l[rr.j] AS piece
    FROM ex e
    JOIN v{_BPE_MERGES} v USING (word),
         unnest(range(1, len(v.l) + 1)) rr(j)
)
SELECT doc_id,
       string_agg(piece, ' ' ORDER BY pos, j) AS encoded,
       CAST(COUNT(*) AS INT) AS n_pieces
FROM fl GROUP BY doc_id
""",
)
def bpe_encoded_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ENCODE side of the tokenizer at corpus scale
    (operators/bpe.py::encode_corpus): train 3 merges, segment the
    DISTINCT-word table once, join documents back on the word and
    reassemble piece sequences per document — the fold cost is per
    vocabulary entry, never per token occurrence."""
    from top_produce_etl_spark.operators.bpe import encode_corpus

    docs = load_table(spark, sf_dir, "documents")
    return encode_corpus(docs, "doc_id", "text", _BPE_MERGES)


@query(
    "curriculum_stages_docs", extended=True,
    oracle=f"""
    WITH s AS (
        SELECT doc_id, ({_QUALITY_SQL_FRAG}) AS q FROM documents
    ), th AS (
        SELECT [ROUND(quantile_cont(q, 0.25), 6),
                ROUND(quantile_cont(q, 0.50), 6),
                ROUND(quantile_cont(q, 0.75), 6)] AS cuts
        FROM s
    )
    SELECT s.doc_id,
           CAST(len(list_filter(th.cuts, t -> s.q > t)) AS INT) AS stage
    FROM s, th
    """,
)
def curriculum_stages_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum staging
    (operators/mixture.py::curriculum_stages): documents bucketed
    into quartile stages of their quality score — the difficulty
    ordering a curriculum dataloader consumes, assigned by three
    broadcast cut-point literals and a narrow array expression (no
    global sort)."""
    from top_produce_etl_spark.functions.text import quality_score
    from top_produce_etl_spark.operators.mixture import curriculum_stages

    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id", quality_score("text").alias("__q")
    )
    return curriculum_stages(scored, "__q", n_stages=4).select(
        "doc_id", "stage"
    )


# Epoch-aware upsampling (the complement of the downsampling
# rebalance above): scarce languages run fractional extra epochs.
_UPSAMPLE_EPOCHS = {"zh": 3.0, "es": 2.5, "de": 1.25}


def _upsample_oracle() -> str:
    from top_produce_etl_spark.operators.mixture import upsample_oracle_sql

    copies = upsample_oracle_sql("lang", "doc_id", _UPSAMPLE_EPOCHS)
    return f"""
    SELECT doc_id, lang, epoch
    FROM documents, unnest(range(1, ({copies}) + 1)) r(epoch)
    """


@query("upsampled_mixture_docs", oracle=_upsample_oracle(), extended=True)
def upsampled_mixture_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic epoch upsampling
    (operators/mixture.py::upsample_mixture): zh runs 3 epochs, es
    2.5 (every row twice, the salted-hash half a third time), de
    1.25; en/fr pass through at one epoch. Each replica carries its
    epoch index so downstream packing sees distinct rows."""
    from top_produce_etl_spark.operators.mixture import upsample_mixture

    docs = load_table(spark, sf_dir, "documents")
    return upsample_mixture(
        docs, "lang", "doc_id", _UPSAMPLE_EPOCHS
    ).select("doc_id", "lang", "epoch")


@query(
    "token_js_divergence_docs", extended=True,
    oracle=__import__(
        "top_produce_etl_spark.operators.stats",
        fromlist=["distribution_divergence_oracle_sql"],
    ).distribution_divergence_oracle_sql(
        "(SELECT t.tok FROM documents, "
        "unnest(string_split(text, ' ')) t(tok) "
        "WHERE lang = 'en' AND t.tok <> '')",
        "(SELECT t.tok FROM documents, "
        "unnest(string_split(text, ' ')) t(tok) "
        "WHERE lang <> 'en' AND t.tok <> '')",
        "tok",
    ),
)
def token_js_divergence_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-distribution KL/JS divergence between the English and
    non-English corpus slices (r7 —
    operators/stats.py::distribution_divergence): the discrete
    mixture-drift monitor beside PSI (numeric), KS (nonparametric)
    and entropy (composition). Add-1 smoothing over the union
    vocabulary, per-term micro-nat rounding — fully oracle-checked."""
    from top_produce_etl_spark.operators.stats import (
        distribution_divergence,
    )

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "lang",
        F.explode(F.split(F.col("text"), " ")).alias("tok"),
    ).where(F.col("tok") != "")
    return distribution_divergence(
        toks.where(F.col("lang") == "en"),
        toks.where(F.col("lang") != "en"),
        "tok",
    )


# --- Gopher document-shape rules (round 8) ---------------------------

_GOPHER_RULES_ORACLE = """
WITH t AS (
    SELECT doc_id,
           string_split(text, ' ')    AS toks,
           string_split(text, chr(10)) AS lines,
           text
    FROM documents
), m AS (
    SELECT doc_id,
        len(toks) AS n_words,
        CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(toks)
            AS mean_word_len,
        CAST(len(string_split(text, '#')) - 1
             + len(string_split(text, '...')) - 1
             + len(string_split(text, '…')) - 1 AS DOUBLE) / len(toks)
            AS symbol_ratio,
        CAST(len(list_filter(lines,
            l -> l LIKE '-%' OR l LIKE '*%' OR l LIKE '•%'
        )) AS DOUBLE) / len(lines) AS bullet_frac,
        CAST(len(list_filter(lines,
            l -> l LIKE '%...' OR l LIKE '%…'
        )) AS DOUBLE) / len(lines) AS ellipsis_frac,
        CAST(len(list_filter(toks,
            w -> regexp_matches(w, '[A-Za-z]')
        )) AS DOUBLE) / len(toks) AS alpha_word_frac,
        len(list_filter(toks,
            w -> w IN ('the', 'a', 'fast', 'slow')
        )) AS n_stopwords
    FROM t
)
SELECT doc_id, n_words, mean_word_len, symbol_ratio, bullet_frac,
       ellipsis_frac, alpha_word_frac, n_stopwords,
       (n_words >= 30 AND n_words <= 100000) AS ok_words,
       (mean_word_len >= 2.0 AND mean_word_len <= 12.0) AS ok_word_len,
       symbol_ratio <= 0.1   AS ok_symbols,
       bullet_frac <= 0.9    AS ok_bullets,
       ellipsis_frac <= 0.3  AS ok_ellipsis,
       alpha_word_frac >= 0.8 AS ok_alpha,
       n_stopwords >= 2      AS ok_stopwords,
       ((n_words >= 30 AND n_words <= 100000)
        AND (mean_word_len >= 2.0 AND mean_word_len <= 12.0)
        AND symbol_ratio <= 0.1 AND bullet_frac <= 0.9
        AND ellipsis_frac <= 0.3 AND alpha_word_frac >= 0.8
        AND n_stopwords >= 2) AS keep
FROM m
"""


@query("gopher_document_rules", extended=True, oracle=_GOPHER_RULES_ORACLE)
def gopher_document_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Gopher document-SHAPE rule suite (Rae et al. 2021 §A1.1)
    over the documents corpus — word-count bounds, mean word length,
    symbol/bullet/ellipsis ratios, alphabetic-word fraction and the
    stopword-existence check, each as a per-document scan-speed
    expression with per-rule attribution
    (operators/textquality.py::gopher_rules; min_words raised to 30
    so the fixture corpus genuinely splits on the rule)."""
    from top_produce_etl_spark.operators.textquality import gopher_rules

    docs = load_table(spark, sf_dir, "documents")
    return gopher_rules(docs, "doc_id", "text", min_words=30)


# --- C4 line-level cleaning (round 8) --------------------------------

_C4_TEXT_SQL = (
    "'order ' || CAST(o_orderkey AS VARCHAR) || ' placed on ' || "
    "CAST(o_orderdate AS VARCHAR) || ' closed.' || chr(10) || "
    "'lorem ipsum filler line.' || chr(10) || o_orderpriority || "
    "chr(10) || 'stream the batch with javascript now.' || chr(10) || "
    "'this clean line has five words.'"
)

_C4_CLEAN_ORACLE = f"""
WITH t AS (
    SELECT o_orderkey, {_C4_TEXT_SQL} AS text FROM orders
), s AS (
    SELECT o_orderkey, string_split(text, chr(10)) AS lines FROM t
), k AS (
    SELECT o_orderkey, lines,
        list_filter(lines, l ->
            len(string_split(trim(l), ' ')) >= 3
            AND right(trim(l), 1) IN ('.', '!', '?', '"')
            AND NOT contains(lower(trim(l)), 'lorem ipsum')
            AND NOT contains(lower(trim(l)), 'javascript')
            AND NOT contains(lower(trim(l)), '{{')
        ) AS kept
    FROM s
)
SELECT o_orderkey, array_to_string(kept, chr(10)) AS text_clean,
       len(lines) AS n_lines, len(kept) AS n_kept
FROM k
"""


@query("c4_clean_lines", extended=True, oracle=_C4_CLEAN_ORACLE)
def c4_clean_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style line-level cleaning (Raffel et al. 2020 §2.2:
    terminal punctuation, ≥3 words, lorem-ipsum / javascript /
    curly-brace filters) over a constructed multi-line corpus — the
    fixture documents are single-line, so each orders row becomes a
    5-line document with one planted line per failure mode and one
    clean varying line (operators/textquality.py::clean_lines, pure
    array expressions — zero shuffle)."""
    from top_produce_etl_spark.operators.textquality import clean_lines

    orders = load_table(spark, sf_dir, "orders")
    txt = F.concat(
        F.lit("order "), F.col("o_orderkey").cast("string"),
        F.lit(" placed on "), F.col("o_orderdate").cast("string"),
        F.lit(" closed."), F.lit("\n"),
        F.lit("lorem ipsum filler line."), F.lit("\n"),
        F.col("o_orderpriority"), F.lit("\n"),
        F.lit("stream the batch with javascript now."), F.lit("\n"),
        F.lit("this clean line has five words."),
    )
    docs = orders.select("o_orderkey", txt.alias("text"))
    return clean_lines(docs, "o_orderkey", "text")


# --- structured PII scan + redaction (round 8) ------------------------

# Constructed PII corpus: the fixture tables carry no PII, so each
# customer row synthesizes a document with a derived email, the real
# TPC-H phone, a derived dotted-quad — with per-row VARIATION in
# which kinds appear (custkey mod 3 / mod 5), so the counts aren't a
# constant column.
_PII_PHONE_SQL = (
    "CAST(10 + c_custkey % 89 AS VARCHAR) || '-' || "
    "CAST(100 + c_custkey % 900 AS VARCHAR) || '-' || "
    "CAST(100 + (c_custkey * 7) % 900 AS VARCHAR) || '-' || "
    "CAST(1000 + (c_custkey * 13) % 9000 AS VARCHAR)"
)
_PII_SSN_SQL = (
    "CAST(100 + c_custkey % 900 AS VARCHAR) || '-' || "
    "CAST(10 + c_custkey % 90 AS VARCHAR) || '-' || "
    "CAST(1000 + c_custkey % 9000 AS VARCHAR)"
)
_PII_TEXT_SQL = (
    "c_name || ' reachable at ' || lower(replace(c_name, '#', '')) || "
    "'@example.com' || "
    f"CASE WHEN c_custkey % 3 = 0 THEN ' or ' || {_PII_PHONE_SQL} "
    "ELSE ' (phone unlisted)' END || "
    "CASE WHEN c_custkey % 5 = 0 THEN ' backup ' || "
    "lower(replace(c_name, '#', '')) || '@backup.example.org' "
    "ELSE '' END || "
    f"CASE WHEN c_custkey % 7 = 0 THEN ' id ' || {_PII_SSN_SQL} "
    "ELSE '' END || "
    "' last seen from 10.' || CAST(c_custkey % 250 AS VARCHAR) || "
    "'.0.' || CAST(c_custkey % 200 AS VARCHAR) || "
    "' segment ' || c_mktsegment"
)

_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_PHONE = r"\b\d{2,3}-\d{3,4}-\d{3,4}-\d{4}\b"
_PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
_PII_SSN = r"\b\d{3}-\d{2}-\d{4}\b"

_PII_SCAN_ORACLE = f"""
WITH t AS (SELECT c_custkey, {_PII_TEXT_SQL} AS text FROM customer)
SELECT c_custkey,
       len(regexp_extract_all(text, '{_PII_EMAIL}')) AS n_email,
       len(regexp_extract_all(text, '{_PII_PHONE}')) AS n_phone,
       len(regexp_extract_all(text, '{_PII_IPV4}'))  AS n_ipv4,
       len(regexp_extract_all(text, '{_PII_SSN}'))   AS n_ssn,
       len(regexp_extract_all(text, '{_PII_EMAIL}'))
       + len(regexp_extract_all(text, '{_PII_PHONE}'))
       + len(regexp_extract_all(text, '{_PII_IPV4}'))
       + len(regexp_extract_all(text, '{_PII_SSN}')) AS n_pii_total
FROM t
"""

_PII_REDACT_ORACLE = f"""
WITH t AS (SELECT c_custkey, {_PII_TEXT_SQL} AS text FROM customer)
SELECT c_custkey,
       regexp_replace(
           regexp_replace(
               regexp_replace(
                   regexp_replace(text, '{_PII_EMAIL}', '<EMAIL>', 'g'),
                   '{_PII_PHONE}', '<PHONE>', 'g'),
               '{_PII_IPV4}', '<IPV4>', 'g'),
           '{_PII_SSN}', '<SSN>', 'g') AS text_redacted
FROM t
"""


def _pii_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    local = F.lower(F.regexp_replace(F.col("c_name"), "#", ""))
    k = F.col("c_custkey")
    phone = F.concat(
        (k % 89 + 10).cast("string"), F.lit("-"),
        (k % 900 + 100).cast("string"), F.lit("-"),
        ((k * 7) % 900 + 100).cast("string"), F.lit("-"),
        ((k * 13) % 9000 + 1000).cast("string"),
    )
    ssn = F.concat(
        (k % 900 + 100).cast("string"), F.lit("-"),
        (k % 90 + 10).cast("string"), F.lit("-"),
        (k % 9000 + 1000).cast("string"),
    )
    txt = F.concat(
        F.col("c_name"), F.lit(" reachable at "), local,
        F.lit("@example.com"),
        F.when(k % 3 == 0, F.concat(F.lit(" or "), phone))
        .otherwise(F.lit(" (phone unlisted)")),
        F.when(
            k % 5 == 0,
            F.concat(F.lit(" backup "), local,
                     F.lit("@backup.example.org")),
        ).otherwise(F.lit("")),
        F.when(k % 7 == 0, F.concat(F.lit(" id "), ssn))
        .otherwise(F.lit("")),
        F.lit(" last seen from 10."),
        (k % 250).cast("string"),
        F.lit(".0."),
        (k % 200).cast("string"),
        F.lit(" segment "), F.col("c_mktsegment"),
    )
    return cust.select("c_custkey", txt.alias("text"))


@query("pii_scan_customer", extended=True, oracle=_PII_SCAN_ORACLE)
def pii_scan_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document PII census (operators/pii.py::pii_scan): typed
    regexp counts — email / dashed phone / dotted-quad / SSN — over
    a constructed corpus with per-row kind variation. Patterns are
    RE2-safe so Spark's Java regex and DuckDB's RE2 agree
    match-for-match; counts are leftmost non-overlapping in both."""
    from top_produce_etl_spark.operators.pii import pii_scan

    return pii_scan(_pii_corpus(spark, sf_dir), "c_custkey", "text")


@query("pii_redact_customer", extended=True, oracle=_PII_REDACT_ORACLE)
def pii_redact_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed PII redaction (operators/pii.py::redact_pii): chained
    global regexp_replace to <KIND> sentinels in fixed kind order —
    the whole rewritten string hash-checks cross-engine, so sentinel
    placement, match extents and ordering are all pinned."""
    from top_produce_etl_spark.operators.pii import redact_pii

    return redact_pii(_pii_corpus(spark, sf_dir), "c_custkey", "text")


# --- CCNet perplexity buckets (round 10 — operators/textquality.py) ---

def _PPL_BUCKET_ORACLE() -> str:
    from top_produce_etl_spark.operators.textquality import (
        perplexity_buckets_oracle_ctes,
    )

    ctes = perplexity_buckets_oracle_ctes(
        "documents", "doc_id", "text", by=("lang",)
    )
    return f"""
    WITH {ctes}
    SELECT lang, ppl_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(mean_info_micro) AS BIGINT) AS sum_info_micro,
           CAST(MIN(mean_info_micro) AS BIGINT) AS min_info_micro,
           CAST(MAX(mean_info_micro) AS BIGINT) AS max_info_micro
    FROM ppl_buckets
    GROUP BY 1, 2
    """


@query(
    "ccnet_perplexity_buckets", extended=True,
    oracle=_PPL_BUCKET_ORACLE(),
)
def ccnet_perplexity_buckets(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CCNet head/middle/tail quality buckets per language (round
    10): unigram-LM surprisal in integer micro-nats ranks every
    document; ntile(3) over (score, doc_id) within each language
    splits the corpus into equal thirds — the canonical CCNet
    curation stage between dedup and the training mix. The tercile
    window runs on the slim (id, lang, score) relation, sharded by
    language (the text never enters the sort); the census carries
    the per-cell surprisal mass so bucket BOUNDARIES are
    hash-checked, not just counts."""
    from top_produce_etl_spark.operators.textquality import (
        perplexity_buckets,
    )

    docs = load_table(spark, sf_dir, "documents")
    b = perplexity_buckets(docs, "doc_id", "text", by=("lang",))
    return b.groupBy("lang", "ppl_bucket").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("mean_info_micro").cast("bigint").alias("sum_info_micro"),
        F.min("mean_info_micro").cast("bigint").alias("min_info_micro"),
        F.max("mean_info_micro").cast("bigint").alias("max_info_micro"),
    )


# --- Frozen-cutoff CCNet buckets (round 11 — the stored-artifact
#     production twin of ccnet_perplexity_buckets) ---

def _FROZEN_BUCKET_ORACLE() -> str:
    from top_produce_etl_spark.operators.textquality import (
        frozen_buckets_oracle_ctes,
    )

    return f"""
    WITH {frozen_buckets_oracle_ctes()}
    SELECT b.lang, b.ppl_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN b.doc_id % 2 = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_old,
           CAST(SUM(CASE WHEN r.ref_bucket IS NOT NULL
                          AND r.ref_bucket <> b.ppl_bucket
                         THEN 1 ELSE 0 END)
                AS BIGINT) AS n_unstable_old,
           CAST(SUM(b.mean_info_micro) AS BIGINT) AS sum_info_micro
    FROM frozen_buckets b LEFT JOIN ref_ntile r USING (doc_id)
    GROUP BY 1, 2
    """


@query(
    "ccnet_frozen_buckets", extended=True,
    oracle=_FROZEN_BUCKET_ORACLE(),
)
def ccnet_frozen_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frozen-cutoff surprisal bucketing (round 11, the r10 verdict
    #4 ask): the even-doc_id half of the corpus is the REFERENCE run
    — its unigram LM counts and per-language tercile boundary PAIRS
    are materialized to a parquet artifact
    (save/load_surprisal_reference, the operators/pq.py stored-index
    lifecycle), then the WHOLE corpus (reference + "appended" odd
    rows) is scored against the frozen LM and bucketed by pure
    comparison against the frozen cutoffs: no window, no wide sort —
    a broadcast join plus one boolean per row, append-stable and
    streaming-legal by construction.

    The output carries the APPEND-STABILITY PROOF as data:
    n_unstable_old counts reference rows whose frozen-cutoff bucket
    differs from their original ntile(3) assignment — exactly 0 in
    every cell because the boundaries are (score, id) pairs, the
    same composite the ntile order sorts by. Hash-checked against a
    DuckDB oracle that re-derives the entire lifecycle in SQL."""
    import hashlib
    import os
    import tempfile

    from pyspark.sql import Window

    from top_produce_etl_spark.operators._cache import persist_tracked
    from top_produce_etl_spark.operators.textquality import (
        bucket_frozen,
        load_surprisal_reference,
        save_surprisal_reference,
        score_with_frozen_lm,
        surprisal_cutoffs_from_scores,
        unigram_lm,
    )

    docs = load_table(spark, sf_dir, "documents")
    ref = docs.filter(F.col("doc_id") % 2 == 0)
    digest = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    path = os.path.join(tempfile.gettempdir(), f"tp_surp_ref_{digest}")
    # ONE (doc, term) scoring pipeline feeds everything (shared-scan
    # refactor, r11 close: 4.3 s -> the cutoffs, the frozen buckets
    # AND the reference ntile all derive from this persisted
    # relation; frozen-scoring the reference rows against their own
    # LM is bit-identical to unigram_surprisal by construction)
    lm0 = unigram_lm(ref)
    scored = persist_tracked(
        score_with_frozen_lm(docs, lm0).join(
            docs.select("doc_id", "lang"), "doc_id"
        )
    )
    ref_scored = scored.filter(F.col("doc_id") % 2 == 0)
    save_surprisal_reference(
        lm0, surprisal_cutoffs_from_scores(ref_scored, by=("lang",)),
        path,
    )
    _lm, cuts = load_surprisal_reference(spark, path)
    b = bucket_frozen(scored, cuts, by=("lang",))
    w = Window.partitionBy("lang").orderBy("mean_info_micro", "doc_id")
    tercile = F.ntile(3).over(w)
    refb = ref_scored.select(
        "doc_id",
        F.when(tercile == 1, F.lit("head"))
        .when(tercile == 2, F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("ref_bucket"),
    )
    j = b.join(refb, "doc_id", "left")
    return j.groupBy("lang", "ppl_bucket").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(
            F.when(F.col("doc_id") % 2 == 0, 1).otherwise(0)
        ).cast("bigint").alias("n_old"),
        F.sum(
            F.when(
                F.col("ref_bucket").isNotNull()
                & (F.col("ref_bucket") != F.col("ppl_bucket")),
                1,
            ).otherwise(0)
        ).cast("bigint").alias("n_unstable_old"),
        F.sum("mean_info_micro").cast("bigint").alias("sum_info_micro"),
    )


# --- HTML main-text extraction (round 11 — operators/html.py) ---

def _HTML_EXTRACT_ORACLE() -> str:
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
    "html_text_extraction", extended=True,
    oracle=_HTML_EXTRACT_ORACLE(),
)
def html_text_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML → visible text (round 11): the step a real crawl
    pipeline runs FIRST, before any downstream quality/dedup/langid
    tier. The fixture wraps each document in deterministic raw HTML
    (head/style/script junk, comments, nav div, entity-encoded
    punctuation); the extraction chain — container drop, block
    boundaries → newlines, tag strip, entity decode, whitespace
    normalization — is pure chained regexp_replace (RE2- and
    java.regex-safe), so the ENTIRE extracted string hash-matches
    the DuckDB twin byte for byte on every document: scan-speed at
    100 TB, and provably identical across engines."""
    from top_produce_etl_spark.operators.html import (
        extract_html_text,
        synthesize_html_docs,
    )

    docs = load_table(spark, sf_dir, "documents")
    x = extract_html_text(synthesize_html_docs(docs))
    return x.select(
        "doc_id",
        "text",
        F.length("text").cast("bigint").alias("n_chars"),
        (
            F.length("text")
            - F.length(F.regexp_replace("text", "\n", ""))
            + 1
        ).cast("bigint").alias("n_lines"),
    )


# --- SFT layout: chat rendering + FIM (round 11 — operators/sft.py) ---

def _CHAT_RENDER_ORACLE() -> str:
    from top_produce_etl_spark.operators.sft import (
        chat_render_oracle_sql,
    )

    turns = """
    SELECT (doc_id // 3) AS conv_id,
           CAST(doc_id % 3 AS INT) AS turn_idx,
           (['system', 'user', 'assistant'])[
               CAST(doc_id % 3 AS INT) + 1] AS role,
           substr(text, 1, 48) AS content
    FROM documents
    """
    return chat_render_oracle_sql(f"({turns})")


@query(
    "sft_chat_render", extended=True, oracle=_CHAT_RENDER_ORACLE()
)
def sft_chat_render(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-turn chat rendering (round 11 — the SFT last mile):
    long-format turns (one row per turn, synthesized
    system/user/assistant triples) collapse to ONE ChatML-style
    training string per conversation via sorted-collect + fold —
    partition-independent turn order, no window, no driver
    assembly. The ENTIRE rendered string hash-matches DuckDB's
    ordered string_agg per conversation."""
    from top_produce_etl_spark.operators.sft import chat_render

    docs = load_table(spark, sf_dir, "documents")
    i = F.col("doc_id")
    turns = docs.select(
        F.expr("doc_id div 3").alias("conv_id"),
        (i % 3).cast("int").alias("turn_idx"),
        F.element_at(
            F.array(
                F.lit("system"), F.lit("user"), F.lit("assistant")
            ),
            (i % 3).cast("int") + 1,
        ).alias("role"),
        F.substring("text", 1, 48).alias("content"),
    )
    return chat_render(turns)


def _FIM_ORACLE() -> str:
    from top_produce_etl_spark.operators.sft import fim_oracle_sql

    return fim_oracle_sql("documents")


@query("sft_fim_transform", extended=True, oracle=_FIM_ORACLE())
def sft_fim_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fill-in-the-middle reordering (round 11 — the code-corpus
    training transform, Bavarian et al. 2022, public): every even
    document is cut at id-derived points and re-emitted as
    <PRE>prefix<SUF>suffix<MID>middle; odd documents pass through
    (the fim_rate mix). Integer DIV cut points, so the whole output
    string hash-matches the DuckDB twin byte for byte."""
    from top_produce_etl_spark.operators.sft import fim_transform

    docs = load_table(spark, sf_dir, "documents")
    return fim_transform(docs)


# --- Mojibake repair (round 11 — operators/encoding.py) ---

def _MOJIBAKE_ORACLE() -> str:
    from top_produce_etl_spark.operators.encoding import (
        mojibake_oracle_sql,
    )

    return mojibake_oracle_sql("documents")


@query("mojibake_repair", extended=True, oracle=_MOJIBAKE_ORACLE())
def mojibake_repair_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Charset repair (round 11): every third document carries
    REAL double-encoding corruption (UTF-8 bytes mis-decoded as
    Latin-1, applied by the engine's own charset functions around
    planted non-ASCII words); the repair op re-encodes and decodes
    back, gated by pure-regex proofs (latin1-safe + valid-UTF-8-as-
    bytes + has-high-chars) that make Spark 4's STRICT charset
    conversion unthrowable and the repair conservative — healthy
    accented/CJK text provably passes through. The oracle replays
    corruption+repair via Python-codec-derived literals: matching
    hashes prove the engine's charset round-trip inverts the
    corruption byte for byte, and the repaired corpus equals the
    clean one."""
    from top_produce_etl_spark.operators.encoding import (
        repair_mojibake,
        synthesize_mojibake_docs,
    )

    docs = load_table(spark, sf_dir, "documents")
    raw = synthesize_mojibake_docs(docs)
    rep = repair_mojibake(raw, "raw", out="text_repaired")
    return rep.select(
        "doc_id",
        "was_mojibake",
        "text_repaired",
        F.length("text_repaired").cast("bigint").alias("n_chars"),
    )


# --- SFT loss-mask spans (round 11 — operators/sft.py) ---

_SFT_TURNS_SQL = """
    SELECT (doc_id // 3) AS conv_id,
           CAST(doc_id % 3 AS INT) AS turn_idx,
           (['system', 'user', 'assistant'])[
               CAST(doc_id % 3 AS INT) + 1] AS role,
           substr(text, 1, 48) AS content
    FROM documents
"""


def _CHAT_SPANS_ORACLE() -> str:
    from top_produce_etl_spark.operators.sft import (
        chat_spans_oracle_sql,
    )

    return chat_spans_oracle_sql(_SFT_TURNS_SQL)


@query(
    "sft_chat_loss_spans", extended=True,
    oracle=_CHAT_SPANS_ORACLE(),
)
def sft_chat_loss_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-turn loss-mask spans for the rendered chat template
    (round 11): SFT masks the loss to assistant content, so the
    layout stage must emit WHERE each turn's content lives in the
    rendered string. Offsets are window arithmetic over the turn
    order; span_text_ok re-extracts every span from the actual
    rendered text in-engine and must be uniformly true — and the
    whole relation hash-matches the DuckDB twin that re-renders
    with ordered string_agg and re-derives the same offsets."""
    from top_produce_etl_spark.operators.sft import (
        chat_assistant_spans,
    )

    docs = load_table(spark, sf_dir, "documents")
    i = F.col("doc_id")
    turns = docs.select(
        F.expr("doc_id div 3").alias("conv_id"),
        (i % 3).cast("int").alias("turn_idx"),
        F.element_at(
            F.array(
                F.lit("system"), F.lit("user"), F.lit("assistant")
            ),
            (i % 3).cast("int") + 1,
        ).alias("role"),
        F.substring("text", 1, 48).alias("content"),
    )
    return chat_assistant_spans(turns)
