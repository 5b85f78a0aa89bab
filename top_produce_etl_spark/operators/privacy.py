"""Differential-privacy noisy release (beyond-reference §2.12 tier,
round 7) — the RELEASE half of the privacy story whose GATE half is
operators/quality.py (k-anonymity, l-diversity, t-closeness): the
gates decide whether a grouping is safe to publish at all; these
operators publish group aggregates with calibrated Laplace noise so
no single row is identifiable (Dwork et al. 2006, the public DP
literature).

ε-DP via the Laplace mechanism: release = f(D) + Lap(Δf/ε), where
Δf is the L1 sensitivity (1 for counts; the clip bound for sums —
values are clipped FIRST, which is what makes the sensitivity a
constant the mechanism can calibrate to). Composition is additive:
publishing k releases at ε each spends k·ε of budget — callers
track that; these functions implement one release.

Determinism contract (the house seeded-randomization pattern —
operators/bootstrap.py's hash-Poisson precedent): the noise is a
DETERMINISTIC function of (salt, group key) through the 56-bit
engine-portable FULL-LENGTH composite hash
(functions/portable_hash.py::composite_hash_full_col — chunk-folded,
no 40-char prefix truncation; round-8 advisor fix), mapped to a
uniform in (0,1) and through the Laplace inverse CDF
``-b·sign(u−½)·ln(1−2|u−½|)``. Re-running a release reproduces it
bit-for-bit (re-releasing with FRESH noise would leak by averaging
— re-release determinism is itself a privacy property here), and
the whole mechanism is SQL-expressible, so the battery hash-checks
the released numbers against DuckDB exactly.

**What the ε actually protects (read before publishing):** the
noise is pseudorandom in the SALT. Against an adversary who does
NOT know the salt, the release is ε-DP in the standard
computational sense; against one who DOES (anyone with the code, if
you ship the default), the noise is recomputable and the mechanism
protects nothing. Therefore a real release REQUIRES a secret,
high-entropy, per-release salt — and these functions ENFORCE a
minimum salt length of 16 characters unless the caller passes
``allow_insecure_salt=True``, which relabels the run as what it
then is: seeded reproducible noise for benchmarking / oracle
verification, not a privacy guarantee. The repo's own battery
entries pass that flag explicitly (they publish synthetic TPC-H
fixtures and exist to hash-check the mechanism cross-engine).

Scale shape: one hash-aggregate per release (|groups| rows out),
noise applied as a narrow map over the aggregate — the same cost
profile as the un-noised aggregate. No per-row state, no extra
shuffle.

Reference parity: none — the 98-LoC reference has no privacy
surface; this extends SURVEY.md §2.12 beside the release gates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from top_produce_etl_spark.functions.portable_hash import (
    COMPOSITE_BITS,
    composite_hash_full_col,
    composite_hash_full_sql,
)

_U_DENOM = 1 << COMPOSITE_BITS  # 2^56

_MIN_SALT_LEN = 16


def _check_salt(salt: str, allow_insecure_salt: bool) -> None:
    """Reject short (low-entropy / code-visible-default) salts unless
    the caller explicitly opts into reproducible-noise mode. The
    check is a length floor, not an entropy measure — it exists to
    make 'I shipped the default salt' impossible by accident, which
    is the failure mode the round-7 advisor flagged."""
    if allow_insecure_salt:
        return
    if len(salt) < _MIN_SALT_LEN:
        raise ValueError(
            f"salt {salt!r} is shorter than {_MIN_SALT_LEN} chars: a "
            "real ε-DP release needs a secret, high-entropy, "
            "per-release salt (the noise is recomputable by anyone "
            "who knows it). Pass allow_insecure_salt=True only for "
            "benchmarking/verification runs, which are then seeded "
            "reproducible noise, not a privacy guarantee."
        )


def _key_expr_spark(salt: str, group_cols: list[str]) -> str:
    parts = ", ".join(
        f"coalesce(CAST({c} AS STRING), '\\\\N')" for c in group_cols
    )
    return f"concat('{salt}', '|', concat_ws('|', {parts}))"


def _key_expr_duck(salt: str, group_sql: list[str]) -> str:
    parts = ", ".join(
        f"coalesce(CAST({c} AS VARCHAR), '\\N')" for c in group_sql
    )
    return f"concat('{salt}', '|', concat_ws('|', {parts}))"


def _laplace_noise_col(salt: str, group_cols: list[str], b: float) -> Column:
    """Deterministic Laplace(b) draw per group key (Spark side).
    Hashes the FULL salted key — keys sharing a 40-char prefix draw
    independent noise (round-8 fix)."""
    u = (
        composite_hash_full_col(_key_expr_spark(salt, group_cols))
        .cast("double")
        + F.lit(0.5)
    ) / F.lit(float(_U_DENOM))
    centered = u - F.lit(0.5)
    return (
        F.lit(-float(b))
        * F.signum(centered)
        * F.log(F.lit(1.0) - 2.0 * F.abs(centered))
    )


def _laplace_noise_sql(salt: str, group_sql: list[str], b: float) -> str:
    """Bit-identical DuckDB twin of :func:`_laplace_noise_col`."""
    h = composite_hash_full_sql(_key_expr_duck(salt, group_sql))
    u = f"((CAST(({h}) AS DOUBLE) + 0.5) / {float(_U_DENOM)!r})"
    c = f"({u} - 0.5)"
    return (
        f"({-float(b)!r} * sign({c}) * ln(1.0 - 2.0 * abs({c})))"
    )


def dp_noisy_counts(
    df: DataFrame,
    group_cols: list[str],
    epsilon: float,
    salt: str = "dp-v1",
    allow_insecure_salt: bool = False,
) -> DataFrame:
    """ε-DP group counts: ``noisy_count = count + round(Lap(1/ε))``
    (count sensitivity = 1). Output: (group_cols…, noisy_count) —
    never the exact count beside it (exact − noisy would hand back
    the noise). Groups with small true counts can legitimately
    release negative values; clamping would bias the release, so we
    don't."""
    if epsilon <= 0:
        raise ValueError(f"epsilon must be > 0, got {epsilon}")
    _check_salt(salt, allow_insecure_salt)
    noise = _laplace_noise_col(salt, group_cols, 1.0 / epsilon)
    return (
        df.groupBy(*group_cols)
        .agg(F.count(F.lit(1)).alias("__n"))
        .select(
            *group_cols,
            (F.col("__n") + F.round(noise).cast("bigint")).alias(
                "noisy_count"
            ),
        )
    )


def dp_noisy_sum(
    df: DataFrame,
    group_cols: list[str],
    value_sql: str,
    clip_lo: float,
    clip_hi: float,
    epsilon: float,
    salt: str = "dp-v1",
    allow_insecure_salt: bool = False,
) -> DataFrame:
    """ε-DP group sums: values are CLIPPED into [clip_lo, clip_hi]
    first (that clip — not the data — is what bounds the
    sensitivity Δ = max(|lo|, |hi|)), summed exactly in DECIMAL,
    then released with Lap(Δ/ε) in 1e3 fixed point. Output:
    (group_cols…, noisy_sum_milli bigint)."""
    if epsilon <= 0:
        raise ValueError(f"epsilon must be > 0, got {epsilon}")
    _check_salt(salt, allow_insecure_salt)
    if clip_lo >= clip_hi:
        raise ValueError(f"clip_lo {clip_lo} must be < clip_hi {clip_hi}")
    sens = max(abs(clip_lo), abs(clip_hi))
    noise = _laplace_noise_col(salt, group_cols, sens / epsilon)
    clipped = F.least(
        F.greatest(
            F.expr(value_sql).cast("double"), F.lit(float(clip_lo))
        ),
        F.lit(float(clip_hi)),
    )
    return (
        df.groupBy(*group_cols)
        .agg(
            F.sum(clipped.cast("decimal(28,6)"))
            .cast("double")
            .alias("__s")
        )
        .select(
            *group_cols,
            F.round((F.col("__s") + noise) * 1000.0)
            .cast("bigint")
            .alias("noisy_sum_milli"),
        )
    )


def dp_noisy_counts_oracle_sql(
    from_sql: str,
    group_sql: list[str],
    epsilon: float,
    salt: str = "dp-v1",
    allow_insecure_salt: bool = False,
) -> str:
    """DuckDB twin of :func:`dp_noisy_counts` (bit-identical)."""
    _check_salt(salt, allow_insecure_salt)
    g = ", ".join(group_sql)
    noise = _laplace_noise_sql(salt, group_sql, 1.0 / epsilon)
    return f"""
    SELECT {g},
           COUNT(*) + CAST(round({noise}) AS BIGINT) AS noisy_count
    FROM {from_sql}
    GROUP BY {g}
    """


def dp_noisy_sum_oracle_sql(
    from_sql: str,
    group_sql: list[str],
    value_sql: str,
    clip_lo: float,
    clip_hi: float,
    epsilon: float,
    salt: str = "dp-v1",
    allow_insecure_salt: bool = False,
) -> str:
    """DuckDB twin of :func:`dp_noisy_sum` (bit-identical)."""
    _check_salt(salt, allow_insecure_salt)
    g = ", ".join(group_sql)
    sens = max(abs(clip_lo), abs(clip_hi))
    noise = _laplace_noise_sql(salt, group_sql, sens / epsilon)
    clipped = (
        f"least(greatest(CAST({value_sql} AS DOUBLE), "
        f"{float(clip_lo)!r}), {float(clip_hi)!r})"
    )
    return f"""
    SELECT {g},
           CAST(round(
               (CAST(SUM(CAST({clipped} AS DECIMAL(28,6))) AS DOUBLE)
                + {noise}) * 1000.0
           ) AS BIGINT) AS noisy_sum_milli
    FROM {from_sql}
    GROUP BY {g}
    """
