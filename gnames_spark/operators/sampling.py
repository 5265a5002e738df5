"""Deterministic hash sampling — corpus mixing for training data.

After dedup and quality gating, a training corpus is MIXED: keep 100%
of one stratum, 30% of another (FineWeb/Dolma-style source and quality
weighting). The sampler must be (a) deterministic — reruns, resumed
checkpoints, and the incremental fold-in must all agree on every row;
(b) engine-portable — an auditor recomputing membership elsewhere gets
the same rows; (c) a pure filter — no shuffle, no state.

``F.rand(seed)`` fails (a): it is seeded per partition index, so any
repartition or source-split change reshuffles membership. Instead each
row gets a uniform u in [0,1) from a cryptographic-hash prefix of
(salt, key):

    u = int(md5(salt || key)[:8 hex]) / 2^32

md5's avalanche makes the 32-bit prefix uniform regardless of key
structure (sequential ids included); 2^-32 granularity is far below
any sampling-rate precision anyone configures. The salt decorrelates
independent sampling decisions over the same keys (two mixes with
different salts are independent events, same salt = same draw —
exactly the reproducibility contract). md5 (not xxhash64) because the
DuckDB/auditor side reproduces it verbatim — parity is pinned by the
``dedup_stratified_sample`` driver oracle.

Scale: everything here is a whole-stage-codegen filter over the scan —
no Python, no shuffle, no driver state.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, functions as F

HASH_DENOM = float(1 << 32)
_SALT_RE = re.compile(r"[A-Za-z0-9._:-]*\Z")


def hash_prefix(key_col: str | Column, salt: str = "") -> Column:
    """Raw 32-bit md5-prefix of (salt, key) as a bigint in [0, 2^32) —
    the engine-portable hash every deterministic draw here derives from
    (DuckDB side: ``cast(('0x' || substr(md5(..), 1, 8)) as bigint)``).

    ``key_col`` is a column name or a Column, resolved through the
    Column API (never spliced into SQL text, so arbitrary column names
    are safe). ``salt`` is restricted to [A-Za-z0-9._:-] — it is part
    of the cross-engine reproducibility contract (the auditor engine
    concatenates it verbatim), and a run/date tag never needs more.
    """
    if not _SALT_RE.match(salt):
        raise ValueError(f"salt must match [A-Za-z0-9._:-]*: {salt!r}")
    key = F.col(key_col) if isinstance(key_col, str) else key_col
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, 8),
        16,
        10,
    ).cast("bigint")


def hash_uniform(key_col: str | Column, salt: str = "") -> Column:
    """Deterministic uniform [0,1) per row: md5-prefix of (salt, key)."""
    return hash_prefix(key_col, salt) / F.lit(HASH_DENOM)


def hash_sample(
    df: DataFrame, rate: float, key_col: str = "doc_id", salt: str = ""
) -> DataFrame:
    """Keep each row independently with probability ``rate`` —
    deterministically in (salt, key)."""
    return df.filter(hash_uniform(key_col, salt) < rate)


def temperature_rates(
    df: DataFrame, stratum_col: str, alpha: float
) -> DataFrame:
    """Per-stratum keep rates for temperature-``alpha`` mixing:
    rate_s = min_t(c_t^(1-alpha)) / c_s^(1-alpha), rounded to 6 digits
    (part of the contract, so an auditor engine reproduces membership).

    This realizes the multilingual-training recipe (sample stratum s
    with probability proportional to c_s^alpha) as a pure DOWN-sampling
    mix: the stratum minimizing c^(1-alpha) keeps 100% and every other
    stratum keeps the exact rate that lands the kept-size distribution
    on the c^alpha law. alpha=1 keeps everything; alpha=0 equalizes
    stratum sizes. Requires 0 <= alpha <= 1 (upsampling is a repeat
    operator, not a filter).

    Scale: one map-side-combinable count per stratum; the rates table
    is |strata| rows — broadcast onward."""
    return _anchored_rates(df, stratum_col, alpha, F.min)


def temperature_mix(
    df: DataFrame,
    stratum_col: str,
    alpha: float,
    key_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Temperature-``alpha`` corpus mix: down-sample each stratum to the
    c^alpha share via :func:`temperature_rates`, membership decided by
    the deterministic md5-prefix uniform (portable, rerun-stable).

    The rates join broadcasts (|strata| rows); the keep decision stays
    a codegen filter — no shuffle of the data side. The join is
    NULL-SAFE: rows with a NULL stratum form their own stratum (and so
    survive alpha=1 like everyone else) instead of being silently
    dropped by a plain equi-join."""
    rates = temperature_rates(df, stratum_col, alpha).select(
        F.col(stratum_col).alias("_tm_stratum"),  # avoid user columns
        F.col("rate").alias("_tm_rate"),
    )
    return (
        df.join(
            F.broadcast(rates),
            F.col(stratum_col).eqNullSafe(F.col("_tm_stratum")),
        )
        .filter(hash_uniform(key_col, salt) < F.col("_tm_rate"))
        .drop("_tm_stratum", "_tm_rate")
    )


def deterministic_repeat(
    df: DataFrame,
    rate_col: str | Column,
    key_col: str = "doc_id",
    salt: str = "",
    max_rate: float = 100_000.0,
) -> DataFrame:
    """Repeat each row to hit an arbitrary per-row target rate >= 0 —
    deterministically in (salt, key). Each row is emitted
    floor(rate) + 1 times if its md5-prefix uniform falls below
    frac(rate), else floor(rate) times, so per-row expected
    multiplicity is EXACTLY its rate, and every engine recomputing the
    draw gets the same copies. Adds a 0-based ``copy`` column; rows
    whose resolved copy count is 0 disappear (rate < 1 therefore
    subsumes down-sampling: floor = 0, keep-one with probability rate).

    Scale: a codegen filter + a bounded explode (ceil(rate) rows out
    per row in) — no shuffle, no Python, no driver state. The explode
    FOLLOWS any filter Catalyst can push to the scan, and output size
    is sum(rate) rows by construction. The bound is ENFORCED: the
    repeat array is 8 B x rate in executor memory per row, so a rate
    above ``max_rate`` (default 1e5 ≈ 0.8 MB/row) fails the job with a
    clear message instead of GC-thrashing — a corpus whose mix law
    demands 1e5+ fractional epochs of a stratum needs a different plan
    (cross-join against a range table, or a cap on the law), not a
    silent 10M-element per-row array. A NULL rate drops the row (the
    n_copies comparison is NULL, which the >0 filter rejects) — callers
    wanting keep-on-NULL must coalesce upstream."""
    rate = F.col(rate_col) if isinstance(rate_col, str) else rate_col
    # null-safe: a NULL rate passes through (and is dropped by the
    # n_copies > 0 filter, per the contract above) — only a PRESENT
    # rate above the cap aborts
    checked = F.when(
        rate.isNull() | (rate <= F.lit(float(max_rate))), rate
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    f"deterministic_repeat: rate exceeds max_rate="
                    f"{max_rate:g} (raise max_rate knowingly — the "
                    f"repeat array costs 8 B x rate per row): "
                ),
                F.coalesce(rate.cast("string"), F.lit("NULL")),
            )
        ).cast("double")
    )
    n_copies = (
        F.floor(checked)
        + (hash_uniform(key_col, salt) < checked - F.floor(checked)).cast("long")
    )
    return (
        df.withColumn("_dr_n", n_copies)
        .filter(F.col("_dr_n") > 0)
        .withColumn(
            "copy",
            F.explode(F.sequence(F.lit(0).cast("long"), F.col("_dr_n") - 1)),
        )
        .drop("_dr_n")
    )


def repeat_rates(df: DataFrame, stratum_col: str, alpha: float) -> DataFrame:
    """Per-stratum REPEAT rates for temperature-``alpha`` upsampling:
    rate_s = max_t(c_t^(1-alpha)) / c_s^(1-alpha) >= 1, rounded to 6
    digits (the same cross-engine contract as temperature_rates).

    The mirror image of :func:`temperature_rates`: instead of anchoring
    the SMALLEST c^(1-alpha) at keep-rate 1 and down-sampling the rest,
    it anchors the LARGEST at one copy and REPEATS every other stratum
    (fractional epochs), so expected emitted sizes follow the same
    c^alpha law without discarding any head-stratum data — the
    low-resource-language recipe. alpha=1 emits everything once;
    alpha=0 equalizes expected stratum sizes at the head's count.

    Scale: one map-side-combinable count per stratum; |strata| rows."""
    return _anchored_rates(df, stratum_col, alpha, F.max)


def _anchored_rates(df, stratum_col, alpha, anchor) -> DataFrame:
    """Shared c^alpha rate law: rate_s = anchor_t(c_t^(1-alpha)) /
    c_s^(1-alpha), rounded to 6 digits. ``anchor`` = F.min gives the
    down-sampling rates (all <= 1, smallest-c^(1-alpha) stratum kept
    whole); F.max gives the repeat rates (all >= 1, head stratum
    emitted once). ONE place owns the cross-engine contract (the 6-digit
    rounding and pow formulation the DuckDB oracles replay) so the two
    duals can never drift."""
    if not (0.0 <= alpha <= 1.0):
        raise ValueError(f"alpha must be in [0, 1]: {alpha}")
    counts = df.groupBy(stratum_col).agg(F.count("*").alias("n_total"))
    eff = counts.agg(
        anchor(F.pow(F.col("n_total"), F.lit(1.0 - alpha))).alias("_m")
    )
    return counts.crossJoin(F.broadcast(eff)).select(
        stratum_col,
        "n_total",
        F.round(
            F.col("_m") / F.pow(F.col("n_total"), F.lit(1.0 - alpha)), 6
        ).alias("rate"),
    )


def temperature_repeat(
    df: DataFrame,
    stratum_col: str,
    alpha: float,
    key_col: str = "doc_id",
    salt: str = "",
    max_rate: float = 100_000.0,
) -> DataFrame:
    """Temperature-``alpha`` corpus mix by UPSAMPLING: repeat each
    low-resource stratum rate_s = max_t(c_t^(1-alpha)) / c_s^(1-alpha)
    times in expectation (integer repeats + one hash-decided fractional
    copy per doc, :func:`deterministic_repeat`), so emitted sizes
    follow the c^alpha law while the head stratum keeps exactly one
    copy of everything. The down-sampling dual of
    :func:`temperature_mix` — use this when low-resource strata must
    be repeated (fractional epochs), not when the corpus must shrink.
    Adds a 0-based ``copy`` column.

    The rates join broadcasts (|strata| rows) and is NULL-SAFE (a NULL
    stratum is its own stratum); the repeat is a codegen filter +
    bounded explode — no shuffle of the data side. ``max_rate`` passes
    through to :func:`deterministic_repeat`'s memory guard: at alpha=0
    the head/tail count ratio IS the largest rate, so a legitimately
    extreme corpus (1M en docs vs 5 of a rare language = rate 2e5)
    must raise it knowingly (CLI: ``--mix-max-rate``)."""
    rates = repeat_rates(df, stratum_col, alpha).select(
        F.col(stratum_col).alias("_tr_stratum"),
        F.col("rate").alias("_tr_rate"),
    )
    return (
        df.join(
            F.broadcast(rates),
            F.col(stratum_col).eqNullSafe(F.col("_tr_stratum")),
        )
        .transform(
            lambda d: deterministic_repeat(
                d, F.col("_tr_rate"), key_col=key_col, salt=salt,
                max_rate=max_rate,
            )
        )
        .drop("_tr_stratum", "_tr_rate")
    )


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    stratum_col: str,
    key_col: str = "doc_id",
    salt: str = "",
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum keep rates (corpus mixing). Strata missing from
    ``rates`` keep with ``default_rate`` (0.0 = drop unknown strata —
    the safe default for an allowlist-style mix)."""
    rate = F.lit(float(default_rate))
    for value, r in sorted(rates.items()):
        rate = F.when(F.col(stratum_col) == value, float(r)).otherwise(rate)
    return df.filter(hash_uniform(key_col, salt) < rate)
