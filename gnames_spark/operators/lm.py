"""Corpus-trained unigram log-prob scoring (the perplexity-filter shape).

CCNet ranks crawl text by language-model perplexity; the heuristic
gates (textstats) catch structural junk, but gibberish with normal
structure needs a statistical score. A full KenLM is a model artifact;
the ENGINE capability is: train token statistics ON the corpus
distributedly, then score every doc by its mean token surprisal
(-ln p). Gibberish/OCR noise scores high, ordinary prose low — and the
operator contract (train → broadcastable model table → scoring join →
per-doc aggregate) is exactly what a higher-order n-gram LM would use.

Determinism contract (this is a driver-oracle'd operator — floats must
match an independent engine bit-for-bit after rounding):
- each token's surprisal is ROUNDED to 8 digits first (libm ln()
  differs across engines by <= 1 ulp ~ 1e-16 relative — far below
  5e-9, so rounding makes both engines agree exactly);
- the per-doc sum runs in DECIMAL(28,12) — decimal addition is exact
  and order-independent, so partition order / combiner shape can never
  flip a low bit the way a double sum can;
- the mean is rounded to 6 digits at the end.

Scale:
- training is one map-side-combinable groupBy(token) over exploded
  tokens; vocabulary is capped at ``max_vocab`` by frequency with a
  deterministic token tiebreak. The top-k is NOT an orderBy+limit
  (TakeOrdered merges k rows PER PARTITION at the driver — fine
  locally, gigabytes at 10^5 partitions): instead the tiny
  count-of-counts histogram (one groupBy over the token table,
  thousands of rows for a Zipfian corpus) picks the frequency
  threshold on the driver, tokens strictly above it pass by a pure
  filter, and only the boundary-count TIE SET — bounded, typically a
  sliver — goes through an orderBy+limit for the deterministic token
  tiebreak. Everything below the cap scores as OOV at a configurable
  floor, the standard open-vocabulary treatment.
- scoring joins exploded tokens to the model on the token string; the
  model side is tiny (<= max_vocab rows) so AQE broadcasts it; hot
  tokens ("the" in half the corpus) are probe-side only.
- no windows, no Python, no driver-side vocab collection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from gnames_spark.functions.shingles import tokens

LOGP_DIGITS = 8     # pre-sum rounding: kills cross-libm ln() noise
SCORE_DIGITS = 6    # final mean rounding
DECIMAL_T = "decimal(28, 12)"


def _top_k_tokens(counts: DataFrame, k: int) -> DataFrame:
    """Top-``k`` (count desc, token asc) rows of a (token, c) table,
    selected scale-safely: the count-of-counts histogram (tiny) picks
    the threshold count on the driver; only the boundary-count tie set
    is sorted. Result is identical to orderBy(c desc, token).limit(k)."""
    hist = sorted(
        (
            (r["c"], r["n"])
            for r in counts.groupBy("c").agg(F.count("*").alias("n")).collect()
        ),
        reverse=True,
    )
    taken = 0
    threshold = None
    for c_val, n in hist:
        if taken + n > k:
            threshold = c_val
            break
        taken += n
    if threshold is None:  # fewer than k tokens in total
        return counts
    high = counts.filter(F.col("c") > threshold)
    ties = (
        counts.filter(F.col("c") == threshold)
        .orderBy(F.asc("token"))
        .limit(k - taken)
    )
    return high.unionByName(ties)


def train_unigram(
    docs: DataFrame, text_col: str = "text", max_vocab: int = 65536
) -> DataFrame:
    """Unigram model table: (token, logp) for the ``max_vocab`` most
    frequent tokens (ties broken by token string, deterministically),
    with logp = round(ln(count / total_tokens), 8). ``total`` counts
    ALL tokens (in- and out-of-vocab), so probabilities are honest
    MLE over the corpus, not renormalized over the kept vocab."""
    counts = (
        docs.select(F.explode(tokens(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("c"))
        # consumed three times (histogram, threshold filters, total):
        # materialize the small vocab table once instead of re-running
        # the corpus-wide explode+groupBy per consumer
        .localCheckpoint(eager=True)
    )
    total = counts.agg(F.sum("c").alias("total"))
    kept = _top_k_tokens(counts, max_vocab)
    return kept.crossJoin(F.broadcast(total)).select(
        "token",
        F.round(F.log(F.col("c") / F.col("total")), LOGP_DIGITS).alias("logp"),
    )


def score_docs(
    docs: DataFrame,
    model: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    oov_logp: float = -20.0,
) -> DataFrame:
    """Per-doc mean token surprisal against a unigram model table.

    Returns (id, n_tokens, avg_neg_logprob) — higher = more surprising
    under the model. Docs with no tokens get n_tokens=0 and NULL score.
    OOV tokens score at ``oov_logp`` (a floor ~e^-20 — rarer than any
    in-vocab token can be at web scale)."""
    tok = docs.select(id_col, F.explode(tokens(text_col)).alias("token"))
    scored = tok.join(F.broadcast(model), "token", "left").select(
        id_col,
        F.coalesce("logp", F.lit(round(oov_logp, LOGP_DIGITS)))
        .cast(DECIMAL_T)
        .alias("logp"),
    )
    agg = scored.groupBy(id_col).agg(
        F.count("*").alias("n_tokens"),
        F.sum("logp").alias("sum_logp"),
    )
    out = docs.select(id_col).join(agg, id_col, "left").select(
        id_col,
        F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
        F.when(
            F.col("n_tokens") > 0,
            # exact decimal sum -> ONE double cast -> ONE IEEE divide:
            # both steps are bit-deterministic in any engine
            F.round(
                -F.col("sum_logp").cast("double") / F.col("n_tokens"),
                SCORE_DIGITS,
            ),
        ).alias("avg_neg_logprob"),
    )
    return out


def _bigrams(text_col: str):
    """(prev, token) struct array from the token stream — pure Catalyst
    (two slices zipped), no explode-then-window."""
    t = tokens(text_col)
    m = F.greatest(F.size(t) - F.lit(1), F.lit(0))  # 0/1-token docs: empty
    return F.arrays_zip(
        F.slice(t, 1, m).alias("prev"),
        F.slice(t, 2, m).alias("token"),
    )


def train_bigram(
    docs: DataFrame, text_col: str = "text", min_count: int = 1
) -> DataFrame:
    """Bigram conditional model: (prev, token, logp) with
    logp = round(ln(c(prev, token) / c(prev)), 8) — honest MLE
    (contexts counted over ALL pairs, before any cap), kept rows
    filtered to pair count >= ``min_count``.

    The conditional extension of :func:`train_unigram` — the shape a
    real perplexity filter (KenLM n-gram) uses; same determinism
    recipe. Scale: one map-side-combinable groupBy over exploded pairs;
    context counts REUSE the pair table (second tiny groupBy), and the
    cap is a pure count filter — no top-k over the pair vocabulary."""
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1: {min_count}")
    pairs = (
        docs.select(F.explode(_bigrams(text_col)).alias("bg"))
        .select("bg.prev", "bg.token")
        .groupBy("prev", "token")
        .agg(F.count("*").alias("c"))
        .localCheckpoint(eager=True)  # consumed twice: contexts + kept rows
    )
    ctx = pairs.groupBy("prev").agg(F.sum("c").alias("c_prev"))
    return (
        pairs.filter(F.col("c") >= min_count)
        .join(ctx, "prev")
        .select(
            "prev",
            "token",
            F.round(F.log(F.col("c") / F.col("c_prev")), LOGP_DIGITS).alias(
                "logp"
            ),
        )
    )


def score_docs_bigram(
    docs: DataFrame,
    model: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    oov_logp: float = -20.0,
) -> DataFrame:
    """Per-doc mean bigram surprisal: (id, n_bigrams, avg_neg_logprob).

    Unseen (prev, token) pairs score at the ``oov_logp`` floor; docs
    with < 2 tokens have n_bigrams = 0 and a NULL score. Same
    numeric contract as :func:`score_docs` (8-digit logp, exact
    DECIMAL sum, one double divide, 6-digit mean). The model join
    ships (prev, token, logp) — AQE broadcasts it under any realistic
    ``min_count``; hot contexts are probe-side."""
    bg = docs.select(
        id_col, F.explode(_bigrams(text_col)).alias("bg")
    ).select(id_col, "bg.prev", "bg.token")
    scored = bg.join(model, ["prev", "token"], "left").select(
        id_col,
        F.coalesce("logp", F.lit(round(oov_logp, LOGP_DIGITS)))
        .cast(DECIMAL_T)
        .alias("logp"),
    )
    agg = scored.groupBy(id_col).agg(
        F.count("*").alias("n_bigrams"),
        F.sum("logp").alias("sum_logp"),
    )
    return docs.select(id_col).join(agg, id_col, "left").select(
        id_col,
        F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
        F.when(
            F.col("n_bigrams") > 0,
            F.round(
                -F.col("sum_logp").cast("double") / F.col("n_bigrams"),
                SCORE_DIGITS,
            ),
        ).alias("avg_neg_logprob"),
    )


def zipf_head(
    docs: DataFrame, k: int = 100, text_col: str = "text"
) -> DataFrame:
    """Corpus frequency-head report: the top-``k`` tokens by count as
    (rank, token, n_occurrences, freq) — the first sanity plot of any
    web corpus (does the head follow Zipf? is position 1 a boilerplate
    artifact? did a template token explode?). Deterministic: rank
    orders by (count desc, token asc); freq = round(c / total, 8) is
    one IEEE double divide, bit-equal in any engine.

    Scale: token counting is the same map-side-combinable groupBy as
    :func:`train_unigram`; the top-k selection reuses the
    histogram-threshold trick (:func:`_top_k_tokens` — no TakeOrdered
    over the full vocab), so the only globally-ordered step is a
    row_number window over the k surviving rows."""
    counts = (
        docs.select(F.explode(tokens(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("c"))
        # consumed twice (histogram + threshold filters) and summed once
        .localCheckpoint(eager=True)
    )
    total = counts.agg(F.sum("c").alias("total"))
    from pyspark.sql import Window as W

    w = W.orderBy(F.desc("c"), F.asc("token"))  # bounded: k rows survive
    return (
        _top_k_tokens(counts, k)
        .crossJoin(F.broadcast(total))
        .withColumn("rank", F.row_number().over(w))
        .select(
            F.col("rank").cast("long").alias("rank"),
            "token",
            F.col("c").cast("long").alias("n_occurrences"),
            F.round(
                F.col("c").cast("double") / F.col("total").cast("double"), 8
            ).alias("freq"),
        )
    )


def tfidf_keywords(
    docs: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` tf-idf keywords per doc: (id, term, score, rank).

    The corpus-statistics sibling of :func:`score_docs` — surprisal
    ranks DOCS by the model, tf-idf ranks TERMS by the doc-vs-corpus
    contrast (the standard keyword/topic signal a curation pipeline
    logs per document). Same determinism recipe: idf = round(ln(N/df),
    8) so cross-libm ln noise dies, score = round(tf * idf, 6), ties
    broken by term string.

    Scale: tf is a (doc, token) groupBy (bounded groups — doc
    vocabulary); df reuses the tf table, so it is exact
    distinct-docs-per-token with no extra distinct; the per-doc top-k
    window partitions on the doc id — bounded by doc vocabulary, the
    same shape as the o6 top-k-per-group operator. The idf join ships
    (token, df) only; hot tokens are probe-side.
    """
    from pyspark.sql import Window as W

    tok = docs.select(id_col, F.explode(tokens(text_col)).alias("token"))
    tf = tok.groupBy(id_col, "token").agg(F.count("*").alias("tf"))
    df_t = tf.groupBy("token").agg(F.count("*").alias("df"))
    n = docs.agg(F.count("*").alias("n"))
    scored = (
        tf.join(df_t, "token")
        .crossJoin(F.broadcast(n))
        .select(
            id_col,
            F.col("token").alias("term"),
            F.round(
                F.col("tf")
                * F.round(F.log(F.col("n") / F.col("df")), LOGP_DIGITS),
                SCORE_DIGITS,
            ).alias("score"),
        )
    )
    w = W.partitionBy(id_col).orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "score", F.col("rank").cast("long").alias("rank"))
    )
