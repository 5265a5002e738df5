"""Within-document repetition stats (the Gopher-style quality gates).

Cross-doc dedup removes COPIES; these gates remove DEGENERATE docs —
keyword-stuffed pages, scraped tag clouds, log spew — whose text is
mostly self-repetition. The two standard signals (Gopher's repetition
filters, also used by RefinedWeb/Dolma):

- duplicate-line fraction: share of a doc's lines that are repeats of
  an earlier identical line in the SAME doc;
- top n-gram fraction: share of the doc's word n-grams claimed by its
  single most frequent n-gram.

Both are computed as explode → two-level map-side-combinable groupBys
keyed on (doc_id, unit) then (doc_id) — per-doc group sizes are bounded
by document length, so there is no skew surface, and nothing here runs
Python. Gopher thresholds (dup-line 0.30, top-2-gram 0.20) are the
defaults of :func:`repetition_stats`'s ``repetitive`` flag; ours counts
n-grams (Gopher weighs by characters) — a documented proxy that keeps
the whole gate in codegen.

Reference analog: gnames flags "virus-like" overloaded names whose
match sets are degenerate (`/root/reference/internal/io/pgio/
match_records_map.go:17-22` truncates at 1000 records); here the
degeneracy test is intra-document.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from gnames_spark.functions.shingles import shingle_strings
from gnames_spark.operators.linededup import explode_lines

DUP_LINE_MAX = 0.30
TOP_NGRAM_MAX = 0.20


def repetition_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    delim: str = "\n",
    ngram: int = 2,
    dup_line_max: float = DUP_LINE_MAX,
    top_ngram_max: float = TOP_NGRAM_MAX,
) -> DataFrame:
    """Per-doc repetition profile + the boolean ``repetitive`` gate.

    Returns one row per input doc: (id, n_lines, n_dup_lines,
    dup_line_frac, n_grams, top_gram_n, top_gram_frac, repetitive).
    Docs with no non-empty lines / fewer than ``ngram`` tokens get
    zero counts and fractions (never flagged).
    """
    # equality-only keys: hash lines/grams BEFORE the groupBy so the
    # shuffle ships 16-byte keys, never the strings (the linededup.py
    # posture; same accepted 64-bit collision risk, documented there)
    lines = explode_lines(docs, text_col, id_col, delim).select(
        id_col, F.xxhash64("line").alias("lh")
    )
    line_stats = (
        lines.groupBy(id_col, "lh")
        .agg(F.count("*").alias("c"))
        .groupBy(id_col)
        .agg(
            F.sum("c").alias("n_lines"),
            (F.sum("c") - F.count("*")).alias("n_dup_lines"),
        )
    )

    grams = docs.select(
        id_col, F.explode(shingle_strings(text_col, ngram)).alias("gram")
    ).select(id_col, F.xxhash64("gram").alias("gh"))
    gram_stats = (
        grams.groupBy(id_col, "gh")
        .agg(F.count("*").alias("c"))
        .groupBy(id_col)
        .agg(F.sum("c").alias("n_grams"), F.max("c").alias("top_gram_n"))
    )

    dup_frac = F.round(
        F.col("n_dup_lines") / F.greatest(F.col("n_lines"), F.lit(1)), 6
    )
    top_frac = F.round(
        F.col("top_gram_n") / F.greatest(F.col("n_grams"), F.lit(1)), 6
    )
    return (
        docs.select(id_col)
        .join(line_stats, id_col, "left")
        .join(gram_stats, id_col, "left")
        .select(
            id_col,
            *[
                F.coalesce(c, F.lit(0)).cast("long").alias(c)
                for c in ("n_lines", "n_dup_lines", "n_grams", "top_gram_n")
            ],
        )
        .select(
            "*",
            dup_frac.alias("dup_line_frac"),
            top_frac.alias("top_gram_frac"),
        )
        .withColumn(
            "repetitive",
            (F.col("dup_line_frac") > dup_line_max)
            | (F.col("top_gram_frac") > top_ngram_max),
        )
    )


def dup_ngram_stats(
    docs: DataFrame,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The character-weighted Gopher repetition signal: fraction of
    n-gram characters belonging to n-grams that occur more than once
    WITHIN the doc (table A1's "fraction of characters in duplicate
    n-grams", n = 5..10; :func:`repetition_stats`' top-bigram fraction
    is the companion top-n-gram family).

    Per doc: (id, n_grams, dup_gram_char_frac) where the fraction is
    sum(len(g) * count(g)) over grams with count >= 2, divided by
    sum(len(g) * count(g)) over all grams — rounded to 6 digits. Same
    skew posture as the rest of the module: (doc, gram) → (doc)
    stacked map-side-combinable groupBys, group sizes bounded by doc
    length, no Python."""
    # hash-keyed like repetition_stats: the character weight is taken
    # per occurrence BEFORE the shuffle, so only (id, hash, len) rows
    # move; max(L) is exact (equal grams have equal lengths)
    grams = docs.select(
        id_col, F.explode(shingle_strings(text_col, n)).alias("gram")
    ).select(id_col, F.xxhash64("gram").alias("gh"), F.length("gram").alias("gl"))
    per_gram = (
        grams.groupBy(id_col, "gh")
        .agg(F.count("*").alias("c"), F.max("gl").alias("L"))
    )
    agg = per_gram.groupBy(id_col).agg(
        F.sum("c").alias("n_grams"),
        F.sum(F.col("c") * F.col("L")).alias("chars"),
        F.sum(F.when(F.col("c") >= 2, F.col("c") * F.col("L")).otherwise(0))
        .alias("dup_chars"),
    )
    return (
        docs.select(id_col)
        .join(agg, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.round(
                F.coalesce("dup_chars", F.lit(0))
                / F.greatest(F.coalesce("chars", F.lit(0)), F.lit(1)),
                6,
            ).alias("dup_gram_char_frac"),
        )
    )
