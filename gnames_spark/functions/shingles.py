"""k-shingle generation — entirely JVM-side (whole-stage codegen).

The reference's analog is its 3-level canonical-form normalization
(`canonicals`/`canonical_fulls`/`canonical_stems`,
`/root/reference/migrations/gnames.hcl:1-42`): a precomputed match key per
name. Here the match key is the set of hashed word k-grams of the
document text.

Design note (scale): no Python runs here. Tokenization, sliding-window
k-grams and xxhash64 are Catalyst expressions, so the whole stage
compiles into WholeStageCodegen and shingles never materialize as
Python objects. The MinHash/SimHash pandas-UDF kernels downstream
consume the already-hashed int64 arrays over Arrow.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tokenizer shared by Spark and the DuckDB oracles: lowercase, split on
# whitespace runs. Keep in sync with oracle SQL in __spark_entry__.py.
TOKENIZE_EXPR = r"split(lower({col}), '\\s+')"


def tokens(col: str = "text") -> Column:
    """Lowercased whitespace tokens of ``col`` (drops empty tokens)."""
    return F.expr(f"filter({TOKENIZE_EXPR.format(col=col)}, t -> t != '')")


def token_hashes(col: str = "text") -> Column:
    """xxhash64 of each token — input to the SimHash kernel."""
    return F.expr(
        f"transform(filter({TOKENIZE_EXPR.format(col=col)}, t -> t != ''), t -> xxhash64(t))"
    )


def _bind_tokens(col: str, body: str, k: int) -> str:
    """Evaluate the tokenizer ONCE per row and bind it as lambda var
    ``ws`` inside ``body``.

    Higher-order expressions are interpreted (no codegen), and a
    textually-inlined tokenizer would re-run per shingle position —
    O(n^2) per document (measured 50.9s vs 4s for 60k docs). The
    single-element ``transform(array(toks), ws -> ...)`` trick gives the
    lambda a bound variable without needing an intermediate column.
    """
    toks = f"filter({TOKENIZE_EXPR.format(col=col)}, t -> t != '')"
    return (
        f"element_at(transform(array({toks}), ws -> "
        f"CASE WHEN size(ws) < {k} THEN array() ELSE {body} END), 1)"
    )


def shingle_strings(col: str = "text", k: int = 5) -> Column:
    """Word k-gram strings (space-joined). Used by oracles and tests;
    the pipeline uses :func:`shingles` (hashed) to keep rows narrow."""
    body = (
        f"transform(sequence(1, size(ws) - {k} + 1), "
        f"i -> concat_ws(' ', slice(ws, i, {k})))"
    )
    return F.expr(_bind_tokens(col, body, k))


def shingles(col: str = "text", k: int = 5) -> Column:
    """Hashed word k-shingles: array<long> of xxhash64(k-gram).

    A document shorter than k words yields an empty array; such docs are
    routed around the MinHash branch (they are still exact-dedupable via
    content hash) — the analog of the reference treating uninomials as
    exact-match-only by default (`/root/reference/README.md:46-47`).
    """
    body = (
        f"transform(sequence(1, size(ws) - {k} + 1), "
        f"i -> xxhash64(concat_ws(' ', slice(ws, i, {k}))))"
    )
    return F.expr(_bind_tokens(col, body, k))


def char_shingles(col: str = "text", k: int = 9) -> Column:
    """Hashed character k-shingles (for short-text corpora)."""
    return F.expr(
        f"CASE WHEN length({col}) < {k} THEN array() "
        f"ELSE transform(sequence(1, length({col}) - {k} + 1), "
        f"i -> xxhash64(substring({col}, i, {k}))) END"
    )


def shingle_set(col: str = "text", k: int = 5) -> Column:
    """Distinct hashed shingles — the set used for exact Jaccard."""
    return F.array_distinct(shingles(col, k))
