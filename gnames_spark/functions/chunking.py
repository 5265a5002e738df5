"""Training-window chunking — the step between a clean corpus and a
training run.

Pretraining pipelines don't feed documents; they feed fixed-size token
windows, usually with overlap so no span is only ever seen split
across a boundary. This operator emits one row per window:
(id, chunk_id, chunk_text, n_tokens) for windows of ``chunk_tokens``
contract tokens stepped by ``stride``.

Window math (frozen, integer-exact in both engines):
  n_windows = 0                       if the doc has no tokens
            = 1                       if n_tokens <= chunk_tokens
            = 1 + (n - c + s - 1)/s   otherwise (integer division) —
so the last window may be partial but always starts < n (no empty
windows, no dropped tail tokens). ``chunk_text`` is the window's
tokens re-joined with single spaces: chunking happens AFTER
normalization by contract (a trainer tokenizes the chunk anyway;
original byte offsets are a provenance concern, which the pipeline
keeps at the doc level, not the window level).

Scale: pure Catalyst — the tokenizer binds once per row
(shingles._bind_tokens trick), windows explode JVM-side, nothing
shuffles until the caller decides where chunks go. A doc yields
O(n/stride) rows; the explode is the same shape as the shingle
explode the dedup path already runs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from gnames_spark.functions.shingles import tokenize_sql


def chunk_windows(
    col: str = "text", chunk_tokens: int = 512, stride: int | None = None
) -> Column:
    """Array of (chunk_id, chunk_text, n_tokens) structs per the
    window math above. ``stride`` defaults to ``chunk_tokens``
    (non-overlapping)."""
    c = int(chunk_tokens)
    s = int(stride if stride is not None else chunk_tokens)
    if not (1 <= s <= c):
        raise ValueError("need 1 <= stride <= chunk_tokens")
    toks = f"filter({tokenize_sql(col)}, t -> t != '')"
    n_win = (
        f"CASE WHEN size(ws) = 0 THEN 0 WHEN size(ws) <= {c} THEN 1 "
        f"ELSE 1 + ((size(ws) - {c} + {s} - 1) div {s}) END"
    )
    body = (
        f"CASE WHEN size(ws) = 0 THEN array() ELSE "
        f"transform(sequence(0, {n_win} - 1), i -> struct("
        f"i as chunk_id, "
        f"concat_ws(' ', slice(ws, i * {s} + 1, {c})) as chunk_text, "
        f"least({c}, size(ws) - i * {s}) as n_tokens)) END"
    )
    return F.expr(
        f"element_at(transform(array({toks}), ws -> {body}), 1)"
    )


def chunk_docs(
    docs: DataFrame,
    chunk_tokens: int = 512,
    stride: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """One row per training window: (id, chunk_id, chunk_text,
    n_tokens). Docs with no tokens yield no rows."""
    return docs.select(
        id_col,
        F.explode(chunk_windows(text_col, chunk_tokens, stride)).alias("w"),
    ).select(id_col, "w.chunk_id", "w.chunk_text", "w.n_tokens")
