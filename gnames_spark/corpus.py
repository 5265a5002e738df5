"""Deterministic synthetic web-page corpus with planted duplicates.

Schema = BASELINE.json ``input_hint``: (url, warc_ts, html:binary,
text, lang). FIXTURES.md §1 defines the planted structure:

- exact copies           → gnames "Exact" match analog
- near-dups (J 0.75-0.98) → "Fuzzy" analog (seeded word substitutions)
- long shared substring  → "PartialExact" analog (suffix pass)
- boilerplate families   → hot-bucket overload analog
- singletons             → "NoMatch"
- Zipfian domains        → join-skew / salting exercise

Determinism contract: every byte of every row is a pure function of
(seed, doc_id). Generation is distributed — ``spark.range(n)`` +
``mapInPandas`` — and each row derives its own RNG from (seed, group,
slot), so output is independent of partitioning, row order, and
parallelism. No wall-clock anywhere (warc_ts is seed-derived).

Group layout: docs are organized in groups of GROUP_SLOTS consecutive
ids; the group's role (exact/near/substring/boilerplate/singleton) is a
deterministic hash of (seed, group). Slot 0 is the base page; slots
1..4 derive from it per the role. This makes ground truth recomputable
per-row with no shared state.
"""

from __future__ import annotations

import hashlib
import html as _html
from collections.abc import Iterator
from datetime import datetime, timezone

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

GROUP_SLOTS = 5
ROLES = ("exact", "near", "substring", "boilerplate", "singleton")
# cumulative weights: 15% exact, 30% near, 15% substring, 10% boilerplate, 30% singleton
_ROLE_CUM = (0.15, 0.45, 0.60, 0.70, 1.00)
# word-substitution probability per near-dup slot (slot 1..4):
# J(word-5-shingles) ≈ (1-p)^5 / (2 - (1-p)^5) → ≈ .95 / .91 / .83 / .75
_NEAR_SUB_P = (0.005, 0.01, 0.02, 0.03)

_VOCAB_SIZE = 800
_N_DOMAINS = 120
_LANGS = ("en", "en", "en", "en", "en", "en", "de", "fr", "es", "zh")
_EPOCH = datetime(2026, 1, 1, tzinfo=timezone.utc)

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
    ]
)


def _vocab() -> list[str]:
    base = [
        "data", "spark", "query", "join", "merge", "table", "row", "column",
        "hash", "scan", "filter", "sort", "group", "batch", "stream", "window",
        "vector", "key", "value", "order", "part", "line", "customer", "agg",
        "fast", "slow", "small", "big", "the", "a",
    ]
    return base + [f"w{i:03d}" for i in range(_VOCAB_SIZE - len(base))]


_VOCAB = _vocab()
# Zipfian word weights (rank-1.1), fixed — not RNG-dependent.
_WORD_P = (1.0 / np.arange(1, len(_VOCAB) + 1) ** 1.1)
_WORD_P /= _WORD_P.sum()
_DOMAIN_P = (1.0 / np.arange(1, _N_DOMAINS + 1) ** 1.2)
_DOMAIN_P /= _DOMAIN_P.sum()


def _rng(seed: int, *parts: int) -> np.random.Generator:
    key = hashlib.sha256(("corpus:" + ":".join(str(p) for p in (seed, *parts))).encode()).digest()
    return np.random.Generator(np.random.PCG64(int.from_bytes(key[:8], "little")))


def _role(seed: int, group: int) -> str:
    u = _rng(seed, group, 9999).random()
    for role, cum in zip(ROLES, _ROLE_CUM):
        if u < cum:
            return role
    return "singleton"


def _base_words(seed: int, group: int, slot: int = 0) -> list[str]:
    """Base word sequence; slot>0 used only for singleton groups."""
    rng = _rng(seed, group, 100 + slot)
    n = int(rng.integers(120, 400))
    idx = rng.choice(len(_VOCAB), size=n, p=_WORD_P)
    return [_VOCAB[i] for i in idx]


_BOILER_CHROME = (
    "terms of service privacy policy contact us subscribe newsletter "
    "copyright all rights reserved site map careers press about"
).split()


def doc_words(seed: int, group: int, slot: int) -> list[str]:
    """The word sequence of doc (group, slot) — the ground-truth text."""
    role = _role(seed, group)
    if role == "singleton" or slot == 0:
        words = _base_words(seed, group, slot if role == "singleton" else 0)
        if role == "boilerplate":
            words = _BOILER_CHROME * 8 + words[:30] + _BOILER_CHROME * 8
        return words
    base = _base_words(seed, group, 0)
    rng = _rng(seed, group, 200 + slot)
    if role == "exact":
        return base
    if role == "near":
        p = _NEAR_SUB_P[(slot - 1) % len(_NEAR_SUB_P)]
        mask = rng.random(len(base)) < p
        repl = rng.choice(len(_VOCAB), size=int(mask.sum()), p=_WORD_P)
        out = list(base)
        j = 0
        for i in np.flatnonzero(mask):
            out[i] = _VOCAB[repl[j]]
            j += 1
        return out
    if role == "substring":
        # share a long exact substring (>=512 chars ≈ 110 words of avg
        # len ~4.7) from the base, embedded in otherwise-unique text.
        shared = base[: max(120, len(base) // 2)]
        unique = _base_words(seed, group, 300 + slot)
        cut = len(unique) // 2
        return unique[:cut] + shared + unique[cut:]
    if role == "boilerplate":
        # same heavy chrome, tiny unique content — floods LSH buckets.
        content = _base_words(seed, group, 400 + slot)[:30]
        return _BOILER_CHROME * 8 + content + _BOILER_CHROME * 8
    raise AssertionError(role)


def _doc_lang(seed: int, group: int) -> str:
    return _LANGS[int(_rng(seed, group, 500).integers(0, len(_LANGS)))]


def _doc_url(seed: int, group: int, slot: int) -> str:
    doc_id = group * GROUP_SLOTS + slot
    d = int(_rng(seed, group, 600 + slot).choice(_N_DOMAINS, p=_DOMAIN_P))
    return f"https://d{d:03d}.example.com/p/{doc_id:09d}"


def render_html(text: str, title: str, domain: str) -> bytes:
    """Wrap text in page chrome; extraction recovers ``text`` exactly."""
    paras = []
    words = text.split(" ")
    for i in range(0, len(words), 40):
        paras.append("<p>" + _html.escape(" ".join(words[i : i + 40])) + "</p>")
    doc = (
        "<html><head><title>" + _html.escape(title) + "</title>"
        '<meta charset="utf-8"><style>body{margin:0}</style></head>'
        '<body><nav><a href="/">Home</a> | <a href="/about">About</a></nav>'
        "<main>" + "".join(paras) + "</main>"
        "<footer>&copy; " + _html.escape(domain) + "</footer>"
        "<script>var t=1;</script></body></html>"
    )
    return doc.encode("utf-8")


def make_row(seed: int, doc_id: int) -> dict:
    group, slot = divmod(doc_id, GROUP_SLOTS)
    words = doc_words(seed, group, slot)
    text = " ".join(words)
    url = _doc_url(seed, group, slot)
    domain = url.split("/")[2]
    from datetime import timedelta

    ts = _EPOCH + timedelta(seconds=int(doc_id) * 7 % (86400 * 90))
    return {
        "url": url,
        "warc_ts": ts,
        "html": render_html(text, f"page {doc_id}", domain),
        "text": text,
        "lang": _doc_lang(seed, group),
    }


def generate_pages(spark: SparkSession, n_docs: int, seed: int = 42, partitions: int | None = None) -> DataFrame:
    """Distributed deterministic corpus: spark.range → mapInPandas."""
    if partitions is None:
        partitions = max(4, n_docs // 2000)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [make_row(seed, int(i)) for i in pdf["id"]]
            yield pd.DataFrame(rows)

    return (
        spark.range(0, n_docs, numPartitions=partitions)
        .mapInPandas(gen, schema=PAGES_SCHEMA)
    )


def truth_role(seed: int, doc_id: int) -> str:
    return _role(seed, doc_id // GROUP_SLOTS)


def expected_dup_groups(seed: int, n_docs: int) -> dict[int, list[int]]:
    """Ground-truth duplicate groups (exact/near/boilerplate clusters and
    substring families) keyed by group id — test oracle helper."""
    out: dict[int, list[int]] = {}
    for g in range(n_docs // GROUP_SLOTS):
        role = _role(seed, g)
        if role in ("exact", "near", "substring", "boilerplate"):
            members = [g * GROUP_SLOTS + s for s in range(GROUP_SLOTS) if g * GROUP_SLOTS + s < n_docs]
            if len(members) > 1:
                out[g] = members
    return out
