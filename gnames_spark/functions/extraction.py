"""HTML → text extraction — the heavyweight per-row kernel.

Reference analog: `gnparser.ParseName`, the one expensive per-row
function, run through a pool of 5 parser instances to amortize setup
(`/root/reference/internal/io/pgio/pgio.go:34-40`). Here the expensive
per-row function is extracting visible text from raw page HTML; the
pool becomes the *iterator-form* pandas UDF (init once per partition,
then stream Arrow batches).

Per-row invariant (BASELINE.json input_hint): extraction must be
byte-identical per url across runs/partitions — the identity analog of
the reference's deterministic UUIDv5 content ids
(`/root/reference/pkg/gnames_verif.go:48`). The algorithm is therefore
pinned: pure stdlib (re + html.unescape), no library whose version
could drift, no partition-dependent state.

Algorithm (documented as the contract, tested against golden bytes):
1. drop <head>, <script>, <style>, <nav>, <header>, <footer>, <aside>
   elements and HTML comments entirely;
2. replace every remaining tag with a single space;
3. unescape HTML entities;
4. collapse whitespace runs to one space; strip.

Divergence contract on real-world (malformed) HTML. The regex pass is
NOT an HTML5 tree builder; on crawl-grade tag soup it diverges from a
real parser in five known, deterministic classes — pinned by golden
bytes in tests/test_extraction_goldens.py the same way the reference
documents the false-negative class of its fuzzy clamp
(`/root/reference/README.md:197-203`):

A. '>' inside an attribute value ends the tag early: the rest of the
   attribute list leaks into the text (`<a title="a > b" href=...>`
   leaks `b" href=...>`).
B. An unclosed drop-block (`<script>` with no `</script>`) is not
   dropped as a block: the tag itself is stripped but its BODY leaks
   as text.
C. CDATA sections are not understood: `<![CDATA[` is consumed like a
   tag, up to the FIRST '>'. Two sub-cases: a payload containing '>'
   (e.g. an embedded tag) leaks from that point on, with a `]]>`
   remnant surviving; a payload with NO '>' is swallowed entirely,
   `]]>` included — the one class that DROPS bytes (CDATA is
   script/markup payload, not visible text, so dropping matches what
   a real parser renders).
D. An unclosed comment (`<!--` with no `-->`) is not dropped; it is
   consumed like a tag — only up to the first '>' — so trailing
   content leaks rather than being swallowed to EOF (a real parser
   drops everything to EOF here; we keep more, never less).
E. Unescape runs AFTER tag stripping, so escaped markup in text
   (`&lt;script&gt;`) becomes literal `<script>` text and is NOT
   re-stripped (single-pass, no unescape-then-strip loops — this also
   means entity-encoded markup can never cause a second round of
   removal, a determinism property, not a bug).

Classes A/B/D/E err toward KEEPING bytes (noise in `text`) and C2
drops only non-rendered CDATA payload; visible content is never lost.
Downstream shingling treats the noise as ordinary tokens, and
byte-identity per url holds because every class is a pure function of
the input bytes.
"""

from __future__ import annotations

import html as _html
import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_DROP_BLOCKS = re.compile(
    r"<(head|script|style|nav|header|footer|aside)\b[^>]*>.*?</\1\s*>",
    re.IGNORECASE | re.DOTALL,
)
_COMMENTS = re.compile(r"<!--.*?-->", re.DOTALL)
_TAGS = re.compile(r"<[^>]+>")
_WS = re.compile(r"\s+")


def extract_text_py(html_bytes: bytes | str) -> str:
    """Pure-Python reference implementation (also used inside the UDF)."""
    if html_bytes is None:
        return ""
    s = html_bytes.decode("utf-8", errors="replace") if isinstance(html_bytes, (bytes, bytearray)) else html_bytes
    s = _COMMENTS.sub(" ", s)
    s = _DROP_BLOCKS.sub(" ", s)
    s = _TAGS.sub(" ", s)
    s = _html.unescape(s)
    return _WS.sub(" ", s).strip()


@F.pandas_udf(T.StringType())
def extract_text_udf(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
    # Iterator form: regexes above are module-level (compiled once per
    # worker import); the iterator form additionally amortizes any
    # future heavy init (e.g. a real HTML parser) across all batches of
    # a partition — the pandas-UDF analog of the reference's parser pool.
    for series in batches:
        yield series.map(extract_text_py)


def extract_text(html_col: str | Column) -> Column:
    col = F.col(html_col) if isinstance(html_col, str) else html_col
    return extract_text_udf(col)
