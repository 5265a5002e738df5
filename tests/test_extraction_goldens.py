"""Golden-byte tests for extraction on MESSY real-world-shaped HTML.

The synthetic corpus is well-formed; real crawl HTML is not. These
goldens pin extract_text's behavior on the malformed constructs a
crawl actually contains — unclosed tags, '>' inside attribute values,
CDATA, entities in attributes, unclosed comments, tag soup — so the
five documented divergence classes (extraction.py module docstring,
classes A-E) are FROZEN: any change to the regex contract that shifts
a single byte on these inputs fails here, which is exactly the
byte-identity-per-url invariant (BASELINE.json input_hint) applied to
the ugly half of the web.

Reference analog: the reference pins its known miss classes in docs and
tests rather than pretending they don't exist
(`/root/reference/README.md:197-203`).
"""

import pandas as pd
import pytest

from gnames_spark.functions.extraction import extract_text, extract_text_py

# (name, raw html, golden extracted text, divergence class exercised)
GOLDENS = [
    (
        "attr_gt",
        '<p>before</p><a title="a > b" href="/x">link text</a><p>after</p>',
        'before b" href="/x">link text after',
        "A: '>' in attribute ends the tag early; fragment leaks",
    ),
    (
        "unclosed_script",
        '<div>visible</div><script>var x = 1; tracker("id");',
        'visible var x = 1; tracker("id");',
        "B: unclosed drop-block body leaks as text",
    ),
    (
        "cdata_with_gt",
        "<p>intro</p><![CDATA[ raw <b>cdata</b> payload ]]><p>outro</p>",
        "intro cdata payload ]]> outro",
        "C1: CDATA payload containing '>' leaks with a ']]>' remnant",
    ),
    (
        "cdata_no_gt",
        "<p>intro</p><![CDATA[ plain payload ]]><p>outro</p>",
        "intro outro",
        "C2: CDATA payload without '>' swallowed entirely (non-rendered)",
    ),
    (
        "entity_attr",
        '<img alt="Fish &amp; Chips &gt; all">caption &amp; more',
        "caption & more",
        "entities inside a well-formed attribute are dropped with the tag",
    ),
    (
        "unclosed_div_soup",
        "<div class=unquoted><p>one<p>two<br>three",
        "one two three",
        "unclosed content tags: text survives, tags stripped",
    ),
    (
        "nested_same_block",
        "<script>a<script>b</script><p>seen?</p>",
        "seen?",
        "nested same-name block: non-greedy drop to the FIRST close",
    ),
    (
        "escaped_markup",
        "text &lt;script&gt;alert(1)&lt;/script&gt; end",
        "text <script>alert(1)</script> end",
        "E: escaped markup unescapes to literal text, never re-stripped",
    ),
    (
        "comment_unclosed",
        "<p>keep</p><!-- open comment <p>lost</p>",
        "keep lost",
        "D: unclosed comment consumed like a tag, trailing text kept",
    ),
    (
        "style_attr_newline",
        "<span style=\"color:red;\n   content: '>'\">styled</span> tail",
        "'\">styled tail",
        "A: '>' in a multi-line style attribute",
    ),
    (
        "mixed_case_close",
        "<STYLE>p{color:red}</StYlE><B>bold</B>",
        "bold",
        "case-insensitive block close matches",
    ),
    (
        "empty_and_none",
        "",
        "",
        "degenerate input",
    ),
]


class TestMessyHtmlGoldens:
    @pytest.mark.parametrize(
        "name,raw,golden,_why", GOLDENS, ids=[g[0] for g in GOLDENS]
    )
    def test_golden_bytes(self, name, raw, golden, _why):
        assert extract_text_py(raw) == golden
        # byte path (crawl HTML arrives as binary) gives identical bytes
        assert extract_text_py(raw.encode("utf-8")) == golden

    def test_none_is_empty(self):
        assert extract_text_py(None) == ""

    def test_udf_matches_python_on_messy_corpus(self, spark):
        """The Arrow UDF path produces the same bytes as the local
        function on the messy fixtures, at two partition counts —
        extraction is partition-independent even on tag soup."""
        rows = [(i, g[1]) for i, g in enumerate(GOLDENS)]
        for parts in (1, 4):
            df = spark.createDataFrame(rows, "i int, html string").repartition(parts)
            got = {
                r["i"]: r["t"]
                for r in df.select("i", extract_text("html").alias("t")).collect()
            }
            assert got == {i: g[2] for i, g in enumerate(GOLDENS)}

    def test_divergence_classes_keep_not_drop(self):
        """Classes A-D err toward keeping bytes: visible inner text is
        never lost on these fixtures (noise may be added, content may
        not disappear)."""
        visible = {
            "attr_gt": ["before", "link text", "after"],
            "unclosed_script": ["visible"],
            "cdata_with_gt": ["intro", "outro"],
            "cdata_no_gt": ["intro", "outro"],
            "entity_attr": ["caption"],
            "unclosed_div_soup": ["one", "two", "three"],
            "escaped_markup": ["text", "end"],
            "comment_unclosed": ["keep"],
            "style_attr_newline": ["styled", "tail"],
            "mixed_case_close": ["bold"],
        }
        by_name = {g[0]: g[1] for g in GOLDENS}
        for name, words in visible.items():
            out = extract_text_py(by_name[name])
            for w in words:
                assert w in out, (name, w, out)
