"""PII detection/redaction contract (functions/pii.py)."""

from __future__ import annotations

import pytest

from gnames_spark.functions.pii import pii_counts, redact_pii


@pytest.fixture(scope="module")
def scrubbed(spark):
    rows = [
        (1, "mail me at jane.doe+spam@sub.example.co.uk or Bob@x.io thanks"),
        (2, "server at 10.0.0.1 and 256.300.1.1 still redacts (documented)"),
        (3, "call +1 (555) 123-4567 or 030-1234567 today"),
        (4, "an email bob@example.com then ip 192.168.0.1 then 555 123 4567"),
        (5, "no pii here, just version 1.2 and year 2025 and x@y"),
        (6, ""),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = df.select("doc_id", *pii_counts("text"), redact_pii("text").alias("red"))
    return {r.doc_id: r for r in out.collect()}


class TestPII:
    def test_emails(self, scrubbed):
        r = scrubbed[1]
        assert r.n_emails == 2 and r.n_ips == 0 and r.n_phones == 0
        assert r.red == "mail me at [EMAIL] or [EMAIL] thanks"

    def test_ips_not_range_checked(self, scrubbed):
        r = scrubbed[2]
        # 256.300.1.1 redacts too — the documented false-positive class
        assert r.n_ips == 2
        assert r.red == "server at [IP] and [IP] still redacts (documented)"

    def test_phones(self, scrubbed):
        r = scrubbed[3]
        assert r.n_phones == 2
        assert r.red == "call [PHONE] or [PHONE] today"

    def test_order_email_ip_phone(self, scrubbed):
        r = scrubbed[4]
        # each kind claims its own span; no double counting
        assert (r.n_emails, r.n_ips, r.n_phones) == (1, 1, 1)
        assert r.red == "an email [EMAIL] then ip [IP] then [PHONE]"

    def test_clean_text_untouched(self, scrubbed):
        r = scrubbed[5]
        assert (r.n_emails, r.n_ips, r.n_phones) == (0, 0, 0)
        assert r.red == "no pii here, just version 1.2 and year 2025 and x@y"
        assert scrubbed[6].red == ""

    def test_idempotent(self, spark):
        df = spark.createDataFrame(
            [(1, "bob@example.com and 10.0.0.1 and +49 170 1234567")],
            ["doc_id", "text"],
        )
        once = df.select(redact_pii("text").alias("text"))
        twice = once.select(redact_pii("text").alias("text"))
        assert once.first().text == twice.first().text

    def test_no_python_in_plan(self, spark):
        df = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
        plan = (
            df.select(*pii_counts("text"), redact_pii("text"))
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


class TestPIIPipelineGate:
    def test_pii_redaction_unifies_contact_variants(self, spark):
        from gnames_spark.config import DedupConfig
        from gnames_spark.pipeline import DedupPipeline

        core = ("the same long article body that should hash identically "
                "once the contact details are tokenized away from it")
        rows = [
            ("https://a.com/1", f"{core} write to alice@example.com", "en"),
            ("https://b.com/1", f"{core} write to bob@other.org", "en"),
        ]
        pages = spark.createDataFrame(rows, "url string, text string, lang string")
        cfg = DedupConfig(shuffle_partitions=4, redact_pii=True)
        docs = DedupPipeline(spark, cfg).prepare_docs(pages).collect()
        assert len({r.content_sha for r in docs}) == 1
        assert all("[EMAIL]" in r.text and "@" not in r.text for r in docs)
