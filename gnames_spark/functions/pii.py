"""PII detection and redaction (training-data hygiene).

Web text destined for model training gets a PII pass (emails, phone
numbers, IP addresses) — Dolma and FineWeb both ship exactly this as a
regex stage. Ours is pure Catalyst (`regexp_count` semantics via
``regexp_extract_all`` + global ``regexp_replace``), so it rides
whole-stage codegen over the scan: zero Python, embarrassingly
parallel, no shuffle at all.

Pattern contract (frozen): every pattern below is valid and IDENTICAL
in meaning under Java regex (Spark) and RE2 (DuckDB oracle) — no
lookarounds, no backreferences, ASCII `\\b` word boundaries only. They
are deliberately high-precision/recall-bounded: a PII pass can be
conservative (a missed hit costs privacy review downstream; a false
positive just redacts a token), so the e-mail pattern follows the
practical HTML-form subset, phones require 9+ digits with separators,
and IPv4 octets are not range-checked (256.1.1.1 redacts — documented
false-positive class, same trade the reference makes when its fuzzy
clamp accepts a characterized miss class, /root/reference/README.md:197-203).

The redaction is deterministic and idempotent: replacement tokens
([EMAIL]/[PHONE]/[IP]) contain no digits or '@'/'.' runs, so a second
pass is a no-op.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# Order matters: emails are redacted BEFORE phones/IPs so the digits
# inside an address never double-match, and IPs before phones would
# let the phone pattern eat dotted quads — so: email, ip, phone.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
# 9-15 digits total, optional leading +, digits separated by
# space/dash/dot/parens — anchored on word boundaries.
PHONE_RE = r"\+?\b[0-9][0-9()\-. ]{7,18}[0-9]\b"

PATTERNS = [("email", EMAIL_RE), ("ip", IPV4_RE), ("phone", PHONE_RE)]
TOKENS = {"email": "[EMAIL]", "ip": "[IP]", "phone": "[PHONE]"}


def pii_counts(col: str = "text") -> list[Column]:
    """Per-kind match counts (n_emails, n_ips, n_phones) — counted on
    the progressively-redacted text exactly as redaction sees it, so
    counts and redaction always agree (an e-mail's digits are never
    also a phone)."""
    out = []
    current = F.col(col)
    for kind, pat in PATTERNS:
        out.append(
            F.size(F.regexp_extract_all(current, F.lit(pat), F.lit(0))).alias(
                f"n_{kind}s"
            )
        )
        current = F.regexp_replace(current, pat, TOKENS[kind])
    return out


def redact_pii(col: str = "text") -> Column:
    """Text with every match replaced by its typed token, applied in
    the fixed (email, ip, phone) order."""
    current = F.col(col)
    for kind, pat in PATTERNS:
        current = F.regexp_replace(current, pat, TOKENS[kind])
    return current
