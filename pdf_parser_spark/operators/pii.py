"""PII scrubbing: detect and redact emails / IPv4 addresses / phone
numbers as pure codegen projections.

Standard stage of a web-scale training-data pipeline (C4 scrubbed
lines by blocklist; RefinedWeb and FineWeb redact emails/IPs with
regex passes before training). Sits alongside quality/langid
(operators/textstats.py) in the curation family.

Scale shape: both operators are single-pass column projections —
`regexp_extract_all` / `regexp_replace` compile to Java-regex calls
inside WholeStageCodegen, so there is NO shuffle, NO Python, and the
scan stays columnar-pruned to (id, text). At 100 TB this is the same
cost class as with_quality: one streaming pass over the text bytes.

Pattern notes: the regexes deliberately use only syntax with
identical semantics in Java regex (Spark) and RE2 (the DuckDB
oracle): character classes, bounded repetition, `\\b` word
boundaries — no lookaround, no backreferences. Both engines use
leftmost-first non-overlapping match semantics for these patterns,
so counts and replacements are cell-for-cell comparable (pinned by
tests/test_pii.py's DuckDB oracles).

SCOPE (read before redacting a real corpus): PHONE_RE matches only
NANP-style separators (`ddd[-.]ddd[d]?[-.]dddd`); international /
E.164 forms (`+44 20 7946 0958`), bare 10-digit runs, and
parenthesized area codes pass through UNREDACTED. IP coverage is
IPv4 only — IPv6 is out of scope. This matches the C4/RefinedWeb
demo corpora the operators are oracled against; a multilingual
production corpus needs wider patterns (swap the module constants —
the plan shape and oracle protocol are unchanged).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Order matters for redaction: emails contain dot-runs that the IPv4
# pattern must not see first (user.1.2.3.4@x.com), so EMAIL is
# replaced before IP, and IP before PHONE (phone pattern could match
# inside a dotted quad's digits otherwise).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b(1?\d?\d|2[0-4]\d|25[0-5])(\.(1?\d?\d|2[0-4]\d|25[0-5])){3}\b"
PHONE_RE = r"\b\d{3}[-.]\d{3,4}[-.]\d{4}\b"

_KINDS = (("email", EMAIL_RE, "<EMAIL>"),
          ("ipv4", IPV4_RE, "<IP>"),
          ("phone", PHONE_RE, "<PHONE>"))


def with_pii_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Append ``n_email`` / ``n_ipv4`` / ``n_phone`` match counts and a
    ``has_pii`` flag. Counts are non-overlapping leftmost matches.
    Pure projection: no shuffle, no Python."""
    out = docs
    for name, pat, _ in _KINDS:
        out = out.withColumn(
            f"n_{name}",
            F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat),
                                        F.lit(0))))
    return out.withColumn(
        "has_pii",
        (F.col("n_email") + F.col("n_ipv4") + F.col("n_phone")) > 0)


def redact_pii(docs: DataFrame, text_col: str = "text",
               out_col: str = "text_redacted") -> DataFrame:
    """Append ``out_col`` with every email/IPv4/phone occurrence
    replaced by a typed placeholder token (``<EMAIL>``/``<IP>``/
    ``<PHONE>``), applied in that order so a pattern never matches
    inside an earlier placeholder's source span. Pure projection."""
    col = F.col(text_col)
    for _, pat, token in _KINDS:
        col = F.regexp_replace(col, pat, token)
    return docs.withColumn(out_col, col)
