"""PII detection/redaction (operators/pii.py): hand cases, cell-exact
DuckDB oracles on a deterministic synthesized corpus, and plan guards
(pure projection — no shuffle, no Python)."""

from __future__ import annotations

import pandas as pd


def _pii_corpus(n: int = 300) -> pd.DataFrame:
    """Deterministic corpus with PII woven into ordinary text: every
    doc gets a different mix of emails / IPs / phones / clean filler,
    including the adversarial shapes (an email whose local part
    contains a dotted quad, a version string that is NOT a valid IP
    octet run, digits abutting a phone pattern)."""
    rows = []
    for i in range(n):
        parts = [f"doc {i} intro text with words"]
        if i % 2 == 0:
            parts.append(f"contact user{i}@example{i % 7}.com today")
        if i % 3 == 0:
            parts.append(f"server at 10.{i % 256}.{(i * 7) % 256}.{i % 200}")
        if i % 5 == 0:
            parts.append(f"call 555-{100 + i % 900}-{1000 + i % 9000}")
        if i % 7 == 0:
            parts.append(f"mixed u.{i % 9}.2.3.4@mail.org and v1.2.3.4000")
        if i % 11 == 0:
            parts.append("release 99.99.99.999 is not an address")
        parts.append(f"closing words {i * 31 % 997}")
        rows.append((i, " ".join(parts)))
    return pd.DataFrame(rows, columns=["doc_id", "text"])


_SQL_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4",
     r"\b(1?\d?\d|2[0-4]\d|25[0-5])(\.(1?\d?\d|2[0-4]\d|25[0-5])){3}\b",
     "<IP>"),
    ("phone", r"\b\d{3}[-.]\d{3,4}[-.]\d{4}\b", "<PHONE>"),
]


def test_pii_hand_case(spark):
    from pdf_parser_spark.operators.pii import redact_pii, with_pii_counts

    docs = spark.createDataFrame(
        [(0, "mail a.b-c@x.co.uk or 192.168.0.1 or 555-123-4567"),
         (1, "u.1.2.3.4@x.com hides its quad inside an email"),
         (2, "version 1.2.3.4000 and 300.1.2.3 are not addresses"),
         (3, "plain text, no identifiers at all")],
        "doc_id long, text string")
    got = {r["doc_id"]: r for r in with_pii_counts(docs).collect()}
    assert (got[0]["n_email"], got[0]["n_ipv4"], got[0]["n_phone"]) == \
        (1, 1, 1)
    # counts are independent per pattern: the dotted quad inside the
    # email's local part is counted by BOTH counters (redaction, which
    # applies the patterns sequentially, swallows it — asserted below)
    assert (got[1]["n_email"], got[1]["n_ipv4"]) == (1, 1)
    assert not got[2]["has_pii"] and not got[3]["has_pii"]

    red = {r["doc_id"]: r["text_redacted"]
           for r in redact_pii(docs).collect()}
    assert red[0] == "mail <EMAIL> or <IP> or <PHONE>"
    assert red[1] == "<EMAIL> hides its quad inside an email"
    assert red[3] == "plain text, no identifiers at all"


def test_pii_counts_match_duckdb_oracle(spark):
    import duckdb

    from pdf_parser_spark.operators.pii import with_pii_counts

    pdf = _pii_corpus()
    docs = spark.createDataFrame(pdf)
    got = (with_pii_counts(docs)
           .select("doc_id", "n_email", "n_ipv4", "n_phone", "has_pii")
           .toPandas().sort_values("doc_id").reset_index(drop=True))

    con = duckdb.connect()
    con.register("docs", pdf)
    counts = ", ".join(
        f"len(regexp_extract_all(text, '{pat}')) AS n_{name}"
        for name, pat, _ in _SQL_PATTERNS)
    want = con.sql(
        f"SELECT doc_id, {counts}, "
        f"(n_email + n_ipv4 + n_phone) > 0 AS has_pii "
        f"FROM docs ORDER BY doc_id").df().reset_index(drop=True)
    assert len(got) == len(want) > 0
    for c in ("n_email", "n_ipv4", "n_phone"):
        assert (got[c].values == want[c].values).all(), c
    assert (got["has_pii"].values == want["has_pii"].values).all()
    # the corpus must actually exercise every pattern
    assert want["n_email"].sum() > 0
    assert want["n_ipv4"].sum() > 0
    assert want["n_phone"].sum() > 0


def test_redact_matches_duckdb_oracle(spark):
    import duckdb

    from pdf_parser_spark.operators.pii import redact_pii

    pdf = _pii_corpus()
    docs = spark.createDataFrame(pdf)
    got = (redact_pii(docs).select("doc_id", "text_redacted")
           .toPandas().sort_values("doc_id").reset_index(drop=True))

    con = duckdb.connect()
    con.register("docs", pdf)
    expr = "text"
    for _, pat, token in _SQL_PATTERNS:
        expr = f"regexp_replace({expr}, '{pat}', '{token}', 'g')"
    want = con.sql(
        f"SELECT doc_id, {expr} AS text_redacted FROM docs "
        f"ORDER BY doc_id").df().reset_index(drop=True)
    assert (got["text_redacted"].values
            == want["text_redacted"].values).all()
    # redaction must leave no live match behind
    relive = con.sql(
        f"SELECT sum(len(regexp_extract_all({expr}, "
        f"'{_SQL_PATTERNS[0][1]}'))) FROM docs").fetchone()[0]
    assert relive == 0


def test_pii_is_pure_projection(spark):
    from pdf_parser_spark.operators.pii import redact_pii, with_pii_counts

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for df in (with_pii_counts(docs), redact_pii(docs)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
