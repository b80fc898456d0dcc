"""PII scrubbing (functions/pii.py) — JVM-regex tier, test-checked
(DuckDB's RE2 has no lookbehind, so no oracle mirror; see module doc)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from data_engineering_projects_spark.functions.pii import (
    luhn_valid,
    pii_counts,
    scrub_pii,
)

PLANTED = [
    (1, "contact john.doe+spam@example.co.uk or 555-123-4567 today"),
    (2, "card 4111 1111 1111 1111 and invalid 4111-1111-1111-1112"),
    (3, "host 192.168.1.254 ssn 123-45-6789 version 1.2.3.4000"),
    (4, None),
    (5, "nothing sensitive, pi=3.14159, year 2026, order #1234567"),
    (6, "call (212) 555-0199 or +44 20 7946 0958"),
]


def _planted(spark):
    return spark.createDataFrame(PLANTED, "id int, text string")


def test_scrub_redacts_all_categories(spark):
    got = {r["id"]: r["c"] for r in _planted(spark).select(
        "id", scrub_pii(F.col("text")).alias("c")).collect()}
    assert got[1] == "contact [EMAIL] or [PHONE] today"
    # Luhn-valid card redacted; the off-by-one forgery is NOT (precision:
    # a bare digit-run regex would eat order ids all over a web corpus)
    assert got[2] == "card [CREDIT_CARD] and invalid 4111-1111-1111-1112"
    # dotted version number survives the IPv4 pattern (octet bounds +
    # trailing-digit lookahead)
    assert got[3] == "host [IPV4] ssn [SSN] version 1.2.3.4000"
    assert got[4] is None
    assert got[5] == PLANTED[4][1]
    assert got[6] == "call [PHONE] or [PHONE]"


def test_scrub_idempotent(spark):
    once = _planted(spark).select("id", scrub_pii(F.col("text")).alias("c"))
    twice = once.select("id", scrub_pii(F.col("c")).alias("c"))
    assert once.collect() == twice.collect()


def test_counts_match_redactions(spark):
    rows = {r["id"]: r["n"] for r in _planted(spark).select(
        "id", pii_counts(F.col("text")).alias("n")).collect()}
    assert rows[1].asDict() == {"email": 1, "ssn": 0, "phone": 1,
                                "ipv4": 0, "credit_card": 0}
    assert rows[2].asDict()["credit_card"] == 1
    assert rows[3].asDict() == {"email": 0, "ssn": 1, "phone": 0,
                                "ipv4": 1, "credit_card": 0}
    assert all(v == 0 for v in rows[5].asDict().values())
    assert rows[6].asDict()["phone"] == 2


def test_luhn_reference_vectors(spark):
    vecs = [("4111111111111111", True), ("4012888888881881", True),
            ("5555555555554444", True), ("378282246310005", True),
            ("4111111111111112", False), ("1234567890123456", False),
            # valid checksum but 11 digits — below card length floor
            ("79927398713", False)]
    df = spark.createDataFrame([(d,) for d, _ in vecs], "d string")
    got = {r["d"]: r["ok"] for r in
           df.select("d", luhn_valid(F.col("d")).alias("ok")).collect()}
    for d, want in vecs:
        assert got[d] is want, (d, got[d], want)


def test_luhn_total_on_raw_strings(spark):
    """The exported helper must be total on arbitrary strings (ANSI mode
    turns a digit-cast of ' ' into CAST_INVALID_INPUT): separators are
    stripped, non-card text is simply invalid — review-found."""
    vecs = [("4111 1111 1111 1111", True),
            ("4012-8888-8888-1881", True),
            ("order #12345 shipped", False),
            ("no digits at all", False),
            ("", False)]
    df = spark.createDataFrame([(d,) for d, _ in vecs], "d string")
    got = {r["d"]: r["ok"] for r in
           df.select("d", luhn_valid(F.col("d")).alias("ok")).collect()}
    for d, want in vecs:
        assert got[d] is want, (d, got[d], want)


def test_luhn_strict_rejects_any_non_digit(spark):
    """luhn_valid_strict keeps the digits-only contract the raw-string
    entry point broadened away (round-12 ADVICE): embedded non-digits
    fail even when the stripped digits would pass the checksum."""
    from data_engineering_projects_spark.functions.pii import (
        luhn_valid_strict)

    vecs = [("4111111111111111", True),
            ("378282246310005", True),
            ("4111 1111 1111 1111", False),   # separators: strict rejects
            ("4111a1111b1111c1111", False),   # the advice's example
            ("4111111111111112", False),      # bad checksum
            ("79927398713", False),           # valid checksum, 11 digits
            ("", False)]
    df = spark.createDataFrame([(d,) for d, _ in vecs], "d string")
    got = {r["d"]: r["ok"] for r in
           df.select("d", luhn_valid_strict(F.col("d")).alias("ok"))
             .collect()}
    for d, want in vecs:
        assert got[d] is want, (d, got[d], want)
    # and the raw entry point accepts the advice's example — the
    # documented semantic split between the two
    raw = df.select("d", luhn_valid(F.col("d")).alias("ok")).collect()
    assert {r["d"]: r["ok"] for r in raw}["4111a1111b1111c1111"] is True


def test_category_subset_and_no_cards(spark):
    df = _planted(spark).filter("id in (1, 2)")
    only_email = df.select("id", scrub_pii(
        F.col("text"), categories=["email"], include_cards=False)
        .alias("c")).collect()
    got = {r["id"]: r["c"] for r in only_email}
    assert "[EMAIL]" in got[1] and "555-123-4567" in got[1]
    assert got[2] == PLANTED[1][1]  # cards untouched when disabled


def test_scrub_documents_is_pure_catalyst(spark, sf_dir):
    """Scale contract: scrubbing the documents table is one codegen'd
    projection — no Python evaluation nodes in the plan, and the scrubbed
    output has zero residual matches by the scrubber's own counters."""
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    out = docs.select("doc_id", scrub_pii(F.col("text")).alias("text"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan
    resid = out.select(pii_counts(F.col("text")).alias("n")).agg(
        F.sum("n.email").alias("e"), F.sum("n.ssn").alias("s"),
        F.sum("n.phone").alias("p"), F.sum("n.ipv4").alias("i"),
        F.sum("n.credit_card").alias("c")).first()
    assert all((resid[k] or 0) == 0 for k in ("e", "s", "p", "i", "c"))
