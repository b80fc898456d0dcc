"""PII scrubbing for training-data pipelines — pure Catalyst expressions.

A corpus headed for model training must have emails, phone numbers, SSNs,
IP addresses and payment-card numbers redacted BEFORE dedup/packing (the
redacted form is what dedup should see: two docs differing only in the
embedded email are the same training document). Everything here compiles
to JVM-side ``regexp_replace`` / higher-order-function expressions — zero
Python in the row loop, so the scrub is whole-stage-codegen'd and scales
with executors like any other projection.

Card numbers get special treatment: a bare 13–19-digit regex over web
text is mostly false positives (order ids, timestamps). Candidates are
extracted, Luhn-validated with a fold over the digit array (still
Catalyst: ``filter``/``aggregate`` HOFs), and only validated numbers are
replaced — exactly the precision/recall trade a production scrubber
makes.

Redaction is *idempotent* (tokens like ``[EMAIL]`` match no pattern) and
*ordered*: cards first (their digit runs would otherwise be half-eaten by
the phone pattern), then emails (usernames can contain digits), then
SSN / phone / IPv4.

Reference note: the reference repo has no PII handling anywhere
(SURVEY.md §2 — absence); this is part of the training-data-pipeline
extension surface (BASELINE.json north star). Java-regex syntax
(lookbehind/lookahead) keeps word boundaries exact; this tier is
test-checked rather than DuckDB-oracle-checked because DuckDB's RE2
engine has no lookbehind.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Order = application order (see module docstring).
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
    "ssn": r"(?<!\d)\d{3}-\d{2}-\d{4}(?!\d)",
    # two branches: +CC with 3–4 grouped runs (international formats like
    # +44 20 7946 0958), or the NANP 3-3-4 shape with optional +CC/parens
    "phone": (r"(?<![\d.])(?:\+\d{1,3}(?:[-.\s]\d{2,4}){2,3}"
              r"|(?:\+?\d{1,3}[-.\s])?\(?\d{3}\)?[-.\s]\d{3}[-.\s]?\d{4})"
              r"(?![\d.])"),
    "ipv4": (r"(?<![\d.])((25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)\.){3}"
             r"(25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)(?![\d.])"),
}

# 13–19 digits with optional single space/dash separators, not embedded
# in a longer digit/separator run.
CARD_CANDIDATE = r"(?<![\d\-])\d(?:[ \-]?\d){12,18}(?![\d\-])"


def _token(category: str) -> str:
    return f"[{category.upper()}]"


def luhn_valid(digits: Column) -> Column:
    """Luhn checksum over a raw string column — the fold is a Catalyst
    ``aggregate`` over the reversed char array (from the check digit
    leftward, double every second digit, subtract 9 above 9; valid iff
    the sum % 10 == 0). Non-digits are stripped first so the helper is
    total on raw card columns ('4111 1111 1111 1111' validates rather
    than throwing CAST_INVALID_INPUT under ANSI mode); the 13–19 length
    gate applies to the digit count after stripping.

    ACCEPTANCE NOTE (round-12 ADVICE): stripping makes this the
    RAW-STRING entry point — any text whose embedded digits pass the
    length gate and checksum validates ('4111a1111b1111c1111' is True).
    ``scrub_cards``/``pii_counts`` pre-filter candidates through
    ``CARD_CANDIDATE`` (digits with single space/dash separators only),
    so precision there is unchanged. Callers that need the digits-only
    contract use :func:`luhn_valid_strict`."""
    digits = F.regexp_replace(digits, r"\D", "")
    arr = F.reverse(F.split(digits, ""))
    mapped = F.transform(
        arr,
        lambda d, i: F.when(
            i % 2 == 1,
            F.when(d.cast("int") * 2 > 9, d.cast("int") * 2 - 9)
             .otherwise(d.cast("int") * 2)
        ).otherwise(d.cast("int")))
    total = F.aggregate(mapped, F.lit(0), lambda acc, x: acc + x)
    return (F.length(digits) >= 13) & (F.length(digits) <= 19) & \
           (total % 10 == 0)


def luhn_valid_strict(digits: Column) -> Column:
    """Digits-only Luhn: True iff the input is EXACTLY a 13–19-digit
    run that passes the checksum — any separator or other character
    fails (the strict pre-round-10 contract, for callers validating
    already-normalized card columns). The rlike gate makes the result
    strict; the shared fold stays total (stripping is a no-op on a
    matching input), so ANSI mode never throws on the reject path."""
    return digits.rlike(r"^\d{13,19}$") & luhn_valid(digits)


def scrub_cards(col: Column) -> Column:
    """Replace Luhn-valid card numbers with ``[CREDIT_CARD]``: extract
    candidates, keep the validated ones, fold string ``replace`` over
    them. The candidate array is per-row and tiny, so the fold is a
    row-local expression, not a join."""
    candidates = F.regexp_extract_all(col, F.lit(CARD_CANDIDATE), F.lit(0))
    valid = F.filter(
        candidates,
        lambda c: luhn_valid(F.regexp_replace(c, r"[ \-]", "")))
    return F.aggregate(
        valid, col,
        lambda acc, c: F.replace(acc, c, F.lit(_token("credit_card"))))


def scrub_pii(col: Column, categories: list[str] | None = None,
              include_cards: bool = True) -> Column:
    """Redact all (or selected) PII categories from a string column.

    NULL propagates (a NULL doc stays NULL). The output is stable under
    re-application: replacement tokens match no pattern."""
    out = scrub_cards(col) if include_cards else col
    for cat, pat in PII_PATTERNS.items():
        if categories is None or cat in categories:
            out = F.regexp_replace(out, pat, _token(cat))
    return out


def pii_counts(col: Column, include_cards: bool = True) -> Column:
    """Struct of per-category match counts (pre-redaction audit tier:
    a corpus report of "how much PII per source" is GROUP BY source over
    these). Card count is the count of *Luhn-valid* candidates."""
    fields = [
        F.regexp_count(col, F.lit(pat)).alias(cat)
        for cat, pat in PII_PATTERNS.items()
    ]
    if include_cards:
        candidates = F.regexp_extract_all(col, F.lit(CARD_CANDIDATE),
                                          F.lit(0))
        valid = F.filter(
            candidates,
            lambda c: luhn_valid(F.regexp_replace(c, r"[ \-]", "")))
        fields.append(F.size(valid).alias("credit_card"))
    return F.struct(*fields)
