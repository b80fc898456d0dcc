"""Text-analysis expressions for the training-data-pipeline extensions
(dedup, language-ID, quality scoring, fingerprinting).

All builders are Catalyst expressions (split/transform/md5/conv) — no
Python in the row loop, so they vectorize through whole-stage codegen and
scale linearly with executors. Hashes are md5-derived so both Spark and
any ANSI oracle (DuckDB) compute identical values.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalize_text(col) -> Column:
    """lower + collapse whitespace + trim: the canonical form used by
    exact-dedup and fingerprinting."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


NORMALIZE_TEXT_SQL = "trim(regexp_replace(lower({c}), '\\s+', ' ', 'g'))"


def tokens(col) -> Column:
    """Whitespace tokenization of normalized text."""
    return F.split(normalize_text(col), " ")


TOKENS_SQL = f"string_split({NORMALIZE_TEXT_SQL}, ' ')"


def token_count(col) -> Column:
    return F.size(tokens(col))


def shingles_from_tokens(toks, k: int = 3) -> Column:
    """k-word shingles from an already-materialized token-array column.

    Callers should ``select(tokens(...).alias('toks'))`` first and shingle
    from the named column: inlining the tokenize expression here would make
    Catalyst re-run the regexp+split once per shingle element instead of
    once per row (measured ~10× slower on the documents table)."""
    toks = F.col(toks) if isinstance(toks, str) else toks
    n = F.size(toks) - F.lit(k - 1)
    sh = F.transform(F.sequence(F.lit(1), n),
                     lambda i: F.array_join(F.slice(toks, i, k), " "))
    # sequence(1, 0) is DESCENDING [1, 0] in Spark (DuckDB range is empty):
    # guard the <k-token case explicitly.
    return F.when(F.size(toks) >= k, sh).otherwise(
        F.array().cast("array<string>"))


def shingles(col, k: int = 3) -> Column:
    """k-word shingles (n-grams) as an array<string>, for Jaccard/MinHash
    dedup. Empty array when the document has fewer than k tokens.

    NOTE: computes tokens inline — fine for one-shot use, but hot paths
    must materialize tokens first and use :func:`shingles_from_tokens`."""
    return shingles_from_tokens(tokens(col), k)


def shingles_sql(text_expr: str, k: int = 3) -> str:
    """DuckDB rendering of :func:`shingles` for oracle SQL."""
    toks = TOKENS_SQL.format(c=text_expr)
    return (
        f"list_transform(range(1, greatest(len({toks}) - {k} + 2, 1)),"
        f" i -> array_to_string(list_slice({toks}, i, i + {k} - 1), ' '))"
    )


def md5_hash64(col, seed: int = 0) -> Column:
    """Deterministic 60-bit hash shared with the SQL oracle: the first 15
    hex chars of md5(seed:value) as a BIGINT. Used for MinHash permutations
    and SimHash bit sampling (seed selects the 'hash function')."""
    h = F.md5(F.concat(F.lit(f"{seed}:"), col))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("bigint")


def md5_hash64_sql(expr: str, seed: int = 0) -> str:
    return f"CAST(('0x' || substr(md5('{seed}:' || {expr}), 1, 15)) AS BIGINT)"


def fingerprint(col) -> Column:
    """Document fingerprint: md5 of the normalized text (the distributed
    analog of a rolling content hash — collision-safe at 100 TB scale)."""
    return F.md5(normalize_text(col))


FINGERPRINT_SQL = f"md5({NORMALIZE_TEXT_SQL})"


#: Small per-language marker-word lists for the n-gram/stopword language-ID
#: heuristic. Public common-word lists; deliberately tiny so the heuristic
#: is cheap at scale (a handful of array_contains per row).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in"),
    "es": ("el", "la", "de", "que", "los"),
    "fr": ("le", "la", "et", "les", "des"),
    "de": ("der", "die", "und", "das", "ein"),
    "zh": ("的", "是", "了", "在", "我"),
}


def lang_scores(col) -> dict[str, Column]:
    """Per-language marker-hit counts over the token array (JVM-side)."""
    t = tokens(col)
    out = {}
    for lang, words in LANG_MARKERS.items():
        hits = [F.when(F.array_contains(t, w), 1).otherwise(0) for w in words]
        score = hits[0]
        for h in hits[1:]:
            score = score + h
        out[lang] = score
    return out


