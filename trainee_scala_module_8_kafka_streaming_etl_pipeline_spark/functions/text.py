"""Text-analysis functions for training-data pipelines.

All expressions are JVM-side built-ins (no Python UDFs) chosen from the
intersection of Spark SQL and DuckDB semantics so the oracle can verify
them value-for-value: length/replace/lower, simple-character-class
regexes (identical in Java regex and RE2), md5, and exact integer
arithmetic. Ratios are rounded to 6 dp in both engines.

Everything here is a narrow per-row projection: zero shuffles, fully
inside WholeStageCodegen, scales linearly with the scan.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# simple, dialect-identical character classes
PUNCT_CLASS = r"[.,!?;:]"
WORD_SPLIT = r"\s+"
# BPE-ish tokenizer: words, numbers, or single non-space symbols
BPE_PATTERN = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"

STOPWORDS = ("the", "a", "and", "of", "in", "to", "is", "it")

# per-language marker words for the n-gram/stopword language heuristic
LANG_MARKERS = {
    "en": ("the", "and", "of", "is"),
    "de": ("der", "die", "und", "ist"),
    "fr": ("le", "la", "et", "est"),
    "es": ("el", "los", "que", "es"),
    "zh": ("de", "shi", "le", "bu"),
}


def n_tokens(col: str = "text") -> Column:
    """Whitespace token count."""
    return F.size(F.split(F.trim(F.col(col)), WORD_SPLIT))


def n_punct(col: str = "text") -> Column:
    return F.regexp_count(F.col(col), F.lit(PUNCT_CLASS))


def n_bpe_tokens(col: str = "text") -> Column:
    """Token count under a BPE-ish regex tokenizer (words / numbers /
    single symbols) — the usual pre-tokenizer granularity."""
    return F.regexp_count(F.col(col), F.lit(BPE_PATTERN))


def stopword_count(col: str = "text") -> Column:
    pat = r"\b(" + "|".join(STOPWORDS) + r")\b"
    return F.regexp_count(F.lower(F.col(col)), F.lit(pat))


def punct_ratio(col: str = "text") -> Column:
    return F.round(n_punct(col).cast("double") / F.greatest(F.length(col), F.lit(1)), 6)


def stopword_ratio(col: str = "text") -> Column:
    return F.round(
        stopword_count(col).cast("double") / F.greatest(n_tokens(col), F.lit(1)), 6
    )


def avg_token_len(col: str = "text") -> Column:
    """Mean token length = non-space chars / token count (exact integer
    inputs, one double division → portable)."""
    nonspace = F.length(F.regexp_replace(F.col(col), WORD_SPLIT, ""))
    return F.round(nonspace.cast("double") / F.greatest(n_tokens(col), F.lit(1)), 6)


def quality_score(col: str = "text") -> Column:
    """Heuristic document quality in [0,1]: rewards mid-length docs and
    normal stopword density, penalizes punctuation soup. Deterministic
    closed form so the oracle reproduces it exactly."""
    len_score = F.least(F.length(col).cast("double") / F.lit(200.0), F.lit(1.0))
    stop_score = F.least(stopword_ratio(col) * 4.0, F.lit(1.0))
    punct_penalty = F.least(punct_ratio(col) * 10.0, F.lit(1.0))
    return F.round(
        (len_score * 0.4 + stop_score * 0.4 + (F.lit(1.0) - punct_penalty) * 0.2), 6
    )


def lang_scores(col: str = "text") -> dict[str, Column]:
    out = {}
    for lang, markers in LANG_MARKERS.items():
        pat = r"\b(" + "|".join(markers) + r")\b"
        out[lang] = F.regexp_count(F.lower(F.col(col)), F.lit(pat))
    return out


def predicted_lang(col: str = "text") -> Column:
    """Argmax language by marker-word hits; zero hits → 'und'.

    Portable argmax: encode (score, rank) as ``score * 8 + rank`` with a
    fixed alphabetical rank per language, take ``greatest``, decode the
    rank — plain integer math that DuckDB evaluates identically. Ties
    resolve to the alphabetically-last language.
    """
    scores = lang_scores(col)
    langs = sorted(scores)  # fixed rank order
    encoded = [scores[lg] * 8 + i for i, lg in enumerate(langs)]
    best = F.greatest(*encoded)
    decoded = F.lit("und")
    for i, lg in reversed(list(enumerate(langs))):
        decoded = F.when(best % 8 == i, F.lit(lg)).otherwise(decoded)
    return F.when(best >= 8, decoded).otherwise(F.lit("und"))


def alpha_token_frac(col: str = "text") -> Column:
    """Fraction of whitespace tokens containing at least one alphabetic
    character (the Gopher "80% of words contain an alphabetic char"
    rule, Rae et al. 2021 §A1.1).  Higher-order ``filter`` over the
    token array — JVM-side, no UDF; DuckDB mirrors it with
    ``list_filter`` + ``regexp_matches``."""
    toks = F.split(F.trim(F.col(col)), WORD_SPLIT)
    n_alpha = F.size(F.filter(toks, lambda w: w.rlike("[a-zA-Z]")))
    return F.round(n_alpha.cast("double") / F.greatest(F.size(toks), F.lit(1)), 6)


# hash/ellipsis symbols per word — the Gopher symbol-to-word-ratio rule.
SYMBOL_PATTERN = r"#|\.\.\."


def symbol_word_ratio(col: str = "text") -> Column:
    return F.round(
        F.regexp_count(F.col(col), F.lit(SYMBOL_PATTERN)).cast("double")
        / F.greatest(n_tokens(col), F.lit(1)),
        6,
    )


# Gopher rule bounds (word-count bounds adapted to the synthetic corpus
# scale; the published rules use 50..100k words for web pages)
GOPHER_MIN_WORDS = 20
GOPHER_MAX_WORDS = 5000
GOPHER_MIN_MEAN_WORD_LEN = 3.0
GOPHER_MAX_MEAN_WORD_LEN = 10.0
GOPHER_MIN_ALPHA_FRAC = 0.8
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MIN_STOP_HITS = 2


def gopher_keep(col: str = "text") -> Column:
    """Conjunction of the Gopher quality-heuristic rules: word-count
    bounds, mean-word-length bounds, alphabetic-word fraction,
    symbol-to-word ratio, and minimum stopword hits.  Returned as INT
    (1 keep / 0 drop) so both engines hash identically."""
    keep = (
        n_tokens(col).between(GOPHER_MIN_WORDS, GOPHER_MAX_WORDS)
        & avg_token_len(col).between(GOPHER_MIN_MEAN_WORD_LEN, GOPHER_MAX_MEAN_WORD_LEN)
        & (alpha_token_frac(col) >= GOPHER_MIN_ALPHA_FRAC)
        & (symbol_word_ratio(col) <= GOPHER_MAX_SYMBOL_RATIO)
        & (stopword_count(col) >= GOPHER_MIN_STOP_HITS)
    )
    return keep.cast("int")


def fingerprint(col: str = "text") -> Column:
    """Document fingerprint: md5 of the alnum-normalized text — robust
    to whitespace/punctuation-only edits, portable across engines."""
    return F.md5(F.regexp_replace(F.lower(F.col(col)), "[^a-z0-9]", ""))


# PII detection/redaction patterns.  Deliberately restricted to regex
# syntax with identical semantics in Java regex (Spark) and RE2 (DuckDB):
# char classes, bounded/unbounded repetition, optional prefix.  Ordered:
# emails scrub first (their local parts may contain digits), then phones,
# then SSNs — the phone shape (1-2/3/4 digit groups) cannot match inside
# an SSN (3/2/4), so sequential replacement is order-safe.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "phone": (r"\+?[0-9]{1,2}-[0-9]{3}-[0-9]{4}", "<PHONE>"),
    "ssn": (r"[0-9]{3}-[0-9]{2}-[0-9]{4}", "<SSN>"),
}


def pii_counts(col: Column) -> dict[str, Column]:
    """Per-kind PII match counts (the audit half of redaction)."""
    return {
        kind: F.regexp_count(col, F.lit(pat)).cast("bigint")
        for kind, (pat, _) in PII_PATTERNS.items()
    }


def scrub_pii(col: Column) -> Column:
    """Redact every PII pattern with its typed placeholder — the
    corpus-release scrub step.  Pure JVM regexp_replace chain: narrow,
    no shuffle, scales with the scan."""
    out = col
    for pat, placeholder in PII_PATTERNS.values():
        out = F.regexp_replace(out, pat, placeholder)
    return out


def word_ngrams(col: Column, n: int) -> Column:
    """Sliding word n-grams over a token array, space-joined.

    Pure JVM higher-order functions (transform/slice/array_join): a
    narrow projection with no shuffle, so n-gram generation scales with
    the scan like the char-shingle path in operators/dedup.py.  Returns
    an empty array when the document has fewer than ``n`` tokens —
    Spark's ``sequence(1, 0)`` would count *down*, so the guard is
    load-bearing, not cosmetic.
    """
    toks = col
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
