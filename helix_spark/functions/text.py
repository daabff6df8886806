"""Text-analysis column expressions for training-data pipelines.

All pure JVM-side column expressions (no Python UDFs): language ID by
stopword-hit heuristic, quality scoring, token counting, shingling, and a
polynomial rolling-hash document fingerprint. Each has an exact ANSI-SQL
twin in __spark_entry__.oracle_sql() so DuckDB can verify it.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny deterministic stopword lists per language — a heuristic language ID.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a"],
    "es": ["el", "la", "de", "que", "y"],
    "fr": ["le", "la", "et", "les", "des"],
    "de": ["der", "die", "und", "das", "ist"],
    "zh": ["de5", "shi4", "le5", "zai4", "he2"],
}

TOKEN_SPLIT_RE = r"[^a-zA-Z0-9_]+"
# BPE-ish token regex: words, numbers, or single punctuation marks
BPE_TOKEN_RE = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"

# Polynomial rolling-hash constants (shared with oracle SQL; fits in int64
# without overflow because we mod at each step).
FP_BASE = 1000003
FP_MOD = 2147483647  # 2^31 − 1 (Mersenne prime)


def tokens_col(text: Column) -> Column:
    """Whitespace/punct tokenization → array<string> (empty strings removed)."""
    return F.filter(F.split(F.lower(text), TOKEN_SPLIT_RE), lambda t: t != "")


def token_count_col(text: Column) -> Column:
    return F.size(tokens_col(text))


def bpe_ish_token_count_col(text: Column) -> Column:
    """Count of BPE-ish regex tokens (words | numbers | punct marks)."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_TOKEN_RE), 0))


def stopword_hits_col(text: Column, stopwords: list[str]) -> Column:
    toks = tokens_col(text)
    return F.size(F.filter(toks, lambda t: t.isin(*stopwords)))


def lang_id_col(text: Column) -> Column:
    """Pick the language whose stopword list hits most.

    Tie-break: lexicographically GREATEST language code (struct max over
    (hits, lang)) — deterministic and reproducible in the SQL oracle with a
    nested CASE.
    """
    toks = tokens_col(text)

    def _hits(sw):
        return lambda t: t.isin(*sw)

    scores = [
        F.struct(
            F.size(F.filter(toks, _hits(sw))).alias("hits"),
            F.lit(lang).alias("lang"),
        )
        for lang, sw in sorted(LANG_STOPWORDS.items())
    ]
    best = F.array_max(F.array(*scores))
    return best.getField("lang")


def _quality_sum_col(text: Column) -> Column:
    """Shared quality spec (ONE definition — both the float and the
    hash-comparable milli-int form derive from this): alpha ratio + mean
    token-length band + non-empty-ness, each in [0,1]."""
    n_chars = F.length(text)
    n_alpha = F.length(F.regexp_replace(text, r"[^a-zA-Z]", ""))
    n_tokens = token_count_col(text)
    alpha_ratio = F.when(n_chars > 0, n_alpha / n_chars).otherwise(F.lit(0.0))
    mean_tok = F.when(n_tokens > 0, n_alpha / n_tokens).otherwise(F.lit(0.0))
    tok_band = F.when((mean_tok >= 3.0) & (mean_tok <= 10.0), F.lit(1.0)).otherwise(F.lit(0.5))
    nonempty = F.when(n_tokens >= 5, F.lit(1.0)).otherwise(F.lit(0.0))
    return alpha_ratio + tok_band + nonempty


def quality_score_col(text: Column) -> Column:
    """Deterministic [0,1] quality score from simple surface statistics."""
    return F.round(_quality_sum_col(text) / F.lit(3.0), 6)


def quality_score_milli_col(text: Column) -> Column:
    """Integer milli-units form (floor — no round-half rules), the
    cross-engine hash-comparable variant used by the driver battery."""
    return F.floor(_quality_sum_col(text) / F.lit(3.0) * 1000).cast("long")


def shingles_from_tokens_col(toks: Column, k: int = 3) -> Column:
    """Word k-shingles from an ALREADY-MATERIALIZED token array column.

    ``toks`` must be a bound attribute (produced by a prior projection, e.g.
    ``.select(tokens_col(text).alias("__t")).select(shingles_from_tokens_col
    (F.col("__t")))``): interpreted expression evaluation computes every
    occurrence of a non-attribute child independently, and the shingle tree
    references the token array 4+ times — with the tokenization inlined the
    split+filter re-ran per reference (measured 1.76 s → 0.30 s at sf0.1 for
    the whole shingle explode when the callers switched to the two-step
    projection; CollapseProject keeps the steps apart because the token
    array is non-cheap and multiply referenced). Same zip_with-of-slices
    construction as before — identical output strings."""
    n = F.size(toks)
    m = n - F.lit(k - 1)

    def build():
        acc = F.slice(toks, 1, m)
        for j in range(1, k):
            acc = F.zip_with(
                acc, F.slice(toks, j + 1, m),
                lambda a, b: F.concat_ws(" ", a, b),
            )
        return acc

    return F.when(n >= k, build()).otherwise(F.array().cast("array<string>"))


def shingles_col(text: Column, k: int = 3) -> Column:
    """Word k-shingles as strings 'w1 w2 w3' → array<string> (may be empty).

    Built by zip_with-folding k shifted SLICES of the token array — toks
    appears only as a DIRECT child of slice/zip_with, never inside a
    lambda body. The previous form (transform over indices with
    slice(toks, i, k) in the lambda) re-evaluated the whole tokenization
    per shingle under interpreted higher-order-function evaluation —
    quadratic per document (measured ~2 ms/shingle; a 5k-doc corpus spent
    ~500 core-seconds just re-splitting text). Short documents (< k
    tokens) map to an empty array; slice lengths are exact so zip_with
    never NULL-pads."""
    toks = tokens_col(text)
    n = F.size(toks)
    m = n - F.lit(k - 1)  # shingle count when n ≥ k

    def build():
        acc = F.slice(toks, 1, m)
        for j in range(1, k):
            acc = F.zip_with(
                acc, F.slice(toks, j + 1, m),
                lambda a, b: F.concat_ws(" ", a, b),
            )
        return acc

    return F.when(n >= k, build()).otherwise(F.array().cast("array<string>"))


def fingerprint_col(text: Column) -> Column:
    """Polynomial rolling hash over lowercased text bytes:
    h = sum(ascii(c_i) * BASE^(n-i)) mod FP_MOD, computed left-to-right as
    h = (h*BASE + code) mod MOD via aggregate. Exactly reproducible in SQL."""
    codes = F.transform(F.split(F.lower(text), ""), lambda c: F.ascii(c))
    return F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * FP_BASE + c.cast("long")) % FP_MOD,
    )
