"""Text-analysis scalar functions (north star BASELINE.json:6 — LLM-data
-pipeline operators). Pure column expressions; the only regexes used are
plain character classes that mean the same thing in Java regex (Spark)
and RE2 (DuckDB), so every function here has an exact SQL oracle twin.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/lexicon language-ID
# heuristic. Deterministic and mirrored verbatim in the SQL oracle.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ist", "nicht"),
    "en": ("the", "a", "of", "and", "is", "to"),
    "es": ("el", "la", "de", "y", "es", "no"),
    "fr": ("le", "la", "et", "de", "est", "ne"),
    "zh": ("de", "shi", "le", "bu", "wo", "zai"),
}

EN_STOPWORDS = LANG_STOPWORDS["en"]

# BPE-ish pre-tokenizer: letter runs | digit runs | single non-space
# symbol — the classic GPT-2-style coarse split, identical in RE2/Java.
BPE_ISH_PATTERN = r"[a-z]+|[0-9]+|[^a-z0-9\s]"

FINGERPRINT_MOD = 1_000_000_007
FINGERPRINT_BASE = 31


def tokens(text: Column) -> Column:
    """Whitespace tokenization (documents.text is single-space joined)."""
    return F.split(text, " ")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def bpe_ish_count(text: Column) -> Column:
    """Token count under the BPE-ish regex pre-tokenizer."""
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(BPE_ISH_PATTERN), 0))


def stopword_ratio(text: Column, words: tuple[str, ...] = EN_STOPWORDS) -> Column:
    toks = tokens(F.lower(text))
    hits = F.size(F.filter(toks, lambda t: t.isin(*words)))
    return hits / F.size(toks)


def punct_ratio(text: Column) -> Column:
    """Share of non-alphanumeric, non-space characters."""
    n_punct = F.size(F.regexp_extract_all(F.lower(text), F.lit(r"[^a-z0-9\s]"), 0))
    return n_punct.cast("double") / F.length(text)


def avg_token_len(text: Column) -> Column:
    """Mean token length = non-space chars / token count."""
    return F.length(F.replace(text, F.lit(" "), F.lit(""))).cast("double") / token_count(text)


def quality_score(text: Column) -> Column:
    """Deterministic document quality heuristic: length saturation +
    cleanliness + stopword naturalness, each in [0,1]."""
    length_part = F.least(F.lit(1.0), token_count(text) / F.lit(100.0))
    clean_part = F.lit(1.0) - punct_ratio(text)
    natural_part = F.least(F.lit(1.0), stopword_ratio(text) * 5.0)
    return F.round(0.4 * length_part + 0.3 * clean_part + 0.3 * natural_part, 6)


def word_shingles(text: Column, n: int = 3, pre_tokenized: bool = False) -> Column:
    """n-word shingles as strings (the dedup unit for MinHash/Jaccard).

    Pass ``pre_tokenized=True`` with an ``array<string>`` column when the
    token array is already materialized: referencing a split expression
    from inside the HOF lambda re-evaluates it once per ``get`` (~3n per
    row) because Catalyst does no CSE inside lambda bodies. Callers on
    the hot path (``shingle_table``) project the split first."""
    toks = text if pre_tokenized else tokens(F.lower(text))
    idx = F.sequence(F.lit(0), F.size(toks) - n)
    return F.when(
        F.size(toks) >= n,
        F.transform(
            idx,
            lambda i: F.concat_ws(
                " ", *[F.get(toks, i + j) for j in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def rolling_fingerprint(text: Column) -> Column:
    """Polynomial rolling hash over characters:
    ``acc = (acc*31 + ascii(ch)) mod 1e9+7`` — a deterministic document
    fingerprint computed as a JVM-side fold (no UDF); oracle uses
    DuckDB list_reduce with a prepended 0 as the init element."""
    chars = F.split(text, "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * FINGERPRINT_BASE + F.ascii(ch)) % FINGERPRINT_MOD,
    )
