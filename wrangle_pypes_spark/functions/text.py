"""Text analysis for training-data pipelines — pure Column expressions.

Each function is deterministic and (where registered in
``__spark_entry__``) has an ANSI-SQL oracle twin, so correctness is
checkable against DuckDB on the ``documents`` table.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Minimal per-language stopword lists for the n-gram/stopword language-ID
# heuristic.  (Real pipelines plug in fastText-style models via a pandas
# UDF; the heuristic keeps the hot path JVM-side.)
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to", "in", "is", "that", "it", "for"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"),
    "es": ("el", "la", "los", "de", "que", "y", "en", "un", "una", "por"),
    "fr": ("le", "la", "les", "de", "et", "un", "une", "est", "que", "pour"),
}


def tokens(text: Column) -> Column:
    """Lowercased whitespace tokens, empties removed."""
    return F.filter(F.split(F.lower(text), r"\s+"), lambda t: t != F.lit(""))


def token_count(text: Column) -> Column:
    """Whitespace token count (the cheap proxy; BPE-ish subword estimate
    below adds punctuation/wordpiece splits)."""
    return F.size(tokens(text))


def subword_token_estimate(text: Column) -> Column:
    """BPE-ish token-count estimate without a tokenizer model: words plus
    extra tokens for long words (≈1 per 4 chars beyond 4) plus
    punctuation marks.  Deterministic, SQL-expressible."""
    toks = tokens(text)
    word_cost = F.aggregate(
        toks, F.lit(0).cast("long"),
        lambda acc, t: acc + 1 + F.greatest(
            F.ceil((F.length(t) - 4) / 4.0), F.lit(0)).cast("long"))
    punct = F.length(text) - F.length(F.regexp_replace(text, r"[^\w\s]", ""))
    return (word_cost + punct).alias("subword_tokens")


def quality_score(text: Column) -> Column:
    """Heuristic document quality in [0,1]: mean of
    (a) alpha-character ratio, (b) non-stopword diversity
    (distinct/total tokens), (c) length sanity (tokens in [5, 5000]).
    Deterministic; mirrors C4-style quality filters."""
    toks = tokens(text)
    n = F.size(toks)
    alpha_ratio = (F.length(F.regexp_replace(F.lower(text), r"[^a-z]", ""))
                   / F.greatest(F.length(text), F.lit(1))).cast("double")
    diversity = (F.size(F.array_distinct(toks))
                 / F.greatest(n, F.lit(1))).cast("double")
    len_ok = F.when((n >= 5) & (n <= 5000), F.lit(1.0)).otherwise(F.lit(0.0))
    return F.round((alpha_ratio + diversity + len_ok) / 3.0, 6)


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    toks = tokens(text)
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return (hits / F.greatest(F.size(toks), F.lit(1))).cast("double")


def lang_id(text: Column) -> Column:
    """Stopword-vote language ID over the supported languages; 'und'
    (undetermined) when no stopword hits at all."""
    toks = tokens(text)
    scores = []
    for lang, words in STOPWORDS.items():
        sw = F.array(*[F.lit(w) for w in words])
        scores.append(F.struct(
            F.size(F.filter(toks, lambda t: F.array_contains(sw, t))).alias("hits"),
            F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*scores))  # max by (hits, lang)
    return F.when(best.getField("hits") > 0,
                  best.getField("lang")).otherwise(F.lit("und"))


def doc_fingerprint(text: Column) -> Column:
    """Canonical content fingerprint: md5 over the sorted distinct token
    set.  Robust to word order / duplication; identical across engines
    (md5 is bit-stable), so it doubles as the cross-engine dedup key."""
    canon = F.concat_ws(" ", F.array_sort(F.array_distinct(tokens(text))))
    return F.md5(canon)
