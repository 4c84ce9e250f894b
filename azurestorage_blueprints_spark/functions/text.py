"""Text-analysis column expressions for LLM-data-pipeline operators.

All JVM-side (no Python UDFs in the hot path): tokenization, token
counting, quality metrics, language-ID scoring, and a deterministic
rolling-hash document fingerprint — each designed so the same value is
computable in ANSI SQL for the correctness oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: tiny marker-word tables for the n-gram/stopword language-ID heuristic.
#: Real corpora would use char-trigram profiles; the mechanism (count
#: marker occurrences, argmax with deterministic tie-break) is the same.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of"),
    "es": ("el", "la", "de"),
    "fr": ("le", "la", "et"),
    "de": ("der", "die", "und"),
    "zh": ("de", "le", "shi"),
}

STOPWORDS: tuple[str, ...] = ("the", "a", "of", "and", "to", "in", "is")


def tokens(text: Column) -> Column:
    """Whitespace tokenization (split on single spaces — the documents
    corpus is single-space separated; a BPE-ish regex split is provided
    by ``bpe_ish_tokens``)."""
    return F.filter(F.split(text, " "), lambda t: t != "")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def bpe_ish_tokens(text: Column) -> Column:
    """BPE-ish sub-word segmentation: split on word boundaries keeping
    punctuation as separate tokens (regex common to Java and RE2)."""
    return F.filter(
        F.split(F.regexp_replace(text, r"([^a-zA-Z0-9 ])", r" $1 "), " "),
        lambda t: t != "",
    )


def word_shingles(toks: Column, k: int = 3) -> Column:
    """Word k-gram shingles (the MinHash unit) over a MATERIALIZED
    token-array column. Callers must tokenize in a separate ``select``
    and pass the attribute — higher-order functions are interpreted
    (CodegenFallback) and re-evaluate their full child subtree on every
    element access, so an inline ``tokens(text)`` argument makes the
    shingling quadratic in document length. Documents shorter than k
    tokens shingle to their whole token span. Shingle space grows with
    vocab^k, so near-identical shingle sets imply near-identical texts
    even over small vocabularies.

    When only shingle HASHES are consumed (no strings, no per-doc
    dedup), a posexplode + lead() window is ~1.5x faster (all codegen —
    see q_dedup_minhash_lsh); when a per-doc distinct follows, this
    array form wins because array_distinct dedups before the explode
    instead of paying a shuffle (measured on q_decontaminate)."""
    return F.when(
        F.size(toks) >= k,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - k),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
        ),
    ).otherwise(F.array(F.concat_ws(" ", toks)))


def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are punctuation (deterministic
    per-row double division)."""
    n_punct = F.length(text) - F.length(F.regexp_replace(text, r"[.,;:!?'\"()-]", ""))
    return n_punct.cast("double") / F.greatest(F.length(text), F.lit(1)).cast("double")


def word_set_occurrences(text: Column, words: tuple[str, ...]) -> Column:
    """Count tokens equal to any word in ``words`` — ONE codegen'd regex
    pass over the text instead of a length-diff pass per word. The
    lookahead ``(?= )`` keeps the trailing separator unconsumed so
    adjacent hits (``"to to"``) both count, matching token-equality
    semantics exactly (oracle twin: ``list_filter`` + ``list_contains``
    over the split tokens)."""
    padded = F.concat(F.lit(" "), text, F.lit(" "))
    return F.regexp_count(padded, F.lit(f" (?:{'|'.join(words)})(?= )"))


def stopword_ratio(text: Column) -> Column:
    """Fraction of tokens that are stopwords."""
    n_stop = word_set_occurrences(text, STOPWORDS)
    return n_stop.cast("double") / F.greatest(token_count(text), F.lit(1)).cast("double")


def lang_scores(text: Column) -> dict[str, Column]:
    """Marker-occurrence score per language (one regex pass each)."""
    return {
        lang: word_set_occurrences(text, markers)
        for lang, markers in LANG_MARKERS.items()
    }


def lang_guess(text: Column) -> Column:
    """Argmax language with deterministic lexicographic tie-break."""
    scores = lang_scores(text)
    langs = sorted(scores)  # lexicographic: ties go to the first name
    best = None
    best_score = None
    for lang in langs:
        if best is None:
            best, best_score = F.lit(lang), scores[lang]
        else:
            cond = scores[lang] > best_score
            best = F.when(cond, F.lit(lang)).otherwise(best)
            best_score = F.when(cond, scores[lang]).otherwise(best_score)
    return best


def rolling_fingerprint(text: Column) -> Column:
    """Deterministic polynomial rolling hash over the document's bytes:
    ``h = (h * 31 + code) mod 2^31-1`` left-fold — an order-sensitive
    content fingerprint (Rabin-Karp style) expressible in both engines
    as an explicit fold, exact in 64-bit integers."""
    codes = F.transform(F.split(text, ""), lambda c: F.ascii(c).cast("bigint"))
    return F.aggregate(
        codes,
        F.lit(0).cast("bigint"),
        lambda h, c: (h * 31 + c) % F.lit(2147483647).cast("bigint"),
    )

