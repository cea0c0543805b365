"""Text-analysis column functions for the training-data pipeline.

All of these are pure column expressions (JVM-side, whole-stage
codegen) — no Python UDFs in any of them — and each has an exact
ANSI-SQL twin used by the DuckDB oracle. They power the `documents`
table operators: language-ID, quality scoring, token counting,
fingerprinting, shingling for MinHash/Jaccard dedup.

Reference counterpart: the reference's scalar string surface
(`SURVEY §2.11`; e.g. regex extract/replace in
``data_integration/datasets/movielens.py:81-105``) plus the greenfield
LLM-pipeline extensions (no reference counterpart).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_RE = "[^a-z0-9]+"

# tiny per-language stopword marker sets for the n-gram/stopword
# language-ID heuristic
LANG_MARKERS = {
    "en": ("the", "and", "of", "to", "a"),
    "es": ("el", "la", "de", "que", "y"),
    "fr": ("le", "la", "de", "et", "les"),
    "de": ("der", "die", "und", "das", "ist"),
}


def tokens(c: Column) -> Column:
    """Lower-cased alphanumeric tokens; no empty strings.

    DuckDB twin: ``list_filter(regexp_split_to_array(lower(x),
    '[^a-z0-9]+'), t -> t <> '')``.
    """
    return F.filter(F.split(F.lower(c), TOKEN_RE), lambda t: t != F.lit(""))


def token_count(c: Column) -> Column:
    """Whitespace/punct token count (BPE-ish proxy for doc length)."""
    return F.size(tokens(c)).cast("bigint")


def ngrams_from_tokens(toks: Column, n: int = 3) -> Column:
    """Array of space-joined word n-grams from an ALREADY-MATERIALIZED
    token-array column.

    ``toks`` must be a plain column reference (not the ``tokens(...)``
    expression): expressions referenced inside a ``transform`` lambda
    are re-evaluated per output element, which turns an inlined
    tokenizer into an O(len^2) scan. Callers materialize the token
    array in a projection first (see dedup.doc_shingles).
    """
    count = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(0))
    idx = F.sequence(F.lit(0), count - F.lit(1))
    return F.when(count > 0, F.transform(
        idx, lambda i: F.concat_ws(" ", *[F.element_at(toks, i + F.lit(j + 1)) for j in range(n)])
    )).otherwise(F.array().cast("array<string>"))


def word_ngrams(c: Column, n: int = 3) -> Column:
    """Word n-grams straight from a text column.

    Convenience form for short strings; for document-scale text prefer
    materializing ``tokens(c)`` in a projection and calling
    :func:`ngrams_from_tokens` (see its docstring for why).
    """
    return ngrams_from_tokens(tokens(c), n)


def char_shingles(c: Column, n: int = 8) -> Column:
    """Distinct character n-gram shingles of the lower-cased text."""
    s = F.lower(c)
    count = F.length(s) - F.lit(n - 1)
    return F.when(
        count > 0,
        F.array_distinct(
            F.transform(F.sequence(F.lit(1), count), lambda i: F.substring(s, i, n))
        ),
    ).otherwise(F.array().cast("array<string>"))


def stopword_hits(toks: Column, lang: str) -> Column:
    """How many tokens (token-array column) are in ``lang``'s marker set."""
    marks = F.array(*[F.lit(w) for w in LANG_MARKERS[lang]])
    return F.size(F.filter(toks, lambda t: F.array_contains(marks, t)))


def lang_id_from_tokens(toks: Column) -> Column:
    """Heuristic language ID over a materialized token-array column:
    argmax of stopword-marker hits, 'und' if no marker matched.
    Deterministic tie-break: lexicographically-first language wins.
    """
    # linear argmax: one (hits, lang) struct per language, folded
    # left-to-right in sorted order — strictly-greater wins, so ties
    # keep the lexicographically-first language. The previous nested-
    # CASE build re-nested EVERY prior hits expression into each step
    # (expression tree ~2^|langs|); inlined through a filter pushdown
    # (tx3's stratified sample) the duplicated tree re-tokenized the
    # text dozens of times per row and fell out of whole-stage codegen.
    # Each stopword_hits now appears exactly once.
    cands = F.array(
        *[
            F.struct(
                stopword_hits(toks, lang).alias("h"), F.lit(lang).alias("lang")
            )
            for lang in sorted(LANG_MARKERS)
        ]
    )
    best = F.aggregate(
        cands,
        F.struct(F.lit(0).alias("h"), F.lit("und").alias("lang")),
        lambda acc, x: F.when(x["h"] > acc["h"], x).otherwise(acc),
    )
    return best["lang"]


def lang_id(c: Column) -> Column:
    """Language ID straight from text (convenience; prefer the
    ``_from_tokens`` variant when tokens are already materialized)."""
    return lang_id_from_tokens(tokens(c))


def quality_score_from_tokens(c: Column, toks: Column) -> Column:
    """Composite doc-quality score in [0,1]-ish: length band, alpha
    ratio, mean token length band. Pure arithmetic -> reproducible.
    ``c`` is the raw text, ``toks`` its materialized token array.
    """
    n_chars = F.length(c).cast("double")
    n_alpha = F.length(F.regexp_replace(F.lower(c), "[^a-z]", "")).cast("double")
    n_toks = F.size(toks).cast("double")
    alpha_ratio = F.when(n_chars > 0, n_alpha / n_chars).otherwise(F.lit(0.0))
    mean_tok_len = F.when(n_toks > 0, n_alpha / n_toks).otherwise(F.lit(0.0))
    len_band = F.least(n_chars / F.lit(400.0), F.lit(1.0))
    tok_band = F.least(mean_tok_len / F.lit(6.0), F.lit(1.0))
    return F.round(
        F.lit(0.4) * alpha_ratio + F.lit(0.3) * len_band + F.lit(0.3) * tok_band, 6
    )


def quality_score(c: Column) -> Column:
    """Quality score straight from text (convenience form)."""
    return quality_score_from_tokens(c, tokens(c))


def fingerprint_from_tokens(toks: Column, window: int = 16, mod: int = 2147483647) -> Column:
    """Order-sensitive rolling document fingerprint over a materialized
    token-array column.

    Polynomial-ish rolling hash over token lengths+first chars with a
    cyclic positional weight — cheap, order-sensitive, and expressible
    identically in DuckDB (see oracle). Collisions are acceptable: it's
    a fingerprint for near-dup bucketing, not cryptographic.
    """
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks), F.lit(1)))
    contrib = F.transform(
        idx,
        lambda i: (
            (F.ascii(F.element_at(toks, i)) * F.lit(131)
             + F.length(F.element_at(toks, i)) * F.lit(31)
             + F.pmod(i.cast("bigint"), F.lit(window)) * F.lit(17))
            * (F.pmod(i.cast("bigint"), F.lit(window)) + F.lit(1))
        ).cast("bigint"),
    )
    total = F.aggregate(
        F.when(F.size(toks) > 0, contrib).otherwise(F.array().cast("array<bigint>")),
        F.lit(0).cast("bigint"),
        lambda acc, x: F.pmod(acc + x, F.lit(mod)),
    )
    return total


def doc_fingerprint(c: Column, window: int = 16, mod: int = 2147483647) -> Column:
    """Fingerprint straight from text (convenience form)."""
    return fingerprint_from_tokens(tokens(c), window, mod)


# Conservative patterns shared (syntax-compatible) by Java regex and
# DuckDB's RE2: character classes, +, bounded repeats only.
EMAIL_RE = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z][a-zA-Z]+"
URL_RE = r"https?://[^ \t\n]+"
IPV4_RE = r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"


def count_pii(c: Column) -> tuple[Column, Column, Column]:
    """(n_emails, n_urls, n_ips) match counts — audit columns for the
    scrub step. Order-independent counts, so URL-embedded IPs are
    counted under both (documented; the scrub applies email->url->ip)."""
    return (
        F.regexp_count(c, F.lit(EMAIL_RE)).cast("bigint"),
        F.regexp_count(c, F.lit(URL_RE)).cast("bigint"),
        F.regexp_count(c, F.lit(IPV4_RE)).cast("bigint"),
    )


def scrub_pii(c: Column) -> Column:
    """Redact emails/URLs/IPv4s to typed placeholder tokens — the
    PII-scrub pass of a training-data pipeline. Pure regexp_replace
    chain (JVM codegen); DuckDB twin: regexp_replace(..., 'g') in the
    same email->url->ip order (emails first so user@host never
    half-matches as a hostname; IPs inside URLs are already collapsed
    by the URL pass)."""
    out = F.regexp_replace(c, EMAIL_RE, "<EMAIL>")
    out = F.regexp_replace(out, URL_RE, "<URL>")
    return F.regexp_replace(out, IPV4_RE, "<IP>")


def chunk_starts(toks: Column, chunk: int, stride: int) -> Column:
    """0-based start offsets of token windows covering a materialized
    token array: 0, stride, 2*stride, ... while start < len (always at
    least one chunk for a non-empty doc; a doc shorter than ``chunk``
    yields exactly one). ``stride < chunk`` gives overlapping windows."""
    n = F.size(toks)
    last = F.when(n > chunk, F.ceil((n - F.lit(chunk)) / F.lit(stride))).otherwise(F.lit(0))
    return F.transform(
        F.sequence(F.lit(0), last.cast("int")), lambda i: i * F.lit(stride)
    )


def chunk_tokens(toks: Column, start: Column, chunk: int) -> Column:
    """The ``chunk``-token window of a token array starting at a
    0-based offset (Spark slice is 1-based)."""
    return F.slice(toks, start + F.lit(1), chunk)
