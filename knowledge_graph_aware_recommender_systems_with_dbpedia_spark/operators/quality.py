"""Repetition-based document quality filters — greenfield LLM-pipeline
operator (the Gopher/MassiveText repetition rule family: drop docs
dominated by a repeated phrase or with too few distinct words).

Plan shape: the per-doc top n-gram is a (doc, ngram) explode ->
count -> per-doc argmax. The argmax is a hash aggregate
``min(struct(-cnt, ngram))`` — count-desc with lexicographic
tie-break, map-side combinable — NOT a per-doc sort window, so the
shuffle carries one candidate row per (doc, ngram) and no global or
per-doc ordering step exists. Everything else is pure column
arithmetic on materialized token arrays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import ngrams_from_tokens, tokens


def repetition_stats(
    docs: DataFrame,
    n: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-doc repetition metrics:

      * ``n_tokens`` / ``distinct_frac`` — distinct-word fraction
        (low => word-level repetition);
      * ``top_ngram`` / ``top_ngram_n`` — the most frequent word
        n-gram (count-desc, lexicographic tie-break) and its count;
      * ``top_ngram_char_frac`` — fraction of the doc's characters
        covered by occurrences of that n-gram (the Gopher
        "top n-gram character fraction" filter).
    """
    base = docs.select(
        F.col(id_col).alias("id"),
        F.length(text_col).cast("bigint").alias("_chars"),
        tokens(F.col(text_col)).alias("_toks"),
    ).select(
        "id",
        "_chars",
        F.size("_toks").cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct("_toks")).cast("bigint").alias("_distinct"),
        ngrams_from_tokens(F.col("_toks"), n).alias("_ngs"),
    )
    counts = (
        base.select("id", F.explode("_ngs").alias("ngram"))
        .groupBy("id", "ngram")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    top = counts.groupBy("id").agg(
        F.min(F.struct((-F.col("cnt")).alias("neg"), F.col("ngram").alias("ngram"))).alias("_t")
    ).select(
        "id",
        F.col("_t.ngram").alias("top_ngram"),
        (-F.col("_t.neg")).cast("bigint").alias("top_ngram_n"),
    )
    return base.join(top, "id", "left").select(
        "id",
        "n_tokens",
        F.when(
            F.col("n_tokens") > 0,
            F.round(F.col("_distinct") / F.col("n_tokens"), 6),
        ).otherwise(F.lit(0.0)).alias("distinct_frac"),
        F.coalesce("top_ngram", F.lit("")).alias("top_ngram"),
        F.coalesce("top_ngram_n", F.lit(0)).cast("bigint").alias("top_ngram_n"),
        F.when(
            F.col("_chars") > 0,
            F.round(
                F.coalesce("top_ngram_n", F.lit(0))
                * F.length(F.coalesce("top_ngram", F.lit("")))
                / F.col("_chars"),
                6,
            ),
        ).otherwise(F.lit(0.0)).alias("top_ngram_char_frac"),
    )


def filter_by_repetition(
    docs: DataFrame,
    n: int = 2,
    max_top_ngram_char_frac: float = 0.2,
    min_distinct_frac: float = 0.2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Docs surviving the repetition thresholds (Gopher-style rules:
    n=2 at 0.2 is the published top-2-gram cutoff)."""
    stats = repetition_stats(docs, n, id_col, text_col)
    keep = stats.filter(
        (F.col("top_ngram_char_frac") <= max_top_ngram_char_frac)
        & (F.col("distinct_frac") >= min_distinct_frac)
    ).select(F.col("id").alias(id_col))
    return docs.join(keep, id_col, "left_semi")


def unigram_logprob(
    docs: DataFrame,
    vocab_size: int = 50_000,
    alpha: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-doc mean token log-probability under the corpus's OWN
    add-alpha-smoothed unigram LM — the cheap stand-in for the
    KenLM-perplexity quality filter (docs of improbable tokens score
    low; gibberish and boilerplate separate cleanly).

    p(tok) = (tf + alpha) / (total + alpha * (V + 1)) with tf = 0 for
    tokens outside the top-``vocab_size`` vocabulary (the +1 is the
    OOV class). The vocabulary is deterministic (tf desc, token asc)
    and broadcast; the two corpus scalars (total token count, kept
    vocab size) collect as literals — the only driver traffic. Output:
    (id, n_tokens, mean_logp) with mean_logp rounded to 6 (double
    sums are engine-order-dependent past ~1e-12).
    """
    from ..functions.text import tokens

    toks = docs.select(
        F.col(id_col).alias("id"), F.explode(tokens(F.col(text_col))).alias("tok")
    )
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("tf"))
    total = counts.agg(F.sum("tf")).collect()[0][0] or 0
    vocab = counts.orderBy(F.desc("tf"), "tok").limit(vocab_size)
    v = vocab.count()
    denom = float(total) + alpha * (v + 1)
    scored = toks.join(F.broadcast(vocab), "tok", "left").select(
        "id",
        F.log((F.coalesce(F.col("tf"), F.lit(0)) + F.lit(alpha)) / F.lit(denom)).alias("_lp"),
    )
    return scored.groupBy("id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.round(F.avg("_lp"), 6).alias("mean_logp"),
    )
