"""Sequence packing — greenfield LLM-training-pipeline operator.

Packing concatenates documents into fixed-token-budget training
sequences (the "sample packing" step every LLM pretraining pipeline
runs between cleaning and tokenization). Exact first-fit packing is
inherently sequential; the scalable form used here is bucketed
next-fit-by-cumulative-sum:

 * docs are hash-bucketed (md5 of the id — deterministic, uniform,
   layout-independent), so packing parallelism == n_buckets and no
   global single-partition window exists anywhere in the plan;
 * within a bucket, docs are ordered by id and a running token cumsum
   assigns ``seq_id = floor(cum_before / capacity)`` — a doc whose
   tokens straddle a boundary stays whole in the sequence its prefix
   started (next-fit semantics: sequences can overflow by up to one
   doc, and a doc longer than ``capacity`` gets a sequence of its
   own — standard greedy-packing behavior, callers that need hard
   caps split long docs first);
 * the whole plan is window + arithmetic: engine-portable (the DuckDB
   oracle replays it with the same SQL window) and shuffle-bounded by
   the bucket key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import md5_long
from ..functions.text import token_count


def pack_sequences(
    docs: DataFrame,
    capacity: int = 512,
    n_buckets: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_tokens_col: str | None = None,
) -> DataFrame:
    """Assign every doc to a packed training sequence.

    Returns (id, bucket, seq_id, n_tokens, cum_tokens) where
    (bucket, seq_id) is the packed-sequence key and cum_tokens the
    running total within the bucket (useful for offset computation
    downstream). Pass ``n_tokens_col`` to reuse a precomputed token
    count instead of tokenizing ``text_col``.
    """
    if n_tokens_col is None:
        base = docs.select(
            F.col(id_col).alias("id"),
            token_count(F.col(text_col)).alias("n_tokens"),
        )
    else:
        base = docs.select(
            F.col(id_col).alias("id"),
            F.col(n_tokens_col).cast("bigint").alias("n_tokens"),
        )
    b = base.withColumn(
        "bucket", F.pmod(md5_long(F.col("id")), F.lit(n_buckets))
    )
    w = Window.partitionBy("bucket").orderBy("id")
    cum = F.sum("n_tokens").over(w)
    return (
        b.withColumn("cum_tokens", cum)
        .withColumn(
            "seq_id",
            F.floor((F.col("cum_tokens") - F.col("n_tokens")) / F.lit(capacity)),
        )
        .select("id", "bucket", "seq_id", "n_tokens", "cum_tokens")
    )


def sequence_stats(packed: DataFrame, capacity: int = 512) -> DataFrame:
    """Per-sequence fill stats: (bucket, seq_id, n_docs, seq_tokens,
    fill_ratio) — the packing-efficiency audit (mean fill_ratio is the
    number a pipeline tunes capacity/bucketing against)."""
    return packed.groupBy("bucket", "seq_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("seq_tokens"),
        F.round(F.sum("n_tokens") / F.lit(float(capacity)), 6).alias("fill_ratio"),
    )


def chunk_by_sentences(
    docs: DataFrame,
    budget: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sentence-ALIGNED chunking — the RAG chunker variant
    :func:`chunk_documents`'s fixed token windows can't express: a
    sentence never splits across chunks. Sentences (split on
    ``[.!?]+[ \\t\\n\\f\\r]*`` runs — the whitespace class is spelled
    explicitly because Java's ``\\s`` includes vertical tab \\x0B while
    RE2's (DuckDB's) does not, so the shorthand would diverge between
    the Spark plan and the CK2_SQL oracle on \\x0B-bearing text) are
    assigned to chunk ``floor(tokens_before / budget)`` — the pk1
    bucketed next-fit: deterministic, one per-doc window (bounded by
    sentences-per-doc), and a chunk may overflow the budget by at most
    one sentence's tokens, the standard trade for expressing the
    packing without a sequential scan. Output: (id, chunk_idx,
    n_sentences, n_tokens, chunk_text) with sentences joined in
    document order."""
    from ..functions.text import tokens

    sents = docs.select(
        F.col(id_col).alias("id"),
        F.posexplode(
            F.filter(
                F.split(F.col(text_col), r"[.!?]+[ \t\n\f\r]*"),
                lambda s: F.trim(s) != F.lit(""),
            )
        ).alias("sent_idx", "sentence"),
    ).withColumn("n_toks", F.size(tokens(F.col("sentence"))).cast("bigint"))
    w = (
        Window.partitionBy("id")
        .orderBy("sent_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    chunked = sents.withColumn(
        "chunk_idx",
        F.floor(
            F.coalesce(F.sum("n_toks").over(w), F.lit(0)) / F.lit(float(budget))
        ).cast("bigint"),
    )
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct("sent_idx", "sentence"))),
        lambda s: s["sentence"],
    )
    return chunked.groupBy("id", "chunk_idx").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sentences"),
        F.sum("n_toks").alias("n_tokens"),
        F.array_join(ordered, " || ").alias("chunk_text"),
    )


def chunk_documents(
    docs: DataFrame,
    chunk: int = 128,
    stride: int = 96,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split docs into (overlapping) token windows — the chunking step
    before embedding/indexing in a RAG or embedding-training pipeline.

    Chunk starts are 0, stride, 2*stride, ... with the last window
    guaranteed to cover the doc tail (stride < chunk => overlap).
    JVM-side throughout: materialized token array -> posexplode of the
    start-offset array -> slice; no Python, no shuffle (the explode is
    a map-side fan-out). Output: (id, chunk_idx, n_tokens,
    chunk_text); empty docs yield no chunks.
    """
    from ..functions.text import chunk_starts, chunk_tokens, tokens

    toks = docs.select(
        F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("_toks")
    )
    exploded = toks.select(
        "id",
        "_toks",
        F.posexplode(chunk_starts(F.col("_toks"), chunk, stride)).alias(
            "chunk_idx", "_start"
        ),
    )
    win = chunk_tokens(F.col("_toks"), F.col("_start"), chunk)
    return (
        exploded.select(
            "id",
            F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
            F.size(win).cast("bigint").alias("n_tokens"),
            F.concat_ws(" ", win).alias("chunk_text"),
        )
        .filter(F.col("n_tokens") > 0)
    )


def shuffle_shards(
    docs: DataFrame,
    n_shards: int = 16,
    id_col: str = "doc_id",
    salt: str = "shuf42",
) -> DataFrame:
    """Deterministic corpus shuffle for training order: every doc gets
    an md5 rank, a shard (rank mod ``n_shards``), and a position
    within its shard. The only window is PARTITIONED by shard — each
    partition holds ~1/n_shards of the corpus, and the shard count
    scales with the cluster, so no single-task funnel. Reshuffling =
    changing the salt; the assignment is reproducible across runs and
    engines (md5 twin — pk3's oracle replays it in DuckDB).

    Output: input columns + (shard bigint, pos bigint).
    """
    keyed = docs.withColumn(
        "_r",
        md5_long(F.concat(F.col(id_col).cast("string"), F.lit(f":{salt}"))),
    ).withColumn("shard", F.pmod(F.col("_r"), F.lit(n_shards)).cast("bigint"))
    w = Window.partitionBy("shard").orderBy("_r", id_col)
    return (
        keyed.withColumn("pos", F.row_number().over(w).cast("bigint")).drop("_r")
    )
