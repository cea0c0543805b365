"""Streaming deduplication — greenfield scale extension.

A 100 TB corpus ingested as a stream wants dedup AT INGEST (state
store) rather than as a later batch pass over everything landed.
Structured Streaming's ``dropDuplicates`` keeps the first-arriving row
per key and holds only the key in state — hashing the text first means
the state store carries 16 bytes per distinct doc, never the text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOCS_FIELDS = "doc_id bigint, text string"


def read_docs_stream(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream of (doc_id, text) parquet."""
    import os

    reader = spark.readStream.schema(DOCS_FIELDS)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    if os.path.isfile(path):
        head, tail = os.path.split(path)
        path = os.path.join(head, "{%s}" % tail)
    return reader.parquet(path)


def ingest_pipeline_stream(
    docs: DataFrame,
    benchmark: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    n: int = 3,
    min_overlap: int = 2,
    scrub: bool = True,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Clean-at-ingest: the batch pipeline stages applied to a doc
    stream. Returns the started StreamingQuery (caller awaits).

     * cross-batch exact dedup via the md5-keyed state store
       (``dropDuplicates`` — first arrival wins, 16 B state/doc);
     * benchmark decontamination + PII scrub run INSIDE
       ``foreachBatch``: contamination is per-doc against a STATIC
       eval set, so batch semantics per micro-batch are exactly
       correct (no cross-batch state). The eval-set shingle table is
       built and persisted ONCE here, then broadcast into every
       micro-batch's join — the stream never re-shingles the
       benchmark per trigger;
     * surviving rows append to parquet — exactly-once via the
       checkpoint + idempotent file sink.
    """
    import os

    from ..functions.text import scrub_pii
    from ..operators.dedup import bench_shingle_table, decontaminate

    deduped = docs.select(
        F.col(id_col), F.col(text_col), F.md5(F.col(text_col)).alias("_h")
    ).dropDuplicates(["_h"]).drop("_h")

    b_sh = bench_shingle_table(benchmark, n=n, id_col=id_col, text_col=text_col).persist()

    def process(batch: DataFrame, _batch_id: int) -> None:
        clean = decontaminate(
            batch, benchmark, n=n, min_overlap=min_overlap,
            id_col=id_col, text_col=text_col, bench_shingles=b_sh,
        )
        if scrub:
            clean = clean.select(
                F.col(id_col), scrub_pii(F.col(text_col)).alias(text_col)
            )
        clean.write.mode("append").parquet(out_dir)

    return (
        deduped.writeStream.foreachBatch(process)
        .option("checkpointLocation", os.path.join(checkpoint_dir, "ingest"))
        .trigger(availableNow=True)
        .start()
    )


def decontaminate_stream(
    docs: DataFrame,
    benchmark: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    n: int = 3,
    min_overlap: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Incremental benchmark decontamination: each arriving micro-batch
    is anti-joined against the (persisted, broadcast) eval-set shingle
    table; survivors append to parquet. Contamination is per-doc
    against a static eval set — stateless across batches — so the
    streamed survivor set EQUALS the batch :func:`~..operators.dedup.
    decontaminate` result under any batching (parity asserted in
    tests and via the st5 driver oracle). Returns the started query.
    """
    import os

    from ..operators.dedup import bench_shingle_table, decontaminate

    b_sh = bench_shingle_table(benchmark, n=n, id_col=id_col, text_col=text_col).persist()

    def process(batch: DataFrame, _batch_id: int) -> None:
        decontaminate(
            batch, benchmark, n=n, min_overlap=min_overlap,
            id_col=id_col, text_col=text_col, bench_shingles=b_sh,
        ).write.mode("append").parquet(out_dir)

    return (
        docs.writeStream.foreachBatch(process)
        .option("checkpointLocation", os.path.join(checkpoint_dir, "decon"))
        .trigger(availableNow=True)
        .start()
    )


def incremental_dedup_stream(
    docs: DataFrame,
    corpus: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    bands: int = 4,
    n_hashes: int = 16,
    n: int = 3,
    verify_threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Daily-crawl dedup AT INGEST: each arriving micro-batch is
    LSH-banded, joined against the ONCE-BUILT (persisted) corpus
    band/shingle index, exact-verified, and its survivors append to
    parquet. Per-trigger cost is proportional to the batch, never the
    corpus — the streaming twin of ``dedup.dedup_against_corpus``
    (dd11). Each doc's verdict depends only on (doc, corpus), so the
    survivor set is batching-invariant and the batch oracle applies.
    Returns the started query."""
    import os

    from ..operators.dedup import build_corpus_dedup_index, dedup_against_corpus

    buckets, shingles = build_corpus_dedup_index(
        corpus, bands, n_hashes, n, id_col, text_col
    )
    state = (buckets.persist(), shingles.persist())

    def process(batch: DataFrame, _batch_id: int) -> None:
        dedup_against_corpus(
            batch, corpus, bands, n_hashes, n, verify_threshold,
            id_col, text_col, corpus_state=state,
        ).write.mode("append").parquet(out_dir)

    return (
        docs.writeStream.foreachBatch(process)
        .option("checkpointLocation", os.path.join(checkpoint_dir, "incdedup"))
        .trigger(availableNow=True)
        .start()
    )


def exact_dedup_stream(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Keep the FIRST-ARRIVING row per distinct text (md5 state key).

    Streaming twin of the batch ``dedup.exact_dedup`` keeper set: the
    batch op keeps min-id, the stream keeps first-arrival — on an
    id-ordered replay the two keeper sets coincide (asserted in
    tests); on an unordered stream they are the same SIZE but may
    pick different representatives per duplicate class (first-arrival
    is the only well-defined choice without buffering). For unbounded
    streams add ``withWatermark`` on an event-time column upstream and
    use ``dropDuplicatesWithinWatermark`` so state can evict.
    """
    return docs.select(
        F.col(id_col), F.md5(F.col(text_col)).alias("text_hash")
    ).dropDuplicates(["text_hash"])


def exact_dedup_stream_watermarked(
    docs: DataFrame,
    ts_col: str = "ts",
    delay: str = "1 hour",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Bounded-state streaming dedup for UNBOUNDED streams:
    ``dropDuplicatesWithinWatermark`` guarantees dedup of duplicates
    whose event times fall within ``delay`` of each other and lets the
    state store EVICT hashes once the watermark passes — a re-arrival
    beyond the horizon is emitted again (the correct trade: state
    stays O(distinct docs per horizon) instead of O(all history)).
    ``ts_col`` must be a timestamp column."""
    return (
        docs.withWatermark(ts_col, delay)
        .select(
            F.col(id_col), F.col(ts_col), F.md5(F.col(text_col)).alias("text_hash")
        )
        .dropDuplicatesWithinWatermark(["text_hash"])
    )
