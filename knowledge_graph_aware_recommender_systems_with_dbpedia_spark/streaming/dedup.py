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
