"""Streaming multimodal ingestion — greenfield scale extension.

A 100 TB multimodal corpus usually ARRIVES as a stream (an object-store
drop folder, a Kafka firehose of media rows). Structured Streaming's
stream/batch unification means the batch operators in
``operators/multimodal.py`` run unchanged over a ``readStream``: the
Arrow-batched ``mapInPandas`` decode/feature stages are stateless
row-group transforms, so they compose with file-source streams in
append mode with no state store at all; only the rollups need
update/complete mode.

This module provides the stream source plus thin streaming wrappers;
the actual decode/feature logic is the SAME functions the batch path
uses (tested for stream==batch parity in tests/test_streaming.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import MEDIA_FIELDS


def read_media_stream(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream of media parquet (a directory of media rows
    shaped like ``multimodal.MEDIA_FIELDS``). ``max_files_per_trigger``
    throttles replay so tests exercise multi-batch incremental runs."""
    reader = spark.readStream.schema(MEDIA_FIELDS)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    if os.path.isfile(path):
        head, tail = os.path.split(path)
        path = os.path.join(head, "{%s}" % tail)
    return reader.parquet(path)


def image_stats_stream(media: DataFrame, impl: str = "fake") -> DataFrame:
    """Streaming image decode: identical plan to the batch
    ``decode_image`` (stateless mapInPandas -> append mode)."""
    from ..operators.multimodal import decode_image

    return decode_image(media, impl=impl)


def media_features_stream(media: DataFrame, dim: int = 16, impl: str = "fake") -> DataFrame:
    """Streaming feature extraction: identical plan to the batch
    ``media_features`` (stateless mapInPandas -> append mode)."""
    from ..operators.multimodal import media_features

    return media_features(media, dim=dim, impl=impl)


def media_kind_rollup(media: DataFrame) -> DataFrame:
    """Running per-kind ingest stats (row count, total payload bytes,
    mean meta width). Media rows carry no event time, so this is a
    global running aggregate — complete/update output mode; at real
    scale you'd attach the ingest timestamp and window it instead."""
    return media.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.length("payload")).cast("bigint").alias("payload_bytes"),
        F.round(F.avg(F.col("meta.width")), 4).alias("avg_width"),
    )
