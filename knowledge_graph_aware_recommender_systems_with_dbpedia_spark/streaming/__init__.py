from .events import (
    hourly_rollup,
    materialized_hourly_rollup,
    purchases_within_signup_window,
    read_events_stream,
    read_materialized,
    run_to_memory,
    sessionize,
    sliding_rollup,
    upsert_batch,
    with_event_time,
)
from .dedup import (
    decontaminate_stream,
    exact_dedup_stream,
    incremental_dedup_stream,
    exact_dedup_stream_watermarked,
    ingest_pipeline_stream,
    read_docs_stream,
)
from .vectors import ann_ingest_stream
from .media import (
    image_stats_stream,
    media_features_stream,
    media_kind_rollup,
    read_media_stream,
)
from .stateful import sessionize_stateful
from .quality import (
    corpus_metrics,
    quality_gate_stream,
    windowed_quality_stream,
)
from .curation import curation_pipeline_stream, run_curation_drain

__all__ = [
    "corpus_metrics",
    "quality_gate_stream",
    "windowed_quality_stream",
    "curation_pipeline_stream",
    "run_curation_drain",
    "decontaminate_stream",
    "exact_dedup_stream",
    "incremental_dedup_stream",
    "exact_dedup_stream_watermarked",
    "ingest_pipeline_stream",
    "read_docs_stream",
    "hourly_rollup",
    "image_stats_stream",
    "media_features_stream",
    "media_kind_rollup",
    "read_media_stream",
    "purchases_within_signup_window",
    "read_events_stream",
    "run_to_memory",
    "sessionize",
    "sessionize_stateful",
    "sliding_rollup",
    "with_event_time",
    "ann_ingest_stream",
]
