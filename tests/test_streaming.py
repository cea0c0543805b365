import os
import time

import pytest
from pyspark.sql import functions as F

from knowledge_graph_aware_recommender_systems_with_dbpedia_spark import streaming as ST
from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.plans.driver_queries import (
    ev1_hourly_rollup,
    ev2_sessionize,
)

SF = "/root/testdata/sf0.001"
EVENTS = os.path.join(SF, "events.parquet")


def _latest_per_key(rows, key_fields, grow_field):
    out = {}
    for r in rows:
        k = tuple(getattr(r, f) for f in key_fields)
        if k not in out or getattr(r, grow_field) > getattr(out[k], grow_field):
            out[k] = r
    return out


def test_stream_hourly_rollup_matches_batch(spark, tmp_path):
    stream = ST.read_events_stream(spark, EVENTS)
    got = ST.run_to_memory(
        ST.hourly_rollup(stream), "t_hourly", "update", str(tmp_path)
    ).collect()
    latest = _latest_per_key(got, ("hour_idx", "event_type"), "n")
    exp = {
        (r.hour_idx, r.event_type): r for r in ev1_hourly_rollup(spark, SF).collect()
    }
    assert set(latest) == set(exp)
    for k, r in latest.items():
        assert r.n == exp[k].n
        assert r.sum_value == pytest.approx(exp[k].sum_value, abs=1e-4)


def test_stream_sessionize_matches_batch(spark, tmp_path):
    stream = ST.read_events_stream(spark, EVENTS)
    # session_window aggs reject update mode; complete re-emits all
    got = ST.run_to_memory(
        ST.sessionize(stream), "t_sess", "complete", str(tmp_path)
    ).collect()
    latest = _latest_per_key(got, ("user_id", "start_s"), "n_events")
    batch = ev2_sessionize(spark, SF).collect()
    exp = {(r.user_id, r.start_s): r for r in batch}
    assert set(latest) == set(exp)
    for k, r in latest.items():
        assert (r.end_s, r.n_events) == (exp[k].end_s, exp[k].n_events)


def test_stateful_sessionizer_matches_native(spark, tmp_path):
    stream = ST.read_events_stream(spark, EVENTS)
    got = ST.run_to_memory(
        ST.sessionize_stateful(stream, gap_s=1800), "t_state", "update", str(tmp_path)
    ).collect()
    latest = _latest_per_key(got, ("user_id", "start_s"), "n_events")
    exp = {(r.user_id, r.start_s): r for r in ev2_sessionize(spark, SF).collect()}
    assert set(latest) == set(exp)
    for k, r in latest.items():
        assert (r.end_s, r.n_events) == (exp[k].end_s, exp[k].n_events)


def test_stateful_incremental_two_batches(spark, tmp_path):
    # split events at the median timestamp into two files fed one per
    # trigger — sessions spanning the cut must merge via state
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.sources.tables import shape_events

    ev = shape_events(spark.read.parquet(EVENTS))
    cut = ev.approxQuantile("ts_ns", [0.5], 0.0)[0]
    feed = tmp_path / "feed"
    ev.filter(F.col("ts_ns") <= cut).coalesce(1).write.parquet(str(feed / "p1"))
    time.sleep(1.1)  # file source orders by modification time
    ev.filter(F.col("ts_ns") > cut).coalesce(1).write.parquet(str(feed / "p2"))

    stream = ST.read_events_stream(
        spark, str(feed / "p*" / "*.parquet"), max_files_per_trigger=1
    )
    got = ST.run_to_memory(
        ST.sessionize_stateful(stream, gap_s=1800), "t_inc", "update", str(tmp_path)
    ).collect()
    latest = _latest_per_key(got, ("user_id", "start_s"), "n_events")
    exp = {(r.user_id, r.start_s): r for r in ev2_sessionize(spark, SF).collect()}
    assert set(latest) == set(exp)
    for k, r in latest.items():
        assert (r.end_s, r.n_events) == (exp[k].end_s, exp[k].n_events)


def test_stateful_session_fn_sorts_across_arrow_chunks():
    """A group's micro-batch can arrive as MULTIPLE Arrow chunks; an
    out-of-order timestamp in a later chunk must not rewind end_us or
    split the session (the per-chunk-sort bug)."""
    import pandas as pd

    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.streaming.stateful import _session_fn

    class FakeState:
        exists = False

        def __init__(self):
            self.value = None

        def update(self, v):
            self.value = v

    gap_s = 10
    fn = _session_fn(gap_s)
    s = 1_000_000  # 1s in us
    # chunk 2 holds an EARLIER timestamp than chunk 1's max; globally
    # sorted all four are one session (max gap 5s < 10s)
    chunks = iter(
        [
            pd.DataFrame({"tus": [20 * s, 25 * s]}),
            pd.DataFrame({"tus": [15 * s, 30 * s]}),
        ]
    )
    state = FakeState()
    out = pd.concat(list(fn((7,), chunks, state)))
    # exactly one (open) session: 15s..30s with 4 events
    assert len(out) == 1
    assert tuple(out.iloc[0]) == (7, 15, 30, 4)
    assert state.value == (15 * s, 30 * s, 4)


def test_sliding_rollup_window_multiplicity(spark, tmp_path):
    stream = ST.read_events_stream(spark, EVENTS)
    got = ST.run_to_memory(
        ST.sliding_rollup(stream, "1 hour", "15 minutes"), "t_slide", "update", str(tmp_path)
    ).collect()
    latest = _latest_per_key(got, ("start_s", "end_s", "event_type"), "n")
    total_events = spark.read.parquet(EVENTS).count()
    # 1h/15min: every event falls in exactly 4 sliding windows
    assert sum(r.n for r in latest.values()) == 4 * total_events
    for r in latest.values():
        assert r.end_s - r.start_s == 3600


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    stream = ST.read_events_stream(spark, EVENTS)
    got = ST.run_to_memory(
        ST.purchases_within_signup_window(stream), "t_ssj", "append", str(tmp_path)
    )
    got_rows = {(r.user_id, r.signup_id, r.purchase_id) for r in got.collect()}

    # batch path: same function over the batch-loaded events table
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.sources.tables import load_table

    ev = load_table(spark, SF, "events")
    ev = ev.withColumn("ts", F.timestamp_micros(F.expr("ts_ns div 1000")))
    want_rows = {
        (r.user_id, r.signup_id, r.purchase_id)
        for r in ST.purchases_within_signup_window(ev).collect()
    }
    assert got_rows == want_rows and len(got_rows) > 0


@pytest.mark.slow
def test_checkpoint_recovery_exactly_once(spark, tmp_path):
    # two files fed one per trigger; the query is STOPPED after batch 1
    # and restarted from the SAME checkpoint — recovery must process
    # only the remaining file (no dups, no loss)
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.sources.tables import shape_events

    ev = shape_events(spark.read.parquet(EVENTS))
    cut = ev.approxQuantile("ts_ns", [0.5], 0.0)[0]
    feed = tmp_path / "feed"
    ev.filter(F.col("ts_ns") <= cut).coalesce(1).write.parquet(str(feed / "p1"))
    time.sleep(1.1)
    ev.filter(F.col("ts_ns") > cut).coalesce(1).write.parquet(str(feed / "p2"))
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "sink")

    # memory sink is not fault-tolerant; foreachBatch + parquet is the
    # recoverable production pattern (idempotent upsert per batch id)
    def sink(df, batch_id):
        df.withColumn("_b", F.lit(batch_id)).write.mode("append").parquet(out_dir)

    def start():
        stream = ST.read_events_stream(
            spark, str(feed / "p*" / "*.parquet"), max_files_per_trigger=1
        )
        return (
            ST.hourly_rollup(stream)
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="200 milliseconds")
            .start()
        )

    q = start()
    while not q.recentProgress:  # wait for the first batch to commit
        time.sleep(0.2)
    q.stop()
    q.awaitTermination()

    q2 = start()  # same checkpoint -> resumes where batch 1 left off
    while q2.isActive and (
        not q2.recentProgress
        or any(p["numInputRows"] > 0 for p in q2.recentProgress[-2:])
    ):
        time.sleep(0.3)
    q2.stop()
    q2.awaitTermination()

    both = spark.read.parquet(out_dir).collect()
    latest = _latest_per_key(both, ("hour_idx", "event_type"), "n")
    exp = {
        (r.hour_idx, r.event_type): r for r in ev1_hourly_rollup(spark, SF).collect()
    }
    assert set(latest) == set(exp)
    for k, r in latest.items():
        assert r.n == exp[k].n


def test_stream_media_features_match_batch(spark, tmp_path):
    """The batch multimodal operators run unchanged over a readStream:
    stateless mapInPandas stages compose with file-source streams in
    append mode, and the streamed result equals the batch result."""
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators import multimodal as MM

    media = MM.synth_media(spark, n=48)
    media_dir = str(tmp_path / "media")
    media.write.parquet(media_dir)

    stream = ST.read_media_stream(spark, media_dir, max_files_per_trigger=1)
    streamed = ST.run_to_memory(
        ST.media_features_stream(stream, dim=8), "media_feat_s", "append"
    )
    batch = MM.media_features(media, dim=8)
    assert sorted(map(tuple, streamed.collect())) == sorted(map(tuple, batch.collect()))


def test_stream_image_stats_match_batch(spark, tmp_path):
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators import multimodal as MM

    media = MM.synth_media(spark, n=48)
    media_dir = str(tmp_path / "media")
    media.write.parquet(media_dir)

    stream = ST.read_media_stream(spark, media_dir)
    streamed = ST.run_to_memory(
        ST.image_stats_stream(stream), "media_img_s", "append"
    )
    batch = MM.decode_image(media)
    assert sorted(map(tuple, streamed.collect())) == sorted(map(tuple, batch.collect()))
    assert streamed.count() > 0  # the image third of the fixture


def test_stream_media_kind_rollup_complete_mode(spark, tmp_path):
    """Running per-kind ingest rollup (no event time -> complete mode);
    final emission equals the batch aggregate."""
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators import multimodal as MM

    media = MM.synth_media(spark, n=48)
    media_dir = str(tmp_path / "media")
    media.write.parquet(media_dir)

    stream = ST.read_media_stream(spark, media_dir)
    streamed = ST.run_to_memory(
        ST.media_kind_rollup(stream), "media_roll_s", "complete"
    )
    batch = ST.media_kind_rollup(media)
    assert sorted(map(tuple, streamed.collect())) == sorted(map(tuple, batch.collect()))


def test_stream_exact_dedup_matches_batch_keepers(spark, tmp_path):
    """State-store dedup at ingest: on an id-ordered replay the
    first-arrival keeper set equals the batch min-id keeper set, and
    state never sees the text (md5 key only)."""
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators import dedup as DD

    rows = [(i, f"text {i % 7}") for i in range(30)]  # 7 dup classes
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    docs_dir = str(tmp_path / "docs")
    # one file in id order => deterministic first-arrival == min id
    docs.coalesce(1).sortWithinPartitions("doc_id").write.parquet(docs_dir)

    stream = ST.read_docs_stream(spark, docs_dir)
    streamed = ST.run_to_memory(
        ST.exact_dedup_stream(stream), "dedup_s", "append"
    )
    batch_keep = {r.keep_id for r in DD.exact_dedup(docs).collect()}
    got = {r.doc_id for r in streamed.collect()}
    assert got == batch_keep == set(range(7))
    assert streamed.columns == ["doc_id", "text_hash"]


def test_stream_ingest_pipeline_matches_batch(spark, tmp_path):
    """Clean-at-ingest stream (state-store dedup -> foreachBatch
    decontaminate + scrub -> parquet append) equals the batch
    composition of the same stages on an ordered replay."""
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.functions.text import scrub_pii
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators import dedup as DD

    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),   # exact dup of 1
        (3, "totally unrelated words about columnar engines here"),
        (4, "the quick brown fox jumps over the lazy dog also"),  # contaminated
        (5, "email me at someone@example.com for details ok"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    bench = spark.createDataFrame(
        [(100, "quick brown fox jumps over")], "doc_id bigint, text string"
    )
    docs_dir = str(tmp_path / "in")
    docs.coalesce(1).sortWithinPartitions("doc_id").write.parquet(docs_dir)
    out_dir = str(tmp_path / "out")

    q = ST.ingest_pipeline_stream(
        ST.read_docs_stream(spark, docs_dir), bench, out_dir,
        str(tmp_path / "ckpt"), min_overlap=2,
    )
    q.awaitTermination()
    got = {(r.doc_id, r.text) for r in spark.read.parquet(out_dir).collect()}

    kept = docs.join(
        DD.exact_dedup(docs).selectExpr("keep_id AS doc_id"), "doc_id", "left_semi"
    )
    batch = DD.decontaminate(kept, bench, min_overlap=2).select(
        "doc_id", scrub_pii(F.col("text")).alias("text")
    )
    expect = {(r.doc_id, r.text) for r in batch.collect()}
    assert got == expect
    assert {d for d, _ in got} == {3, 5}          # 1/4 contaminated, 2 dup
    assert any("<EMAIL>" in t for _, t in got)    # scrub applied


def test_stream_decontaminate_matches_batch(spark, tmp_path):
    """Incremental decontamination (one file per micro-batch, persisted
    benchmark shingles) emits exactly the batch decontaminate survivor
    set — contamination is stateless per doc, so batching must not
    change the result."""
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators import dedup as DD

    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "totally unrelated words about columnar engines here"),
        (3, "the quick brown fox jumps over the fence today"),   # contaminated
        (4, "sparse matrices and shuffle partitions for breakfast"),
        (5, "another clean document with its own unique phrasing"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    bench = spark.createDataFrame(
        [(100, "quick brown fox jumps over")], "doc_id bigint, text string"
    )
    in_dir = str(tmp_path / "in")
    # 3 files -> 3 micro-batches under maxFilesPerTrigger=1
    docs.repartition(3).write.parquet(in_dir)
    out_dir = str(tmp_path / "out")

    q = ST.decontaminate_stream(
        ST.read_docs_stream(spark, in_dir, max_files_per_trigger=1),
        bench, out_dir, str(tmp_path / "ckpt"), min_overlap=2,
    )
    q.awaitTermination()
    got = {r.doc_id for r in spark.read.parquet(out_dir).collect()}
    want = {r.doc_id for r in DD.decontaminate(docs, bench, min_overlap=2).collect()}
    assert got == want == {2, 4, 5}


def test_stream_incremental_dedup_matches_batch(spark, tmp_path):
    """Incremental corpus dedup at ingest (one file per micro-batch,
    once-persisted corpus band/shingle index) emits exactly the batch
    dedup_against_corpus survivor set — verdicts are per-doc vs the
    static corpus, so batching must not change the result."""
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators import dedup as DD

    base = "the quick brown fox jumps over the lazy dog and runs far away"
    corpus = spark.createDataFrame(
        [(100, base), (101, "completely different corpus text about engines")],
        "doc_id bigint, text string",
    )
    new = spark.createDataFrame(
        [
            (1, base),                                     # near-dup of 100
            (2, base.replace("quick", "rapid")),           # still near-dup
            (3, "fresh unseen content with its own words entirely"),
            (4, "another novel document nothing like the corpus"),
        ],
        "doc_id bigint, text string",
    )
    in_dir = str(tmp_path / "in")
    new.repartition(2).write.parquet(in_dir)
    out_dir = str(tmp_path / "out")

    q = ST.incremental_dedup_stream(
        ST.read_docs_stream(spark, in_dir, max_files_per_trigger=1),
        corpus, out_dir, str(tmp_path / "ckpt"),
        bands=8, n_hashes=16, verify_threshold=0.1,
    )
    q.awaitTermination()
    got = {r.doc_id for r in spark.read.parquet(out_dir).collect()}
    want = {
        r.doc_id
        for r in DD.dedup_against_corpus(
            new, corpus, bands=8, n_hashes=16, verify_threshold=0.1
        ).collect()
    }
    assert got == want == {3, 4}


def test_stream_watermarked_dedup_bounded_state(spark, tmp_path):
    """dropDuplicatesWithinWatermark: duplicates within the horizon
    are dropped; a re-arrival far past the watermark is emitted again
    (state evicted — the bounded-state trade for unbounded streams)."""
    import time as _time

    from datetime import datetime as _dt

    schema = "doc_id bigint, ts timestamp, text string"
    d = str(tmp_path / "wm_docs")
    batch1 = spark.createDataFrame(
        [(1, _dt(2024, 1, 1, 10, 0), "same text"),
         (2, _dt(2024, 1, 1, 10, 10), "same text"),     # within horizon -> dropped
         (3, _dt(2024, 1, 1, 10, 20), "other text")],
        schema,
    )
    batch1.coalesce(1).write.mode("append").parquet(d)
    # the watermark advances at batch END and eviction applies it at
    # the NEXT batch's start, so two advancer batches separate the
    # original events from the past-horizon re-arrival
    for i, rows in enumerate([
        [(9, _dt(2024, 1, 1, 13, 30), "advancer")],
        [(8, _dt(2024, 1, 1, 13, 45), "advancer2")],
        [(4, _dt(2024, 1, 1, 14, 0), "same text")],     # past horizon
    ]):
        _time.sleep(1.1)  # distinct mtime so the file source orders batches
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(d)

    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(d)
    out = ST.run_to_memory(
        ST.exact_dedup_stream_watermarked(stream, delay="1 hour"),
        "wm_dedup", "append",
    )
    ids = sorted(r.doc_id for r in out.collect())
    assert ids == [1, 3, 4, 8, 9]
    # 2 dropped (in-horizon duplicate); 4 re-emitted (state evicted)


def test_materialized_rollup_merge_on_read(spark, tmp_path):
    """Multi-batch MV maintenance: 3-file replay, append log +
    latest-wins reader == batch rollup; keys updated by several
    batches resolve to the LAST batch's cumulative row."""
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.sources.tables import load_table

    in_dir, out_dir, ck = (
        str(tmp_path / "in"),
        str(tmp_path / "mv"),
        str(tmp_path / "ck"),
    )
    ev = load_table(spark, SF, "events")
    ev.repartition(3).write.parquet(in_dir)
    q = ST.materialized_hourly_rollup(
        ST.read_events_stream(spark, in_dir, max_files_per_trigger=1),
        out_dir,
        ck,
    )
    q.awaitTermination()
    got = {
        (r.hour_idx, r.event_type): r
        for r in ST.read_materialized(
            spark, out_dir, ["hour_idx", "event_type"]
        ).collect()
    }
    exp = {
        (r.hour_idx, r.event_type): r for r in ev1_hourly_rollup(spark, SF).collect()
    }
    assert set(got) == set(exp)
    for k, r in got.items():
        assert r.n == exp[k].n
        assert r.sum_value == pytest.approx(exp[k].sum_value, abs=1e-4)
    # the log itself must contain superseded rows (proof this exercised
    # multi-batch updates, not a single-batch degenerate)
    log = spark.read.parquet(out_dir)
    assert log.count() > len(got)


def test_mv_upsert_replay_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: replaying the same batch id must
    OVERWRITE its partition, leaving the resolved view (and the raw
    log) unchanged — st10's exactly-once sink contract."""
    out = str(tmp_path / "mv")
    b0 = spark.createDataFrame(
        [(1, "click", 3, 1.5), (2, "view", 1, 0.5)],
        "hour_idx bigint, event_type string, n bigint, sum_value double",
    )
    b1 = spark.createDataFrame(
        [(1, "click", 5, 2.5)],
        "hour_idx bigint, event_type string, n bigint, sum_value double",
    )
    ST.upsert_batch(b0, out, 0)
    ST.upsert_batch(b1, out, 1)
    ST.upsert_batch(b1, out, 1)  # the retry
    log_rows = spark.read.parquet(out).count()
    assert log_rows == 3  # 2 + 1, NOT 2 + 2
    got = {
        (r.hour_idx, r.event_type): (r.n, r.sum_value)
        for r in ST.read_materialized(
            spark, out, ["hour_idx", "event_type"]
        ).collect()
    }
    assert got == {(1, "click"): (5, 2.5), (2, "view"): (1, 0.5)}


def test_mv_asof_time_travel(spark, tmp_path):
    """asof_batch reads the MV as of an earlier version: batch
    partitions double as a version log, partition-pruned at the scan."""
    out = str(tmp_path / "mv")
    schema = "hour_idx bigint, event_type string, n bigint, sum_value double"
    ST.upsert_batch(spark.createDataFrame([(1, "click", 3, 1.5)], schema), out, 0)
    ST.upsert_batch(spark.createDataFrame([(1, "click", 5, 2.5), (2, "view", 1, 0.5)], schema), out, 1)
    keys = ["hour_idx", "event_type"]
    v0 = {(r.hour_idx, r.event_type): r.n for r in ST.read_materialized(spark, out, keys, asof_batch=0).collect()}
    v1 = {(r.hour_idx, r.event_type): r.n for r in ST.read_materialized(spark, out, keys, asof_batch=1).collect()}
    latest = {(r.hour_idx, r.event_type): r.n for r in ST.read_materialized(spark, out, keys).collect()}
    assert v0 == {(1, "click"): 3}
    assert v1 == {(1, "click"): 5, (2, "view"): 1} == latest
    # the as-of scan must be partition-pruned (reads batch<=0 only):
    # assert on the scan's PartitionFilters line, not mere mention of
    # the column (which any plan over this schema contains)
    import contextlib
    import io
    import re

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        ST.read_materialized(spark, out, keys, asof_batch=0).explain("formatted")
    pf = [ln for ln in buf.getvalue().splitlines() if "PartitionFilters" in ln]
    assert pf, "formatted plan has no PartitionFilters line"
    assert re.search(r"batch#\d+\s*<=\s*0", pf[0]), pf[0]


def test_mv_drift_matches_batch_diff(spark, tmp_path):
    """st12's contract: the drift report between two incrementally
    maintained MVs equals the batch diff of the two rollups, however
    ingest was batched."""
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators.reconcile import snapshot_diff
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.sources.tables import load_table

    ev = load_table(spark, SF, "events")
    cutoff_ns = (473712 * 3600 + 1800) * 1_000_000_000  # mid-hour cut
    keys = ["hour_idx", "event_type"]
    mvs = {}
    for tag, frame, n_files in (
        ("old", ev.filter(F.col("ts_ns") < cutoff_ns), 2),
        ("new", ev, 3),
    ):
        in_dir, mv_dir, ck = (
            str(tmp_path / f"in_{tag}"),
            str(tmp_path / f"mv_{tag}"),
            str(tmp_path / f"ck_{tag}"),
        )
        frame.repartition(n_files).write.parquet(in_dir)
        ST.materialized_hourly_rollup(
            ST.read_events_stream(spark, in_dir, max_files_per_trigger=1),
            mv_dir,
            ck,
        ).awaitTermination()
        mvs[tag] = ST.read_materialized(spark, mv_dir, keys)
    got = {
        r.status: (r.n_keys, r.n_moved)
        for r in snapshot_diff(mvs["old"], mvs["new"], keys, ["n"])
        .groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum(F.col("n_changed").cast("bigint")).alias("n_moved"),
        )
        .collect()
    }
    # batch truth: same diff over batch-computed rollups
    def rollup(frame):
        return frame.groupBy(
            F.expr("ts_ns div 3600000000000").cast("bigint").alias("hour_idx"),
            "event_type",
        ).agg(F.count(F.lit(1)).alias("n"))

    exp = {
        r.status: (r.n_keys, r.n_moved)
        for r in snapshot_diff(
            rollup(ev.filter(F.col("ts_ns") < cutoff_ns)),
            rollup(ev),
            keys,
            ["n"],
        )
        .groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum(F.col("n_changed").cast("bigint")).alias("n_moved"),
        )
        .collect()
    }
    assert got == exp
    assert "added" in got and got.get("removed") is None  # old is a prefix


def _mk_vectors(spark, lo, hi):
    import numpy as np

    rng = np.random.RandomState(17)
    mat = rng.randn(hi, 8).astype("float32")
    return spark.createDataFrame(
        [(i, [float(x) for x in mat[i]]) for i in range(lo, hi)],
        "vec_id long, embedding array<float>",
    )


@pytest.mark.slow
def test_ann_ingest_stream_matches_batch_index(spark, tmp_path):
    """st13's contract: streaming delta ingest (3 micro-batches) ==
    one-shot append_to_ivf_index == from-scratch same-centroid index
    over the union corpus; replayed batch ids don't double-ingest."""
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators import similarity as SIM

    base = _mk_vectors(spark, 0, 30)
    new = _mk_vectors(spark, 30, 60)
    queries = _mk_vectors(spark, 0, 3)

    def search(idx):
        return sorted(
            (r.query_id, r.neighbor_id, r.rank)
            for r in SIM.ivf_topk_from_index(spark, idx, queries, k=3, n_probe=4).collect()
        )

    # truth: one-shot append path (ss9, already oracle-verified)
    idx_a = str(tmp_path / "idx_a")
    SIM.build_ivf_index(base, idx_a, n_cells=4)
    SIM.append_to_ivf_index(spark, idx_a, new)
    want = search(idx_a)

    # streaming: 3-file replay through ann_ingest_stream
    idx_b = str(tmp_path / "idx_b")
    SIM.build_ivf_index(base, idx_b, n_cells=4)
    in_dir, ck = str(tmp_path / "in"), str(tmp_path / "ck")
    new.repartition(3).write.parquet(in_dir)
    stream = (
        spark.readStream.schema(new.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    ST.ann_ingest_stream(stream, idx_b, ck).awaitTermination()
    assert search(idx_b) == want

    # retry idempotence: re-ingesting batch id 0 must change nothing
    SIM.append_delta_to_ivf_index(spark, idx_b, new.limit(7), 0)
    SIM.append_delta_to_ivf_index(spark, idx_b, new.limit(7), 0)
    once = spark.read.parquet(idx_b + "/corpus_delta/batch=0").count()
    assert once == 7


@pytest.mark.slow
def test_curation_pipeline_batching_invariant_and_gated(spark, tmp_path):
    """st15's contract: the composed drain (quality gate -> corpus
    dedup -> ANN delta ingest) lands the SAME index content whether
    the new docs arrive as one micro-batch or three, every indexed doc
    passes the quality threshold, none is a corpus near-dup, and the
    quality-gate metric log folds to identical corpus totals."""
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.functions.text import quality_score
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators import dedup as DD
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators import similarity as SIM
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.sources.tables import load_table
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.streaming import curation as SC
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.streaming import dedup as STD

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    emb = load_table(spark, SF, "embeddings")
    new = docs.filter(F.col("doc_id") % 5 == 0)
    corpus = docs.filter(F.col("doc_id") % 5 != 0)

    results, metric_sums = {}, {}
    for tag, n_files in (("one", 1), ("three", 3)):
        idx = str(tmp_path / f"idx_{tag}") + "/ivf"
        in_dir = str(tmp_path / f"in_{tag}")
        ck = str(tmp_path / f"ck_{tag}")
        metrics = str(tmp_path / f"m_{tag}")
        SIM.build_ivf_index(emb.filter(F.col("vec_id") % 5 != 0), idx, n_cells=4)
        new.repartition(n_files).write.mode("overwrite").parquet(in_dir)
        SC.run_curation_drain(
            STD.read_docs_stream(spark, in_dir, max_files_per_trigger=1),
            corpus, idx, metrics, ck, emb, quality_threshold=0.5,
            compact_if_due=False,
        )
        results[tag] = {
            (r.id, r.cell)
            for r in spark.read.parquet(idx + "/corpus_delta")
            .select("id", "cell").collect()
        }
        log = spark.read.parquet(metrics)
        metric_sums[tag] = {
            (r.check): (r.g, r.t)
            for r in log.groupBy("check")
            .agg(F.sum("good").alias("g"), F.sum("total").alias("t"))
            .collect()
        }

    assert results["one"] == results["three"] and results["one"]
    assert metric_sums["one"] == metric_sums["three"]
    indexed_ids = {i for i, _ in results["one"]}
    # every indexed doc passed the quality threshold...
    passing = {
        r.doc_id
        for r in new.select("doc_id", quality_score(F.col("text")).alias("q"))
        .filter(F.col("q") >= 0.5).collect()
    }
    assert indexed_ids <= passing
    # ...and none is a verified near-dup of the corpus
    survivors = {
        r.doc_id
        for r in DD.dedup_against_corpus(
            new, corpus, bands=8, n_hashes=16, verify_threshold=0.1
        ).select("doc_id").collect()
    }
    assert indexed_ids <= survivors


def test_curation_batch_retry_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: re-running the SAME (batch,
    batch_id) through the composed curation body must leave the metric
    log and the index deltas unchanged (every write overwrites its
    batch-deterministic partition)."""
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators import similarity as SIM
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators.dedup import build_corpus_dedup_index
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators.expectations import Check
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.sources.tables import load_table
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.streaming import curation as SC

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    emb = load_table(spark, SF, "embeddings")
    new = docs.filter(F.col("doc_id") % 5 == 0)
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    idx = str(tmp_path / "idx") + "/ivf"
    metrics = str(tmp_path / "metrics")
    SIM.build_ivf_index(emb.filter(F.col("vec_id") % 5 != 0), idx, n_cells=4)
    state = build_corpus_dedup_index(corpus, 8, 16, 3, "doc_id", "text")
    checks = [Check("text_present", "completeness", "text", 1.0)]

    def snapshot():
        log = {
            tuple(r) for r in spark.read.parquet(metrics).collect()
        }
        deltas = {
            (r.id, r.cell, r.batch)
            for r in spark.read.parquet(idx + "/corpus_delta")
            .select("id", "cell", "batch").collect()
        }
        return log, deltas

    SC.curate_batch(new, 0, corpus, state, emb, idx, metrics, checks,
                    quality_threshold=0.5)
    first = snapshot()
    SC.curate_batch(new, 0, corpus, state, emb, idx, metrics, checks,
                    quality_threshold=0.5)  # the retry
    assert snapshot() == first
    assert first[1]  # deltas non-empty — the test exercises real rows


def test_curate_batch_metric_write_failure_fails_the_batch(
    spark, tmp_path, monkeypatch
):
    """The quality-gate metric write runs CONCURRENTLY with the
    dedup/index chain (r14 optimization), but its future is joined
    before foreachBatch returns — so a failed metric write must still
    fail the whole batch (the trigger never commits without its metric
    partition). A swallowed failure here would break the exactly-once
    metric-log contract silently."""
    import pytest

    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators import similarity as SIM
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators.dedup import build_corpus_dedup_index
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators.expectations import Check
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.sources.tables import load_table
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.streaming import curation as SC

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    emb = load_table(spark, SF, "embeddings")
    new = docs.filter(F.col("doc_id") % 5 == 0)
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    idx = str(tmp_path / "idx") + "/ivf"
    metrics = str(tmp_path / "metrics")
    SIM.build_ivf_index(emb.filter(F.col("vec_id") % 5 != 0), idx, n_cells=4)
    state = build_corpus_dedup_index(corpus, 8, 16, 3, "doc_id", "text")
    checks = [Check("text_present", "completeness", "text", 1.0)]

    def boom(*a, **k):
        raise RuntimeError("metric write lost")

    monkeypatch.setattr(SC, "write_batch_counts", boom)
    with pytest.raises(RuntimeError, match="metric write lost"):
        SC.curate_batch(new, 0, corpus, state, emb, idx, metrics, checks,
                        quality_threshold=0.5)


@pytest.mark.slow
def test_run_curation_drain_compacts_when_due_and_search_invariant(spark, tmp_path):
    """st16's contract: run_curation_drain with a tripped trigger must
    (a) fire compaction — delta log physically retired, rows folded
    into the cell-partitioned base; (b) leave search results IDENTICAL
    to an uncompacted twin drain of the same stream (compaction moves
    layout, never content); (c) leave no stranded persisted state
    (the r09 ADVICE leak)."""
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators import similarity as SIM
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.sources.tables import load_table
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.streaming import curation as SC
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.streaming import dedup as STD

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    emb = load_table(spark, SF, "embeddings")
    new = docs.filter(F.col("doc_id") % 5 == 0)
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    queries = emb.filter(F.col("vec_id") < 8)

    def drain(tag, **kw):
        idx = str(tmp_path / f"idx_{tag}") + "/ivf"
        in_dir = str(tmp_path / f"in_{tag}")
        SIM.build_ivf_index(emb.filter(F.col("vec_id") % 5 != 0), idx, n_cells=4)
        new.repartition(3).write.mode("overwrite").parquet(in_dir)
        fired = SC.run_curation_drain(
            STD.read_docs_stream(spark, in_dir, max_files_per_trigger=1),
            corpus, idx, str(tmp_path / f"m_{tag}"),
            str(tmp_path / f"ck_{tag}"), emb,
            quality_threshold=0.5, **kw,
        )
        return idx, fired

    n_persisted_before = len(spark.sparkContext._jsc.getPersistentRDDs())
    idx_raw, fired_raw = drain("raw", compact_if_due=False)
    idx_cmp, fired_cmp = drain("cmp", compact_if_due=True, delta_share_due=0.0)
    assert not fired_raw and fired_cmp
    assert os.path.exists(idx_raw + "/corpus_delta")
    assert not os.path.exists(idx_cmp + "/corpus_delta")

    def search(idx):
        return sorted(
            (r.query_id, r.neighbor_id, r.rank)
            for r in SIM.ivf_topk_from_index(
                spark, idx, queries, k=3, n_probe=4
            ).collect()
        )

    assert search(idx_cmp) == search(idx_raw)
    # staleness report on the compacted index: nothing due anymore
    rep = SIM.ivf_staleness_report(spark, idx_cmp, delta_share_due=0.0)
    assert rep.filter(F.col("n_delta") > 0).count() == 0
    # no stranded persisted dedup state after either drain (<=: the
    # ContextCleaner may reap OTHER tests' leftovers mid-test, so the
    # count can shrink; it must not grow — each drain used to strand
    # 2 state persists + 1 cands cache per micro-batch)
    assert len(spark.sparkContext._jsc.getPersistentRDDs()) <= n_persisted_before


@pytest.mark.slow
def test_compact_ivf_index_crash_recovery(spark, tmp_path):
    """compact_ivf_index's rename-aside swap (r09 ADVICE, medium):
    every crash window leaves a state recover_ivf_compaction rolls
    FORWARD from — never a missing corpus, never delta rows readable
    twice. Simulated by reproducing the exact on-disk states the three
    crash points leave behind."""
    import shutil

    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators import similarity as SIM
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.sources.tables import load_table

    emb = load_table(spark, SF, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)

    def build(tag):
        idx = str(tmp_path / f"idx_{tag}")
        SIM.build_ivf_index(emb.filter(F.col("vec_id") < 400), idx, n_cells=4)
        SIM.append_delta_to_ivf_index(
            spark, idx, emb.filter(F.col("vec_id") >= 400), 0
        )
        return idx

    def search(idx):
        return sorted(
            (r.query_id, r.neighbor_id, r.rank)
            for r in SIM.ivf_topk_from_index(
                spark, idx, queries, k=3, n_probe=4
            ).collect()
        )

    truth_idx = build("truth")
    SIM.compact_ivf_index(spark, truth_idx)
    want = search(truth_idx)

    # crash window A: staged corpus_new written, crash BEFORE any
    # rename — live index untouched, rerun discards the stale stage
    idx = build("a")
    base = spark.read.parquet(idx + "/corpus").select("id", "v", "cell")
    delta = spark.read.parquet(idx + "/corpus_delta").select("id", "v", "cell")
    base.unionByName(delta).write.mode("overwrite").partitionBy(
        "cell"
    ).parquet(idx + "/corpus_new")
    SIM.compact_ivf_index(spark, idx)
    assert search(idx) == want
    assert not os.path.exists(idx + "/corpus_delta")

    # crash window B: between the two renames — corpus gone,
    # corpus_old + committed corpus_new present; recovery rolls forward
    idx = build("b")
    base = spark.read.parquet(idx + "/corpus").select("id", "v", "cell")
    delta = spark.read.parquet(idx + "/corpus_delta").select("id", "v", "cell")
    base.unionByName(delta).write.mode("overwrite").partitionBy(
        "cell"
    ).parquet(idx + "/corpus_new")
    shutil.move(idx + "/corpus", idx + "/corpus_old")
    SIM.compact_ivf_index(spark, idx)  # recovers, then nothing to fold
    assert search(idx) == want
    assert not os.path.exists(idx + "/corpus_old")
    assert not os.path.exists(idx + "/corpus_delta")

    # crash window C: after the promote, before the cleanup deletes —
    # corpus is the new fold; recovery retires corpus_old AND the
    # already-folded delta (re-folding it would duplicate neighbors)
    idx = build("c")
    base = spark.read.parquet(idx + "/corpus").select("id", "v", "cell")
    delta = spark.read.parquet(idx + "/corpus_delta").select("id", "v", "cell")
    base.unionByName(delta).write.mode("overwrite").partitionBy(
        "cell"
    ).parquet(idx + "/corpus_new")
    shutil.move(idx + "/corpus", idx + "/corpus_old")
    shutil.move(idx + "/corpus_new", idx + "/corpus")
    SIM.compact_ivf_index(spark, idx)
    assert search(idx) == want
    rows = spark.read.parquet(idx + "/corpus")
    assert rows.count() == rows.select("id").distinct().count()  # no dupes
    assert not os.path.exists(idx + "/corpus_old")
    assert not os.path.exists(idx + "/corpus_delta")

    # crash window D (ADVICE r10, medium): between the two cleanup
    # rmtrees. The delta log is retired FIRST, so this crash leaves
    # (corpus folded, corpus_old marker, NO delta) — the recovery
    # branch retires the marker and a re-run re-folds nothing. (The
    # old cleanup order deleted corpus_old first; a crash then left
    # the folded corpus beside a live-looking delta with no marker,
    # and the re-run duplicated every delta row.)
    idx = build("d")
    base = spark.read.parquet(idx + "/corpus").select("id", "v", "cell")
    delta = spark.read.parquet(idx + "/corpus_delta").select("id", "v", "cell")
    base.unionByName(delta).write.mode("overwrite").partitionBy(
        "cell"
    ).parquet(idx + "/corpus_new")
    shutil.move(idx + "/corpus", idx + "/corpus_old")
    shutil.move(idx + "/corpus_new", idx + "/corpus")
    shutil.rmtree(idx + "/corpus_delta")  # first rmtree done, crash here
    SIM.compact_ivf_index(spark, idx)
    assert search(idx) == want
    rows = spark.read.parquet(idx + "/corpus")
    assert rows.count() == rows.select("id").distinct().count()  # no dupes
    assert not os.path.exists(idx + "/corpus_old")
    assert not os.path.exists(idx + "/corpus_delta")


@pytest.mark.slow
def test_intra_drain_new_vs_new_dedup_batching_invariant(spark, tmp_path):
    """VERDICT r10 item 1: near-dups arriving within ONE drain (same
    or different micro-batches, neither in the corpus) must not both
    survive. Feed = the %5 new docs, with the 'echo' docs
    (doc_id % 100 == 45) given the donor's text (donor = smallest
    quality-passing new doc), so every echo is an exact dup of the
    donor and the donor/echo pairs span micro-batches. Asserts:
    (a) 1-slice and 3-slice drains land the identical index — the
    batching-invariance contract now holds WITH new-new semantics;
    (b) the donor is indexed, every echo is dropped (keep-smallest-id);
    (c) a drain without intra_drain_dedup indexes the echoes — the
    new stage, not an upstream filter, is what drops them."""
    import time as _time

    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.functions.text import quality_score
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators import similarity as SIM
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.sources.tables import load_table
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.streaming import curation as SC

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    emb = load_table(spark, SF, "embeddings")
    new = docs.filter(F.col("doc_id") % 5 == 0)
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    donor_id = (
        new.filter(quality_score(F.col("text")) >= 0.68)
        .agg(F.min("doc_id"))
        .first()[0]
    )
    donor_text = docs.filter(F.col("doc_id") == donor_id).first().text
    feed = new.withColumn(
        "text",
        F.when(F.col("doc_id") % 100 == 45, F.lit(donor_text)).otherwise(
            F.col("text")
        ),
    )
    echo_ids = {
        r.doc_id
        for r in feed.filter(
            (F.col("doc_id") % 100 == 45) & (F.col("doc_id") != donor_id)
        ).collect()
    }
    assert len(echo_ids) >= 3  # the fixture must exercise the path
    hi = feed.agg(F.max("doc_id")).first()[0]

    def drain(tag, n_slices, dedup):
        idx = str(tmp_path / f"idx_{tag}") + "/ivf"
        in_dir = str(tmp_path / f"in_{tag}")
        SIM.build_ivf_index(emb.filter(F.col("vec_id") % 5 != 0), idx, n_cells=4)
        cuts = [0] + [hi * (j + 1) // n_slices + 1 for j in range(n_slices)]
        for j in range(n_slices):
            feed.filter(
                (F.col("doc_id") >= cuts[j]) & (F.col("doc_id") < cuts[j + 1])
            ).coalesce(1).write.parquet(f"{in_dir}/p{j}")
            if j < n_slices - 1:
                _time.sleep(1.1)  # file-source order = modification time
        stream = (
            spark.readStream.schema("doc_id bigint, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{in_dir}/p*/*.parquet")
        )
        SC.run_curation_drain(
            stream, corpus, idx, str(tmp_path / f"m_{tag}"),
            str(tmp_path / f"ck_{tag}"), emb, quality_threshold=0.68,
            compact_if_due=False, intra_drain_dedup=dedup,
        )
        return {
            (r.id, r.cell)
            for r in spark.read.parquet(idx + "/corpus_delta")
            .select("id", "cell").collect()
        }

    one = drain("one", 1, True)
    three = drain("three", 3, True)
    assert one == three and one  # split-invariant with new-new semantics
    indexed = {i for i, _ in three}
    assert donor_id in indexed  # keep-smallest-id keeps the donor
    assert not (echo_ids & indexed)  # every echo dropped
    # in the 3-slice feed the donor and the last echo are in different
    # micro-batches — the pair the corpus-only drain cannot see
    raw = drain("raw", 3, False)
    assert echo_ids & {i for i, _ in raw}  # without 2b the echoes land


@pytest.mark.slow
def test_compact_dedup_state_folds_and_recovers(spark, tmp_path):
    """Drain-state small-files control: per-batch state dirs fold into
    one batch=-1 base with the row multiset unchanged; every crash
    window of the rename-aside swap rolls forward; re-compacting a
    lone base is a no-op. (The cross-drain continuity test proves the
    fold preserves dedup SEMANTICS — drain 2 still drops an echo of a
    drain-1 survivor after drain 1's state was compacted.)"""
    import shutil

    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators import dedup as DD
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.sources.tables import load_table

    docs = load_table(spark, SF, "documents").select("doc_id", "text").limit(40)
    sd = str(tmp_path / "ds")

    def build():
        shutil.rmtree(sd, ignore_errors=True)
        for b, pred in ((0, F.col("doc_id") % 2 == 0), (1, F.col("doc_id") % 2 == 1)):
            DD.dedup_state_rows(docs.filter(pred)).write.parquet(
                f"{sd}/state/batch={b}"
            )
        return {
            tuple(r)
            for r in spark.read.parquet(sd + "/state").drop("batch").collect()
        }

    want = build()
    assert DD.compact_dedup_state(spark, sd)
    got = spark.read.parquet(sd + "/state")
    assert {r.batch for r in got.select("batch").distinct().collect()} == {-1}
    assert {tuple(r) for r in got.drop("batch").collect()} == want
    assert not DD.compact_dedup_state(spark, sd)  # lone base: no-op
    # bytes-sized fold output (guide §6): a KB-scale state folds into
    # ONE file, not one per input split (r15 — the fold used to re-emit
    # the per-batch fragmentation it exists to remove)
    base_files = [
        f
        for f in os.listdir(sd + "/state/batch=-1")
        if f.endswith(".parquet")
    ]
    assert len(base_files) == 1

    # crash A: staged, no rename yet — live untouched, stage discarded
    build()
    spark.read.parquet(sd + "/state").drop("batch").write.parquet(
        f"{sd}/state_new/batch=-1"
    )
    DD.recover_dedup_state_compaction(sd)
    assert not os.path.exists(sd + "/state_new")
    assert {
        tuple(r) for r in spark.read.parquet(sd + "/state").drop("batch").collect()
    } == want

    # crash B: between renames — committed fold promoted forward
    build()
    spark.read.parquet(sd + "/state").drop("batch").write.parquet(
        f"{sd}/state_new/batch=-1"
    )
    shutil.move(sd + "/state", sd + "/state_old")
    DD.recover_dedup_state_compaction(sd)
    assert not os.path.exists(sd + "/state_old")
    got = spark.read.parquet(sd + "/state")
    assert {tuple(r) for r in got.drop("batch").collect()} == want

    # crash C: after promote, marker left — retired
    build()
    spark.read.parquet(sd + "/state").drop("batch").write.parquet(
        f"{sd}/state_new/batch=-1"
    )
    shutil.move(sd + "/state", sd + "/state_old")
    shutil.move(sd + "/state_new", sd + "/state")
    DD.recover_dedup_state_compaction(sd)
    assert not os.path.exists(sd + "/state_old")
    assert {
        tuple(r) for r in spark.read.parquet(sd + "/state").drop("batch").collect()
    } == want


def test_maybe_compact_recovers_midswap_crash_in_process(spark, tmp_path):
    """ADVICE r12: if a prior fold died mid-swap WITHOUT killing the
    drain process (live dir moved aside, committed stage not yet
    promoted), the next maybe_compact_dedup_state call must roll the
    fold forward instead of returning False on the bare isdir() check
    — otherwise the batch's subsequent state read fails until a full
    drain restart. The trigger now runs recovery first."""
    import shutil

    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators import dedup as DD
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.sources.tables import load_table

    docs = load_table(spark, SF, "documents").select("doc_id", "text").limit(20)
    sd = str(tmp_path / "ds")
    DD.dedup_state_rows(docs).write.parquet(f"{sd}/state/batch=0")
    want = {
        tuple(r) for r in spark.read.parquet(sd + "/state").drop("batch").collect()
    }
    # stage a committed fold, then crash between the two renames:
    # live moved aside, state_new not yet promoted — live dir ABSENT
    spark.read.parquet(sd + "/state").drop("batch").write.parquet(
        f"{sd}/state_new/batch=-1"
    )
    shutil.move(sd + "/state", sd + "/state_old")
    assert not os.path.isdir(sd + "/state")
    # the trigger must recover the layout (promote the fold), then see
    # a lone base and report no further fold needed — NOT fail or skip
    assert DD.maybe_compact_dedup_state(spark, sd, max_state_dirs=8) is False
    assert os.path.isdir(sd + "/state")
    assert not os.path.exists(sd + "/state_old")
    got = spark.read.parquet(sd + "/state")
    assert {r.batch for r in got.select("batch").distinct().collect()} == {-1}
    assert {tuple(r) for r in got.drop("batch").collect()} == want


@pytest.mark.slow
def test_intra_drain_state_extends_across_successive_drains(spark, tmp_path):
    """Successive drains sharing a checkpoint: the corpus dedup state
    is rebuilt per drain from the STATIC corpus frame, so a doc
    ingested by drain 1 is invisible to drain 2's corpus check — but
    the intra-drain state accumulates under the checkpoint (batch ids
    continue across drains), so drain 2's near-dups of drain-1
    SURVIVORS are still dropped. Pins the cross-drain continuity that
    makes intra_drain_dedup=True the complete daily-crawl semantics."""
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.functions.text import quality_score
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators import similarity as SIM
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.sources.tables import load_table
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.streaming import curation as SC

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    emb = load_table(spark, SF, "embeddings")
    new = docs.filter(F.col("doc_id") % 5 == 0)
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    donor_id = (
        new.filter(quality_score(F.col("text")) >= 0.68)
        .agg(F.min("doc_id"))
        .first()[0]
    )
    donor_text = docs.filter(F.col("doc_id") == donor_id).first().text
    # the echo id must HAVE an embedding (else it would be absent from
    # the index whatever the dedup did, and the assertion would pass
    # vacuously): donor_id+1 is embedded at every SF and larger than
    # the donor, so the greedy smaller-id rule applies
    echo_id = donor_id + 1
    assert emb.filter(F.col("vec_id") == echo_id).count() == 1
    idx = str(tmp_path / "idx") + "/ivf"
    in_dir = str(tmp_path / "in")
    ck = str(tmp_path / "ck")
    SIM.build_ivf_index(emb.filter(F.col("vec_id") % 5 != 0), idx, n_cells=4)

    def drain(feed_df, subdir):
        feed_df.coalesce(1).write.parquet(f"{in_dir}/{subdir}")
        stream = (
            spark.readStream.schema("doc_id bigint, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{in_dir}/*/*.parquet")
        )
        SC.run_curation_drain(
            stream, corpus, idx, str(tmp_path / "m"), ck, emb,
            quality_threshold=0.68, compact_if_due=False,
            intra_drain_dedup=True,
        )

    drain(new, "d1")  # drain 1: the donor survives and is indexed
    indexed1 = {
        r.id for r in spark.read.parquet(idx + "/corpus_delta").select("id").collect()
    }
    assert donor_id in indexed1
    # drain 2: ONE new doc — an exact copy of the drain-1 donor under
    # a fresh id. The static corpus check cannot see the donor (it is
    # not in `corpus`), so only the accumulated drain state drops it.
    echo = spark.createDataFrame(
        [(int(echo_id), donor_text)], "doc_id bigint, text string"
    )
    drain(echo, "d2")
    indexed2 = {
        r.id for r in spark.read.parquet(idx + "/corpus_delta").select("id").collect()
    }
    assert echo_id not in indexed2  # dropped against drain-1's survivor
    assert indexed2 == indexed1  # drain 2 added nothing else either


@pytest.mark.slow
def test_mid_drain_state_compaction_folds_and_preserves_verdicts(spark, tmp_path):
    """VERDICT r11 item 1: a long-lived drain must not accumulate one
    state dir per micro-batch forever (every later batch lists and
    reads them all — O(B^2) over the drain). Drive curate_batch
    directly for 12 micro-batches with state_compact_dirs=3 and
    assert (a) the non-base dir count never exceeds threshold+1 —
    the fold fires IN-DRAIN, (b) the batch=-1 base appears after the
    first fold, and (c) the final indexed set is bit-identical to a
    no-fold twin (threshold=10^6) — folding changes the file layout,
    never a verdict."""
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators import similarity as SIM
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators.dedup import build_corpus_dedup_index
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators.expectations import Check
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.sources.tables import load_table

    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.streaming import curation as SC

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    emb = load_table(spark, SF, "embeddings")
    new = docs.filter(F.col("doc_id") % 5 == 0)
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    checks = [Check("text_present", "completeness", "text", 1.0)]
    hi = new.agg(F.max("doc_id")).first()[0]
    n_batches = 12
    cuts = [0] + [hi * (j + 1) // n_batches + 1 for j in range(n_batches)]

    def run(tag, threshold):
        idx = str(tmp_path / f"idx_{tag}") + "/ivf"
        sd = str(tmp_path / f"sd_{tag}")
        metrics = str(tmp_path / f"m_{tag}")
        SIM.build_ivf_index(emb.filter(F.col("vec_id") % 5 != 0), idx, n_cells=4)
        state = build_corpus_dedup_index(corpus, 8, 16, 3, "doc_id", "text")
        state = (state[0].persist(), state[1].persist())
        max_dirs_seen, base_seen_at = 0, None
        try:
            for b in range(n_batches):
                batch = new.filter(
                    (F.col("doc_id") >= cuts[b]) & (F.col("doc_id") < cuts[b + 1])
                )
                SC.curate_batch(
                    batch, b, corpus, state, emb, idx, metrics, checks,
                    quality_threshold=0.68, drain_state_dir=sd,
                    state_compact_dirs=threshold,
                )
                live = os.listdir(sd + "/state")
                non_base = [d for d in live if d.startswith("batch=") and d != "batch=-1"]
                max_dirs_seen = max(max_dirs_seen, len(non_base))
                if base_seen_at is None and "batch=-1" in live:
                    base_seen_at = b
        finally:
            state[0].unpersist()
            state[1].unpersist()
        indexed = {
            r.id for r in spark.read.parquet(idx + "/corpus_delta").select("id").collect()
        }
        return indexed, max_dirs_seen, base_seen_at

    folded, max_dirs, base_at = run("fold", 3)
    # fold fires at the start of batch 4 (4 dirs > 3), 8 — so the live
    # non-base count is capped at threshold+1 and the base exists from
    # batch 4 on; without the fold 12 dirs would accumulate
    assert max_dirs == 4
    assert base_at == 4
    plain, max_dirs_plain, base_at_plain = run("plain", 10**6)
    assert max_dirs_plain == n_batches and base_at_plain is None
    assert folded == plain and folded  # verdicts identical, non-trivial


@pytest.mark.slow
def test_greedy_drops_idempotent_under_fold_replay_duplication(spark, tmp_path):
    """The one at-least-once window mid-drain folding opens: a crashed
    attempt of batch N wrote state/batch=N, the replay's pre-read fold
    swept those rows into the batch=-1 base, and the replay rewrites
    batch=N — the doc's state rows now exist TWICE on the seen side.
    greedy_state_dedup_drops must return the same drop set as on the
    clean layout (the distinct-hardened seen side), or the doubled
    shingle counts would corrupt every Jaccard the doc participates
    in."""
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators import dedup as DD
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.sources.tables import load_table

    docs = load_table(spark, SF, "documents").select("doc_id", "text").limit(60)
    # three batches by doc_id thirds; plant an exact dup across batches
    ids = sorted(r.doc_id for r in docs.select("doc_id").collect())
    donor, echo = ids[0], ids[-1]
    donor_text = docs.filter(F.col("doc_id") == donor).first().text
    feed = docs.withColumn(
        "text",
        F.when(F.col("doc_id") == echo, F.lit(donor_text)).otherwise(F.col("text")),
    )
    slices = [
        feed.filter(F.col("doc_id") <= ids[19]),
        feed.filter((F.col("doc_id") > ids[19]) & (F.col("doc_id") <= ids[39])),
        feed.filter(F.col("doc_id") > ids[39]),
    ]

    def drops(sd):
        seen = spark.read.parquet(sd + "/state").filter(F.col("batch") <= 2)
        return {
            r.id for r in DD.greedy_state_dedup_drops(seen, 2, 0.5).collect()
        }

    # clean layout: dirs batch=0,1,2
    clean = str(tmp_path / "clean")
    for b, s in enumerate(slices):
        DD.dedup_state_rows(s).write.parquet(f"{clean}/state/batch={b}")
    want = drops(clean)
    assert echo in want  # the fixture exercises a real cross-batch drop

    # crash-window layout: batches 0,1,2 ALL folded into base (the
    # replayed batch 2's crashed attempt was swept in), then batch=2
    # rewritten by the replay — batch 2's rows exist twice
    dup = str(tmp_path / "dup")
    for b, s in enumerate(slices):
        DD.dedup_state_rows(s).write.parquet(f"{dup}/state/batch={b}")
    assert DD.compact_dedup_state(spark, dup)
    DD.dedup_state_rows(slices[2]).write.parquet(f"{dup}/state/batch=2")
    assert drops(dup) == want


@pytest.mark.slow
def test_drain_restart_continuity_with_mid_drain_folds(spark, tmp_path):
    """VERDICT r11 item 7 — the cross-drain continuity claim as ONE
    end-to-end pin: drain 1 runs 10 micro-batches with
    state_compact_dirs=3 (mid-drain folds fire at batches 4 and 8),
    the process 'crashes' between drains leaving a HALF-STAGED state
    fold (state_new written, swap not started), drain 2 starts on the
    same checkpoint — its recovery discards the stage — and an echo
    of a drain-1 SURVIVOR is still dropped: fold + crash + restart
    never forget a seen doc."""
    import shutil
    import time as _time

    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.functions.text import quality_score
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators import similarity as SIM
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.sources.tables import load_table
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.streaming import curation as SC

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    emb = load_table(spark, SF, "embeddings")
    new = docs.filter(F.col("doc_id") % 5 == 0)
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    donor_id = (
        new.filter(quality_score(F.col("text")) >= 0.68)
        .agg(F.min("doc_id"))
        .first()[0]
    )
    donor_text = docs.filter(F.col("doc_id") == donor_id).first().text
    echo_id = donor_id + 1
    assert emb.filter(F.col("vec_id") == echo_id).count() == 1
    idx = str(tmp_path / "idx") + "/ivf"
    in_dir = str(tmp_path / "in")
    ck = str(tmp_path / "ck")
    SIM.build_ivf_index(emb.filter(F.col("vec_id") % 5 != 0), idx, n_cells=4)

    def drain(subdir):
        stream = (
            spark.readStream.schema("doc_id bigint, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{in_dir}/*/*.parquet")
        )
        SC.run_curation_drain(
            stream, corpus, idx, str(tmp_path / "m"), ck, emb,
            quality_threshold=0.68, compact_if_due=False,
            intra_drain_dedup=True, state_compact_dirs=3,
        )

    # drain 1: 10 single-file micro-batches so the in-drain fold fires
    hi = new.agg(F.max("doc_id")).first()[0]
    cuts = [0] + [hi * (j + 1) // 10 + 1 for j in range(10)]
    for j in range(10):
        new.filter(
            (F.col("doc_id") >= cuts[j]) & (F.col("doc_id") < cuts[j + 1])
        ).coalesce(1).write.parquet(f"{in_dir}/d1_{j:02d}")
        if j < 9:
            _time.sleep(1.05)  # file-source order = modification time
    drain("d1")
    indexed1 = {
        r.id for r in spark.read.parquet(idx + "/corpus_delta").select("id").collect()
    }
    assert donor_id in indexed1
    sd = ck + "/drain_state"
    live = os.listdir(sd + "/state")
    assert live == ["batch=-1"]  # end-of-drain fold left a lone base
    # crash between drains: a state fold died after staging state_new
    spark.read.parquet(sd + "/state").drop("batch").write.parquet(
        f"{sd}/state_new/batch=-1"
    )
    assert os.path.exists(sd + "/state_new")
    shutil.rmtree(str(tmp_path / "m"), ignore_errors=True)
    # drain 2: one echo of the drain-1 donor under a fresh id — only
    # the recovered drain state can drop it (the static corpus never
    # contained the donor)
    spark.createDataFrame(
        [(int(echo_id), donor_text)], "doc_id bigint, text string"
    ).coalesce(1).write.parquet(f"{in_dir}/d2")
    drain("d2")
    assert not os.path.exists(sd + "/state_new")  # recovery ran
    indexed2 = {
        r.id for r in spark.read.parquet(idx + "/corpus_delta").select("id").collect()
    }
    assert echo_id not in indexed2
    assert indexed2 == indexed1


def test_curation_pipeline_stream_requires_corpus_state(spark, tmp_path):
    """ADVICE r10: the corpus_state=None path persisted two DataFrames
    and returned only the StreamingQuery — the caller had no handle to
    unpersist, stranding two persisted frames per invocation. The None
    path now fails loudly and points at run_curation_drain."""
    import pytest

    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.sources.tables import load_table
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.streaming import curation as SC

    docs = load_table(spark, SF, "documents").select("doc_id", "text").limit(5)
    with pytest.raises(ValueError, match="run_curation_drain"):
        SC.curation_pipeline_stream(
            docs, docs, str(tmp_path / "i"), str(tmp_path / "m"),
            str(tmp_path / "c"), docs, corpus_state=None,
        )


@pytest.mark.slow
def test_curation_drain_recovers_crashed_compaction(spark, tmp_path):
    """Crashed-compaction-mid-drain (VERDICT r09 item 2): a previous
    drain's compaction died between the two swap renames — NO corpus
    dir, a committed corpus_new, a corpus_old, and the folded delta
    still on disk. The next run_curation_drain must roll the swap
    forward on entry, ingest its own batch normally, and end with
    search results identical to a never-crashed twin."""
    import shutil

    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators import similarity as SIM
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.sources.tables import load_table
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.streaming import curation as SC
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.streaming import dedup as STD

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    emb = load_table(spark, SF, "embeddings")
    new = docs.filter(F.col("doc_id") % 5 == 0)
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    queries = emb.filter(F.col("vec_id") < 8)
    base_emb = emb.filter(F.col("vec_id") % 5 != 0)

    def drain(tag, idx):
        in_dir = str(tmp_path / f"in_{tag}")
        new.repartition(3).write.mode("overwrite").parquet(in_dir)
        return SC.run_curation_drain(
            STD.read_docs_stream(spark, in_dir, max_files_per_trigger=1),
            corpus, idx, str(tmp_path / f"m_{tag}"),
            str(tmp_path / f"ck_{tag}"), emb,
            quality_threshold=0.5, compact_if_due=True, delta_share_due=0.0,
        )

    def search(idx):
        return sorted(
            (r.query_id, r.neighbor_id, r.rank)
            for r in SIM.ivf_topk_from_index(
                spark, idx, queries, k=3, n_probe=4
            ).collect()
        )

    # twin A: clean lifecycle
    idx_clean = str(tmp_path / "idx_clean") + "/ivf"
    SIM.build_ivf_index(base_emb, idx_clean, n_cells=4)
    assert drain("clean", idx_clean)
    want = search(idx_clean)

    # twin B: same base index, seed a pre-drain delta, stage a fold,
    # crash mid-swap
    idx = str(tmp_path / "idx_crash") + "/ivf"
    SIM.build_ivf_index(base_emb, idx, n_cells=4)
    SIM.append_delta_to_ivf_index(
        spark, idx, emb.filter(F.col("vec_id") == 1), 999
    )
    base = spark.read.parquet(idx + "/corpus").select("id", "v", "cell")
    delta = spark.read.parquet(idx + "/corpus_delta").select("id", "v", "cell")
    base.unionByName(delta).write.mode("overwrite").partitionBy(
        "cell"
    ).parquet(idx + "/corpus_new")
    shutil.move(idx + "/corpus", idx + "/corpus_old")  # crash point
    assert not os.path.exists(idx + "/corpus")

    fired = drain("crash", idx)  # must recover on entry, then drain
    assert fired
    assert os.path.exists(idx + "/corpus")
    assert not os.path.exists(idx + "/corpus_old")
    assert not os.path.exists(idx + "/corpus_delta")
    # the rolled-forward fold only duplicated vec 1 (already in base;
    # probes dedup by neighbor id), so both twins must agree exactly
    assert search(idx) == want


def test_windowed_quality_late_data_semantics(spark, tmp_path):
    """st17's watermark contract, pinned batch by batch. Spark seals a
    window when its STATE IS EVICTED — the first batch whose starting
    watermark has passed window.end — not the instant the watermark
    crosses it: a late row arriving in the eviction batch itself still
    merges; a late row arriving AFTER eviction is dropped (it must be,
    or append mode would re-emit the window and break the immutable-
    partition contract). An unsealed window never emits. These are
    batching-dependent by design, which is why they live here and not
    in the oracle."""
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.streaming.quality import windowed_quality_stream

    def mk(rows, sub):
        df = spark.createDataFrame(
            [(i, "hello world text", m) for i, m in rows],
            "doc_id bigint, text string, m bigint",
        ).select(
            "doc_id",
            "text",
            F.timestamp_micros((F.col("m") * 60_000_000)).alias("ts"),
        )
        df.coalesce(1).write.parquet(str(tmp_path / "feed" / sub))

    # batch 0: minutes 10, 50, 150 -> watermark after = 120
    mk([(1, 10), (2, 50), (3, 150)], "p1")
    time.sleep(1.1)
    # batch 1 (wm 120): minute 130 is late but its window [120,180)
    # is still open (end 180 > 120) -> MERGES; [0,60) is evicted and
    # emitted this batch; 300 advances the clock -> wm after = 270
    mk([(4, 130), (5, 300)], "p2")
    time.sleep(1.1)
    # batch 2 (wm 270): minute 10's window [0,60) was evicted last
    # batch -> DROPPED; [120,180) evicted+emitted now; 420 advances
    # -> wm after = 390, sealing [300,360); [420,480) stays unsealed
    mk([(6, 10), (7, 420)], "p3")

    stream = (
        spark.readStream.schema("doc_id bigint, text string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "feed" / "p*" / "*.parquet"))
    )
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    q = (
        windowed_quality_stream(
            stream, "ts", "1 hour", "30 minutes", quality_threshold=0.0
        )
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.read.parquet(out).collect()
    got = {
        int(r.window_start.timestamp() // 60): (r.total, r.n_good)
        for r in rows
    }
    assert got == {0: (2, 2), 120: (2, 2), 300: (1, 1)}
    # exactly-once append: the dropped post-eviction row must NOT have
    # re-emitted window [0,60) — one parquet row per window, ever
    assert len(rows) == 3
