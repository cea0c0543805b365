"""Regression tests for the schema-adaptive events loader.

Round-2 postmortem: the driver regenerated events.parquet with
ts: TIMESTAMP(MICROS) while the loader assumed TIMESTAMP(NANOS) read
as long via the static ``nanosAsLong`` conf — every events consumer
(a9, di3, ev1–ev6, st1–st4, the bench, test_plan_lint) died at
analysis time. These tests pin the loader to the ACTUAL file schema,
independent of any session conf or session timezone, so an upstream
testdata schema change can never silently crash a round again.
"""

import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampType

from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.sources.tables import load_table, shape_events

SF = "/root/testdata/sf0.001"
EVENTS = os.path.join(SF, "events.parquet")


def test_loader_matches_raw_parquet_values(spark):
    """ts_ns from load_table == pyarrow's raw stored values (epoch ns),
    through the exact code path the driver harness uses."""
    ev = load_table(spark, SF, "events")
    assert isinstance(ev.schema["ts_ns"].dataType, LongType)
    assert isinstance(ev.schema["ts"].dataType, TimestampType)
    got = {
        r.event_id: r.ts_ns
        for r in ev.select("event_id", "ts_ns").orderBy("event_id").limit(100).collect()
    }
    tbl = pq.read_table(EVENTS, columns=["event_id", "ts"])
    raw = dict(zip(tbl.column("event_id").to_pylist(), tbl.column("ts")))
    unit = {"us": 1_000, "ns": 1, "ms": 1_000_000, "s": 1_000_000_000}[
        tbl.schema.field("ts").type.unit
    ]
    for eid, ns in got.items():
        assert ns == raw[eid].value * unit


def test_loader_is_session_timezone_independent(spark):
    """Epoch derivation must not shift with spark.sql.session.timeZone
    (the to_utc_timestamp/cast trap for TIMESTAMP_NTZ inputs)."""
    def fingerprint():
        return (
            load_table(spark, SF, "events")
            .select("event_id", "ts_ns")
            .orderBy("event_id")
            .limit(200)
            .collect()
        )

    before = spark.conf.get("spark.sql.session.timeZone")
    base = fingerprint()
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        shifted = fingerprint()
    finally:
        spark.conf.set("spark.sql.session.timeZone", before)
    assert base == shifted


def test_loader_needs_no_session_confs(spark):
    """The loader must work under whatever conf state the driver's
    pre-built session has — assert we haven't (re)introduced a
    dependency on the static nanosAsLong conf."""
    assert (
        spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "false"
    ), "loader must not set the static nanosAsLong conf on a live session"
    ev = load_table(spark, SF, "events")
    assert ev.count() > 0


def test_shape_events_accepts_nanos_long(spark):
    """The legacy TIMESTAMP(NANOS)-as-long layout must still shape
    correctly if the driver ever regenerates testdata that way."""
    raw = spark.createDataFrame(
        [(1, 1_704_067_798_778_549_123, 7)], "event_id bigint, ts bigint, user_id bigint"
    )
    out = shape_events(raw)
    assert out.columns == ["event_id", "ts_ns", "user_id", "ts"]
    r = out.collect()[0]
    assert r.ts_ns == 1_704_067_798_778_549_123
    assert r.ts.microsecond == 778549


def test_shape_events_column_order_matches_historical(spark):
    ev = load_table(spark, SF, "events")
    assert ev.columns == ["event_id", "ts_ns", "user_id", "event_type", "value", "props", "ts"]


def test_all_sf_dirs_load(spark):
    for sf in ("sf0.001", "sf0.01"):
        d = f"/root/testdata/{sf}"
        if os.path.isdir(d):
            assert load_table(spark, d, "events").limit(1).count() == 1


def test_tpch_date_arithmetic_is_session_timezone_independent(spark):
    """The date-keyed TPC-H shapes (year() buckets, shipdate range
    filters) must not shift with spark.sql.session.timeZone. The
    parquet dates are written TZ-naive (isAdjustedToUTC=false), so
    Spark reads TIMESTAMP_NTZ and field extraction is pure — this test
    pins that invariant so a future testdata regeneration to
    TZ-adjusted timestamps (the r02 events.ts failure class) fails
    loudly here instead of silently shifting query results."""
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.plans.driver_queries import (
        q7_nation_volume,
        q15_top_supplier,
    )

    sf = "/root/testdata/sf0.001"
    before = spark.conf.get("spark.sql.session.timeZone")

    def run():
        a = {tuple(r) for r in q7_nation_volume(spark, sf).collect()}
        b = {tuple(r) for r in q15_top_supplier(spark, sf).collect()}
        return a, b

    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        utc = run()
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        ny = run()
        spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
        tokyo = run()
    finally:
        spark.conf.set("spark.sql.session.timeZone", before)
    assert utc == ny == tokyo
