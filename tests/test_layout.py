"""Physical-layout writer tests: partition pruning + row-group
statistics actually materialize (checked via parquet footers), and
compaction fixes the small-files problem without losing rows."""

import os

import pytest
from pyspark.sql import functions as F

from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.sources import layout as LY
from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_partitioned_sorted_layout_enables_skipping(spark, tmp_path):
    ev = load_table(spark, SF, "events").select("event_id", "ts_ns", "event_type")
    out = str(tmp_path / "ev_layout")
    LY.write_partitioned_sorted(
        ev, out, partition_by=["event_type"], sort_by=["ts_ns"], files_per_partition=4
    )
    # hive partition dirs exist -> directory-level pruning
    kinds = {r.event_type for r in ev.select("event_type").distinct().collect()}
    for k in kinds:
        assert os.path.isdir(os.path.join(out, f"event_type={k}"))

    # footer stats: per-file ts ranges must be dramatically tighter than
    # the global range (that tightness IS row-group skipping)
    stats = LY.parquet_file_stats(out, "ts_ns")
    assert len(stats) >= 4
    glob_lo = min(s[1] for s in stats)
    glob_hi = max(s[2] for s in stats)
    spread = sum(s[2] - s[1] for s in stats)
    n_parts = len(kinds)
    # unsorted random writes would give every file ~the full range:
    # spread ≈ n_files * global. Sorted-salted gives per-file ranges
    # that overlap only via the salt, bounded by files * global / files_per_partition-ish;
    # assert we at least beat the unsorted bound by 2x.
    assert spread < len(stats) * (glob_hi - glob_lo) / 2

    # round-trips: same rows, and a pruned read touches one partition
    back = spark.read.parquet(out)
    assert back.count() == ev.count()
    one = back.filter(F.col("event_type") == sorted(kinds)[0])
    assert one.count() == ev.filter(F.col("event_type") == sorted(kinds)[0]).count()


def test_partition_filter_prunes_at_scan(spark, tmp_path):
    ev = load_table(spark, SF, "events").select("event_id", "ts_ns", "event_type")
    out = str(tmp_path / "ev_prune")
    LY.write_partitioned_sorted(ev, out, ["event_type"], ["ts_ns"])
    import contextlib
    import io

    k = ev.select("event_type").distinct().orderBy("event_type").first().event_type
    pruned = spark.read.parquet(out).filter(F.col("event_type") == k)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        pruned.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "event_type" in plan.split("PartitionFilters")[1][:200]


def test_compact_parquet_merges_small_files(spark, tmp_path):
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    frag = str(tmp_path / "frag")
    docs.repartition(40).write.parquet(frag)  # the small-files problem
    n_in = len([f for f in os.listdir(frag) if f.endswith(".parquet")])
    assert n_in >= 30

    out = str(tmp_path / "compact")
    n_rows = docs.count()
    n_files = LY.compact_parquet(spark, frag, out, target_rows_per_file=n_rows // 2, sort_by=["doc_id"])
    got_files = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert len(got_files) == n_files <= 3
    assert spark.read.parquet(out).count() == n_rows
    # sort preserved within files -> tight doc_id footer ranges
    stats = LY.parquet_file_stats(out, "doc_id")
    spans = sorted((lo, hi) for _, lo, hi in stats)
    for (lo1, hi1), (lo2, _hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2  # disjoint id ranges across compacted files


def test_compact_parquet_target_bytes_sizes_by_width(spark, tmp_path):
    """VERDICT r13 item 6 — dq9 made load-bearing: with target_bytes=
    the file count comes from partition_plan_report's width model, so
    a WIDE-row frame lands more files than a NARROW-row frame at the
    SAME row count (the row-count heuristic would give both the same
    count). The planned math is exact: ceil(est_total / target)."""
    n = 200
    narrow = spark.range(n).select(F.col("id").alias("k"))          # 8 B/row
    wide = spark.range(n).select(
        F.col("id").alias("k"), F.lpad(F.lit("x"), 400, "y").alias("pad")
    )                                                                # 408 B/row
    np_, wp = str(tmp_path / "narrow"), str(tmp_path / "wide")
    narrow.write.parquet(np_)
    wide.write.parquet(wp)
    target = 4000
    n_narrow = LY.compact_parquet(
        spark, np_, str(tmp_path / "n_out"), target_bytes=target
    )
    n_wide = LY.compact_parquet(
        spark, wp, str(tmp_path / "w_out"), target_bytes=target
    )
    assert n_narrow == -(-(n * 8) // target)        # ceil(1600/4000)  = 1
    assert n_wide == -(-(n * 408) // target)        # ceil(81600/4000) = 21
    assert n_wide > n_narrow
    got = [f for f in os.listdir(str(tmp_path / "w_out")) if f.endswith(".parquet")]
    assert len(got) == n_wide
    assert spark.read.parquet(str(tmp_path / "w_out")).count() == n


def test_zorder_layout_skips_on_both_dims(spark, tmp_path):
    # 64x64 uniform grid over (x, y)
    grid = spark.range(4096).select(
        (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("long").alias("y")
    )
    z_out = str(tmp_path / "zorder")
    x_out = str(tmp_path / "xsort")
    LY.write_zordered(grid, z_out, ["x", "y"], n_files=16)
    # baseline: single-column sort layout (perfect on x, blind on y)
    grid.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(x_out)

    def mean_span(path, col):
        stats = [s for s in LY.parquet_file_stats(path, col) if s[1] is not None]
        return sum(hi - lo for _, lo, hi in stats) / len(stats)

    # x-sorted: each file spans ~the whole y range (~63); z-order must
    # cut the per-file y span sharply while keeping x spans bounded
    assert mean_span(x_out, "y") > 55
    assert mean_span(z_out, "y") < 35
    assert mean_span(z_out, "x") < 35
    assert spark.read.parquet(z_out).count() == 4096
    # no leaked helper column
    assert "_zkey" not in spark.read.parquet(z_out).columns
