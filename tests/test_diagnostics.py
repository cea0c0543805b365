"""diagnostics.key_skew_report — the join-key skew pre-flight."""

from pyspark.sql import functions as F

from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators.diagnostics import key_skew_report


def test_key_skew_report_values(spark):
    """Known distribution: key 'hot' 60 rows, 'warm' 30, 'cold' 10 —
    n=100, k=3, mean=33.33. Checks share/skew/salt arithmetic, the
    heaviest-first rank order, and the salt floor of 1 for sub-mean
    keys."""
    rows = (
        [("hot", i) for i in range(60)]
        + [("warm", i) for i in range(30)]
        + [("cold", i) for i in range(10)]
    )
    df = spark.createDataFrame(rows, "k string, v long")
    got = {r.key: r for r in key_skew_report(df, ["k"], top=10).collect()}
    assert [r.key for r in sorted(got.values(), key=lambda r: r.rank)] == [
        "hot", "warm", "cold"
    ]
    assert got["hot"].n_rows == 60 and got["hot"].share == 0.6
    assert got["hot"].skew_factor == 1.8  # 60 / (100/3)
    assert got["hot"].salt_factor == 2  # ceil(1.8)
    assert got["cold"].skew_factor == 0.3
    assert got["cold"].salt_factor == 1  # never below 1


def test_key_skew_report_top_bounds_and_composite_keys(spark):
    """`top` caps the report; composite keys join with the \\x01
    separator so ('a','bc') and ('ab','c') stay distinct keys."""
    rows = [("a", "bc", i) for i in range(5)] + [("ab", "c", i) for i in range(3)]
    df = spark.createDataFrame(rows, "k1 string, k2 string, v long")
    rep = key_skew_report(df, ["k1", "k2"], top=1).collect()
    assert len(rep) == 1
    assert rep[0].key == "a\x01bc" and rep[0].n_rows == 5
    both = key_skew_report(df, ["k1", "k2"], top=10).collect()
    assert {r.key for r in both} == {"a\x01bc", "ab\x01c"}


def test_key_skew_report_uniform_keys_need_no_salt(spark):
    """Uniform distribution: every key's skew factor is 1.0 and the
    suggested salt factor is 1 — the gate passes a balanced key."""
    rows = [(f"k{i % 4}", i) for i in range(40)]
    df = spark.createDataFrame(rows, "k string, v long")
    for r in key_skew_report(df, ["k"], top=10).collect():
        assert r.skew_factor == 1.0 and r.salt_factor == 1


def test_join_cardinality_report_exact(spark):
    """|A join B| priced from count tables must equal the join run for
    real; shares sum to <= 1 and the heaviest pair ranks first."""
    a = spark.createDataFrame(
        [("u1", i) for i in range(20)] + [("u2", i) for i in range(5)] + [("u3", 0)],
        "k string, v long",
    )
    b = spark.createDataFrame(
        [("u1", i) for i in range(10)] + [("u2", i) for i in range(8)] + [("u4", 0)],
        "k string, v long",
    )
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators.diagnostics import (
        join_cardinality_report,
    )

    rep = {r.key: r for r in join_cardinality_report(a, b, ["k"], top=10).collect()}
    assert set(rep) == {"u1", "u2"}  # u3/u4 have no partner
    assert rep["u1"].n_out == 200 and rep["u2"].n_out == 40
    assert rep["u1"].rank == 1
    total = a.join(b, "k").count()
    assert total == sum(r.n_out for r in rep.values()) == 240
    assert rep["u1"].out_share == round(200 / 240, 6)


def test_key_skew_report_null_components_stay_distinct(spark):
    """ADVICE r12: ('a', NULL), (NULL, 'a') and (NULL, NULL) must NOT
    alias — bare concat_ws skips NULLs with their separator. Each NULL
    component renders as the \\x00null sentinel, so arity and null
    positions stay encoded and the three groups report separately; a
    hot NULL key is still surfaced (it IS a shuffle group)."""
    rows = (
        [("a", None)] * 5 + [(None, "a")] * 3 + [(None, None)] * 2
        + [("a", "a")] * 1
    )
    df = spark.createDataFrame(rows, "k1 string, k2 string")
    rep = {r.key: r.n_rows for r in key_skew_report(df, ["k1", "k2"], top=10).collect()}
    assert rep == {
        "a\x01\x00null": 5,
        "\x00null\x01a": 3,
        "\x00null\x01\x00null": 2,
        "a\x01a": 1,
    }


def test_join_cardinality_report_null_keys_not_joinable(spark):
    """ADVICE r12: a real equi-join drops NULL keys, so the pricing
    must too — NULL-keyed rows contribute zero output and must not be
    priced as a mutually-joinable '' key. The report's total must
    still equal the real join's count when NULLs are present."""
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators.diagnostics import (
        join_cardinality_report,
    )

    a = spark.createDataFrame(
        [("u1", 1)] * 4 + [(None, 1)] * 7, "k string, v long"
    )
    b = spark.createDataFrame(
        [("u1", 1)] * 3 + [(None, 1)] * 9, "k string, v long"
    )
    rep = join_cardinality_report(a, b, ["k"], top=10).collect()
    assert {r.key for r in rep} == {"u1"}
    assert rep[0].n_out == 12 and rep[0].out_share == 1.0
    assert a.join(b, "k").count() == sum(r.n_out for r in rep)
    # composite: NULL in ANY key column disqualifies the row
    a2 = spark.createDataFrame(
        [("x", "y", 1)] * 2 + [("x", None, 1)] * 5, "k1 string, k2 string, v long"
    )
    rep2 = join_cardinality_report(a2, a2, ["k1", "k2"], top=10).collect()
    assert len(rep2) == 1 and rep2[0].n_out == 4
    assert a2.join(a2.select("k1", "k2"), ["k1", "k2"]).count() == 4


def test_key_skew_report_hot_key_at_scale(spark):
    """A 10^6-row frame where one key carries 99% of the rows: the
    report completes without concentrating the hot key's raw rows
    (the groupBy count partial-aggregates map-side — the combiner
    output is #distinct-keys rows) and the arithmetic is exact."""
    import math

    from pyspark.sql import functions as F

    df = spark.range(1_000_000).select(
        F.when(F.col("id") % 100 < 99, F.lit("hot"))
        .otherwise(F.concat(F.lit("k"), F.col("id")))
        .alias("k")
    )
    rep = key_skew_report(df, ["k"], top=1).collect()
    assert len(rep) == 1 and rep[0].key == "hot"
    n_hot, n, k = 990_000, 1_000_000, 10_001  # 'hot' + 10k singletons
    assert rep[0].n_rows == n_hot
    assert rep[0].share == round(n_hot / n, 6)
    assert rep[0].skew_factor == round(n_hot / (n / k), 6)
    assert rep[0].salt_factor == math.ceil(n_hot / (n / k))


def test_partition_plan_report_width_model(spark):
    """dq9: deterministic width model — 8 bytes per 64-bit column,
    measured string/binary lengths, element-summed arrays; NULLs price
    as 0; n_partitions = max(ceil(total/target), min_partitions)."""
    import pytest

    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators.diagnostics import (
        partition_plan_report,
    )

    df = spark.createDataFrame(
        [
            (1, 2.5, "abcd", ["xy", "z"], [1.0, 2.0]),
            (2, None, None, None, None),
        ],
        "a bigint, b double, s string, ls array<string>, ld array<double>",
    )
    row = partition_plan_report(df, target_bytes=10).collect()[0]
    # row 1: 8+8 fixed + 4 (s) + 3 (ls chars) + 16 (ld 2*8) = 39
    # row 2: 8+8 fixed + 0 nulls                              = 16
    assert row.n_rows == 2
    assert row.est_total_bytes == 55
    assert row.est_row_bytes == 27.5
    assert row.n_partitions == 6  # ceil(55/10)
    assert row.target_bytes == 10
    # min_partitions floor + empty frame
    empty = spark.createDataFrame([], "a bigint")
    r0 = partition_plan_report(empty, target_bytes=100, min_partitions=3).collect()[0]
    assert r0.n_rows == 0 and r0.est_total_bytes == 0 and r0.n_partitions == 3
    # unsupported types refuse loudly instead of mis-pricing
    m = spark.createDataFrame([({"k": 1},)], "m map<string,int>")
    with pytest.raises(ValueError, match="unsupported type"):
        partition_plan_report(m)
    # ADVICE r13: DATE is 32-bit — 4 bytes, not 8 (timestamp stays 8)
    import datetime

    dd = spark.createDataFrame(
        [(datetime.date(2020, 1, 1), datetime.datetime(2020, 1, 1))],
        "d date, ts timestamp",
    )
    rd = partition_plan_report(dd, target_bytes=100).collect()[0]
    assert rd.est_total_bytes == 12  # 4 (date) + 8 (timestamp)


def test_join_cardinality_report_empty_keys_rejected(spark):
    """ADVICE r13: an empty key list is a caller bug — refuse with a
    clear ValueError instead of an opaque TypeError from filter(None)
    (pre-r13 it silently priced a single '' key = a cross join)."""
    import pytest

    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators.diagnostics import (
        join_cardinality_report,
    )

    df = spark.createDataFrame([(1,)], "a bigint")
    with pytest.raises(ValueError, match="key_cols"):
        join_cardinality_report(df, df, [])


def test_equiwidth_histogram_exact_and_edges(spark):
    """Bin arithmetic: [0, 16) over 16 bins = one value per bin; the
    max value lands in the LAST bin (hi = max, closed); a constant
    column collapses into one full bin; NULLs are excluded."""
    from pyspark.sql import functions as F

    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators.diagnostics import (
        equiwidth_histogram,
    )

    df = spark.createDataFrame(
        [(float(i),) for i in range(17)] + [(None,)], "v double"
    )
    rows = {r.bin: r for r in equiwidth_histogram(df, "v", bins=16).collect()}
    assert set(rows) == set(range(16))
    # width = 1.0: bin i holds exactly v = i ...
    assert all(rows[i].n_rows == 1 for i in range(15))
    # ... except the last, which also CLOSES on the max (v=15 and v=16)
    assert rows[15].n_rows == 2
    assert rows[15].hi == 16.0 and rows[0].lo == 0.0
    assert sum(r.n_rows for r in rows.values()) == 17  # NULL excluded
    const = spark.createDataFrame([(3.5,)] * 5, "v double")
    crows = equiwidth_histogram(const, "v", bins=16).collect()
    assert len(crows) == 1 and crows[0].bin == 0 and crows[0].n_rows == 5
