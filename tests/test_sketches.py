"""operators/sketches.py — Misra-Gries heavy hitters.

The operator's contract is EXACTNESS despite the sketch: the propose
phase may emit extra candidates (partition-local survivors) but can
never miss a global 1/k-heavy key (mergeable-summaries bound), and the
verify phase replaces estimates with exact counts. So the whole output
must equal a plain groupBy + HAVING under ANY partitioning — including
the adversarial one that spreads a heavy key thinly across partitions.
"""

import pytest
from pyspark.sql import functions as F

from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators.sketches import (
    heavy_hitters,
)


def _exact(df, key, k):
    total = df.count()
    return {
        (r[key], r["n"])
        for r in df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") * k >= total)
        .collect()
    }


@pytest.fixture(scope="module")
def zipf(spark):
    # Zipf-ish: key i appears ~N/i times -> a clear heavy head and a
    # long light tail, the distribution the operator exists for.
    rows = [(i,) for i in range(1, 60) for _ in range(600 // i)]
    return spark.createDataFrame(rows, "key bigint")


def test_matches_exact_groupby(zipf):
    got = {
        (r["key"], r["n"])
        for r in heavy_hitters(zipf, "key", k=20).collect()
    }
    assert got == _exact(zipf, "key", 20)
    assert got  # non-trivial: the head must be non-empty


@pytest.mark.slow
def test_partitioning_invariant(zipf):
    for parts in (1, 7, 32):
        got = {
            (r["key"], r["n"])
            for r in heavy_hitters(zipf.repartition(parts), "key", k=20).collect()
        }
        assert got == _exact(zipf, "key", 20), parts


def test_adversarial_spread_key_not_missed(spark):
    # one heavy key diluted evenly across every partition, drowned
    # locally by partition-exclusive noise keys: per-partition MG
    # still cannot evict it below the global bound when capacity >= k.
    heavy = [(0,)] * 400
    noise = [(1000 * p + j,) for p in range(8) for j in range(300)]
    df = spark.createDataFrame(heavy + noise, "key bigint").repartition(8)
    got = {r["key"] for r in heavy_hitters(df, "key", k=10).collect()}
    # key 0 holds 400/2800 = 1/7 > 1/10 of rows; every noise key is 1 row
    assert got == {0}


def test_n_total_column_is_exact(zipf):
    row = heavy_hitters(zipf, "key", k=20).limit(1).collect()[0]
    assert row["n_total"] == zipf.count()


def test_capacity_guard():
    with pytest.raises(AssertionError):
        heavy_hitters(None, "key", k=10, capacity=5)


def test_null_keys_form_a_group_like_sql(spark):
    # SQL GROUP BY treats NULL as one group; a frequent NULL key must
    # therefore survive the gate exactly like any other key (nulls used
    # to vanish: NaN keys corrupt the MG dict and a plain left_semi is
    # null-unsafe — ADVICE r07).
    rows = [(None,)] * 50 + [(7,)] * 40 + [(i,) for i in range(100, 160)]
    df = spark.createDataFrame(rows, "key bigint").repartition(8)
    got = {(r["key"], r["n"]) for r in heavy_hitters(df, "key", k=3).collect()}
    # 150 rows, 1/3 cutoff = 50: null (50) qualifies, 7 (40) does not
    assert got == {(None, 50)}


def test_rare_null_keys_not_emitted(spark):
    rows = [(None,)] * 2 + [(1,)] * 90 + [(i,) for i in range(10, 18)]
    df = spark.createDataFrame(rows, "key bigint").repartition(4)
    got = {r["key"] for r in heavy_hitters(df, "key", k=4).collect()}
    assert got == {1}
