"""Invariants for the event-analytics queries (funnel, retention,
percentiles) beyond the DuckDB hash oracle: structural properties that
must hold on ANY events table, checked at sf0.001.
"""

from pyspark.sql import functions as F

from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.plans.driver_queries import (
    a15_value_percentiles,
    ev10_funnel,
    ev11_retention,
)
from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_funnel_stages_monotone_nonincreasing(spark):
    rows = {r["stage"]: r["n_users"] for r in ev10_funnel(spark, SF).collect()}
    assert set(rows) == {"1_view", "2_click", "3_purchase"}
    assert rows["1_view"] >= rows["2_click"] >= rows["3_purchase"]
    n_users = (
        load_table(spark, SF, "events").select("user_id").distinct().count()
    )
    assert rows["1_view"] <= n_users


def test_retention_offset_zero_counts_every_user_once(spark):
    ret = ev11_retention(spark, SF)
    # every user is active on their own cohort day, so summing the
    # offset-0 row over all cohorts must equal the distinct user count
    day0 = (
        ret.filter(F.col("day_offset") == 0)
        .agg(F.sum("n_users").alias("n"))
        .collect()[0]["n"]
    )
    n_users = (
        load_table(spark, SF, "events").select("user_id").distinct().count()
    )
    assert day0 == n_users
    assert ret.filter(F.col("day_offset") < 0).count() == 0


def test_percentiles_ordered_and_bounded(spark):
    e = load_table(spark, SF, "events")
    lo, hi = e.agg(F.min("value"), F.max("value")).collect()[0]
    for r in a15_value_percentiles(spark, SF).collect():
        assert r["p50"] <= r["p90"] <= r["p99"]
        # cents-floor can sit at most 1 cent under the true min
        assert lo - 0.01 <= r["p50"] and r["p99"] <= hi


def test_approx_count_distinct_sketch_parity(spark):
    """a16's documented 100 TB swap: approx_count_distinct (HLL++)
    must land within its rsd bound of the exact distinct count."""
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.sources.tables import load_table

    e = load_table(spark, "/root/testdata/sf0.01", "events").select(
        "event_type", "user_id"
    )
    exact = {
        r.event_type: r.n
        for r in e.groupBy("event_type").agg(F.countDistinct("user_id").alias("n")).collect()
    }
    approx = {
        r.event_type: r.n
        for r in e.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", rsd=0.02).alias("n"))
        .collect()
    }
    assert set(exact) == set(approx)
    for k, n in exact.items():
        assert abs(approx[k] - n) <= max(3, 0.06 * n)  # 3 x rsd margin
