"""ALS recommender contract + ranking-quality floor.

ALS is stochastic across solver block orders, so (like node2vec/KGE)
there is no value-hash oracle — these tests pin the plugin contract
and that the factorization actually learns obvious structure.
"""

import pytest
from pyspark.sql import functions as F

from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators.als import (
    ALSRecommender,
)


@pytest.fixture(scope="module")
def block_ratings(spark):
    # two disjoint taste blocks: users 0-9 love items 0-9, users 10-19
    # love items 10-19 (one held-out item per user)
    rows = []
    for u in range(20):
        lo = 0 if u < 10 else 10
        for i in range(lo, lo + 10):
            if i == lo + (u % 10):  # hold out one loved item per user
                continue
            rows.append((u, i, 50.0))
        # one low rating across the block boundary for connectivity
        rows.append((u, (u + 10) % 20, 1.0))
    return spark.createDataFrame(
        rows, "user_id long, item_id long, rating double"
    ).cache()


@pytest.fixture(scope="module")
def trained(block_ratings):
    return ALSRecommender(k=5, rank=4, max_iter=10, seed=7).train(block_ratings)


def test_contract_columns_and_ranks(trained):
    recs = trained.get_recommendations(5)
    assert recs.columns == ["user_id", "item_id", "rank"]
    per_user = recs.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"), F.max("rank").alias("mx"), F.min("rank").alias("mn")
    )
    bad = per_user.filter(
        (F.col("n") > 5) | (F.col("mx") > 5) | (F.col("mn") != 1)
    ).count()
    assert bad == 0


def test_never_recommends_rated(trained, block_ratings):
    recs = trained.get_recommendations(5)
    overlap = recs.join(
        block_ratings.select("user_id", "item_id"), ["user_id", "item_id"]
    ).count()
    assert overlap == 0


def test_recovers_block_structure(trained):
    # the held-out loved item sits in the user's own block; top-1
    # should come from that block for most users
    top1 = trained.get_recommendations(5).filter(F.col("rank") == 1).collect()
    same_block = sum(
        1 for r in top1 if (r.user_id < 10) == (r.item_id < 10)
    )
    assert same_block >= 16  # >= 80% of 20 users


def test_user_slice_matches_full(trained):
    full = {
        (r.user_id, r.item_id, r.rank)
        for r in trained.get_recommendations(5).filter(F.col("user_id") == 3).collect()
    }
    single = {
        (r.user_id, r.item_id, r.rank)
        for r in trained.get_user_recommendation(3, 5).collect()
    }
    assert full == single


def test_all_recs_ranks_every_unseen(block_ratings):
    rec = ALSRecommender(k=5, rank=4, max_iter=5, seed=7, all_recs=True).train(
        block_ratings
    )
    recs = rec.get_recommendations()
    # 20 items total, each user rated 10 -> 10 unseen each, all ranked
    counts = recs.groupBy("user_id").count().select("count").distinct().collect()
    assert [r["count"] for r in counts] == [10]


def test_int64_ids_remap_instead_of_failing(spark):
    """MLlib ALS requires ids in int32 range; bigint ids beyond it must
    go through the same dense remap as string ids (not an opaque
    executor failure)."""
    base = 10_000_000_000  # > 2^31-1
    rows = []
    for u in range(8):
        for i in range(8):
            if i == u:
                continue
            rows.append((base + u, base + 100 + i, 50.0 if (u < 4) == (i < 4) else 1.0))
    df = spark.createDataFrame(rows, "user_id long, item_id long, rating double")
    rec = ALSRecommender(k=3, rank=2, max_iter=5, seed=1).train(df)
    assert rec._user_map is not None  # remap path engaged
    out = rec.get_recommendations(3)
    got_users = {r.user_id for r in out.select("user_id").distinct().collect()}
    assert got_users == {base + u for u in range(8)}  # original id space
