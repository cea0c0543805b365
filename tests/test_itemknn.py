"""Unit tests for the item-item neighborhood recommenders
(operators/itemknn.py): exact-integer similarity math against
hand-computed values, scoring vs a brute-force replay, the Recommender
contract, and the MODELS registry wiring."""

import math

import pytest
from pyspark.sql import functions as F

from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators import itemknn as IK
from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.plans.registries import MODELS

RATINGS = [
    # user, item, rating
    (1, 10, 4), (1, 20, 2), (1, 30, 5),
    (2, 10, 3), (2, 20, 1),
    (3, 10, 5), (3, 30, 2),
    (4, 20, 4), (4, 30, 4),
]


@pytest.fixture()
def ratings(spark):
    return spark.createDataFrame(RATINGS, "user_id bigint, item_id bigint, rating bigint")


def _expected_sims():
    """Hand-replay of co-rating cosine over RATINGS."""
    by_item = {}
    for u, i, r in RATINGS:
        by_item.setdefault(i, {})[u] = r
    items = sorted(by_item)
    out = {}
    for a in items:
        for b in items:
            if a >= b:
                continue
            common = set(by_item[a]) & set(by_item[b])
            if not common:
                continue
            dot = sum(by_item[a][u] * by_item[b][u] for u in common)
            n2a = sum(v * v for v in by_item[a].values())
            n2b = sum(v * v for v in by_item[b].values())
            out[(a, b)] = (len(common), dot / math.sqrt(n2a * n2b))
    return out

def test_item_cosine_similarity_exact(spark, ratings):
    got = {
        (r.item_a, r.item_b): (r.n_common, r.sim)
        for r in IK.item_cosine_similarity(ratings).collect()
        if r.item_a < r.item_b
    }
    want = _expected_sims()
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0]
        assert got[k][1] == pytest.approx(want[k][1], rel=1e-12)
    # mirrored direction present and identical
    sym = {
        (r.item_a, r.item_b): r.sim
        for r in IK.item_cosine_similarity(ratings).collect()
    }
    for (a, b), (_, s) in want.items():
        assert sym[(b, a)] == sym[(a, b)]


def test_min_support_prunes(spark, ratings):
    got = IK.item_cosine_similarity(ratings, min_support=2).collect()
    for r in got:
        assert r.n_common >= 2


def test_max_user_degree_drops_power_users(spark, ratings):
    # user 1 rated 3 items; cap at 2 removes them from pair generation
    capped = {
        (r.item_a, r.item_b): r.n_common
        for r in IK.item_cosine_similarity(ratings, max_user_degree=2).collect()
        if r.item_a < r.item_b
    }
    # (10,20): users {1,2} -> only 2 left; (20,30): users {1,4} -> only 4
    assert capped[(10, 20)] == 1
    assert capped[(20, 30)] == 1


def test_kg_item_similarity_jaccard(spark):
    edges = [
        (10, "e1"), (10, "e2"), (10, "e3"),
        (20, "e2"), (20, "e3"),
        (30, "e4"),
    ]
    e = spark.createDataFrame(edges, "item_id bigint, entity string")
    got = {
        (r.item_a, r.item_b): (r.n_shared, r.sim)
        for r in IK.kg_item_similarity(e).collect()
    }
    assert got[(10, 20)] == (2, 2 / 3)  # |A u B| = 3
    assert got[(20, 10)] == (2, 2 / 3)
    assert (10, 30) not in got


def test_kg_max_entity_df_prunes_hot_entities(spark):
    edges = [(i, "hot") for i in range(10, 60, 10)] + [(10, "rare"), (20, "rare")]
    e = spark.createDataFrame(edges, "item_id bigint, entity string")
    got = {
        (r.item_a, r.item_b): (r.n_shared, r.sim)
        for r in IK.kg_item_similarity(e, max_entity_df=3).collect()
    }
    # "hot" (df=5) pruned everywhere: only the rare pair remains, and
    # set sizes are computed over the PRUNED universe (|A|=|B|=1)
    assert got == {(10, 20): (1, 1.0), (20, 10): (1, 1.0)}


def test_kg_max_items_per_entity_bounds_hot_fanout(spark):
    # one hot entity (df=40) + one cold (df=3, below the cap -> exact)
    edges = [(i, "hot") for i in range(40)] + [(100, "cold"), (101, "cold"), (102, "cold")]
    e = spark.createDataFrame(edges, "item_id bigint, entity string")
    capped = IK.kg_item_similarity(e, max_items_per_entity=8)
    pairs = capped.filter(F.col("item_a") < F.col("item_b")).count()
    # hot fan-out bounded near C(cap, 2) instead of C(40, 2) = 780;
    # the det-hash subsample keeps ~cap edges (binomial, loose bound)
    assert pairs < 200
    # cold entity untouched: all 3 of its pairs survive exactly
    cold = {
        (r.item_a, r.item_b)
        for r in capped.filter(F.col("item_a") >= 100).collect()
    }
    assert {(100, 101), (100, 102), (101, 102)} <= cold
    # deterministic: same input -> same pair set
    again = IK.kg_item_similarity(e, max_items_per_entity=8)
    assert sorted(map(tuple, capped.collect())) == sorted(map(tuple, again.collect()))


def test_score_by_neighbors_matches_bruteforce(spark, ratings):
    neighbors = IK.topm_neighbors(IK.item_cosine_similarity(ratings), m=10)
    got = {
        (r.user_id, r.item_id): r.rank
        for r in IK.score_by_neighbors(ratings, neighbors, k=5).collect()
    }
    # brute force: score(u, c) = sum sim(ri, c) * r_u(ri) over rated ri
    sims = {}
    for (a, b), (_, s) in _expected_sims().items():
        sims[(a, b)] = s
        sims[(b, a)] = s
    rated = {}
    for u, i, r in RATINGS:
        rated.setdefault(u, {})[i] = r
    want = {}
    for u, ur in rated.items():
        scores = {}
        for (ri, cand), s in [((ri, c), sims.get((ri, c))) for ri in ur for c in {10, 20, 30}]:
            if s is None or cand in ur:
                continue
            scores[cand] = scores.get(cand, 0.0) + s * ur[ri]
        for rank, (cand, _) in enumerate(
            sorted(scores.items(), key=lambda kv: (-kv[1], kv[0])), 1
        ):
            want[(u, cand)] = rank
    assert got == want


def test_recommender_contract(spark, ratings):
    rec = IK.ItemKNNRecommender(k=2).train(ratings)
    recs = rec.get_recommendations()
    assert recs.columns == ["user_id", "item_id", "rank"]
    per_user = recs.groupBy("user_id").count().collect()
    assert all(r["count"] <= 2 for r in per_user)
    # rated items never recommended
    overlap = recs.join(ratings, ["user_id", "item_id"], "inner").count()
    assert overlap == 0
    # single-user slice == filter of the full plan
    u1_full = {(r.item_id, r.rank) for r in recs.filter(F.col("user_id") == 1).collect()}
    u1 = {(r.item_id, r.rank) for r in rec.get_user_recommendation(1).collect()}
    assert u1 == u1_full


def test_kgsim_recommender_cold_start(spark, ratings):
    # item 40 has NO ratings but is KG-linked to 30 -> recommendable
    edges = [(10, "d1"), (20, "d1"), (30, "g1"), (40, "g1")]
    e = spark.createDataFrame(edges, "item_id bigint, entity string")
    rec = IK.KGSimRecommender(k=3).train(ratings, e)
    got = rec.get_recommendations()
    assert got.filter(F.col("item_id") == 40).count() > 0


def test_models_registry_wiring(spark, ratings):
    maker = MODELS["itemKNN"]
    rec = maker({"k": 2, "n_neighbors": 5, "min_support": 1}, seed=42)
    out = rec.train(ratings).get_recommendations()
    assert out.count() > 0
    assert out.columns == ["user_id", "item_id", "rank"]


def test_default_guard_bounds_power_user_pairs(spark):
    """The DEFAULT constructor must enforce the sum(deg^2) guard: one
    synthetic power user above DEFAULT_MAX_USER_DEGREE contributes ZERO
    co-rating pairs, while normal users' pairs survive. (Before the
    default, a 10^7-rating user would alone emit ~10^14 pairs.)"""
    deg = IK.DEFAULT_MAX_USER_DEGREE + 50
    rows = [(999, i, 10.0) for i in range(deg)]  # the power user
    # user 1 co-rates (1,2); user 2 rated only item 1 -> item 2 is
    # recommendable to user 2 through the surviving neighbor pair
    rows += [(1, 1, 50.0), (1, 2, 50.0), (2, 1, 40.0)]
    df = spark.createDataFrame(rows, "user_id long, item_id long, rating double")

    rec = IK.ItemKNNRecommender(k=2, m=5)  # all defaults
    assert rec.max_user_degree == IK.DEFAULT_MAX_USER_DEGREE
    rec.train(df)
    pairs = rec._neighbors.collect()
    # only the (1,2) co-rating pair from the two normal users remains;
    # the power user's deg^2/2 ~ 5e7 pairs were never generated
    assert {(r.item_a, r.item_b) for r in pairs} == {(1, 2), (2, 1)}
    recs = rec.get_recommendations(2)
    assert recs.count() > 0


def test_guard_disabled_explicitly(spark):
    rows = [(1, 1, 50.0), (1, 2, 50.0), (2, 1, 40.0), (2, 2, 30.0)]
    df = spark.createDataFrame(rows, "user_id long, item_id long, rating double")
    got = IK.item_cosine_similarity(df, max_user_degree=None).collect()
    assert {(r.item_a, r.item_b) for r in got} == {(1, 2), (2, 1)}
