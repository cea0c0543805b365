import math

import pytest

from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators import metrics


@pytest.fixture(scope="module")
def fixture(spark):
    # user 1: relevant={10 (r5), 11 (r3)}; recs [10, 99, 11, 98, 97]
    # user 2: relevant={20 (r4)};          recs [21, 22, 23, 24, 20]
    # user 3: all ratings below threshold -> excluded from the mean
    # user 4: relevant but NO recs        -> scores 0
    test = spark.createDataFrame(
        [
            (1, 10, 5.0), (1, 11, 3.0), (1, 12, 0.5),
            (2, 20, 4.0),
            (3, 30, 0.2),
            (4, 40, 5.0),
        ],
        "user_id int, item_id int, rating double",
    )
    recs = spark.createDataFrame(
        [
            (1, 10, 1), (1, 99, 2), (1, 11, 3), (1, 98, 4), (1, 97, 5),
            (2, 21, 1), (2, 22, 2), (2, 23, 3), (2, 24, 4), (2, 20, 5),
        ],
        "user_id int, item_id int, rank int",
    )
    return test, recs


def test_map_at_5_reference_formula(fixture):
    test, recs = fixture
    got = metrics.map_at_k(test, recs, 5, relevance_threshold=1.0).collect()[0]["value"]
    ap1 = (1 / 1 + 2 / 3) / min(2, 5)
    ap2 = (1 / 5) / min(1, 5)
    ap4 = 0.0  # relevant items, no recs
    want = (ap1 + ap2 + ap4) / 3
    assert abs(got - want) < 1e-9


def test_ndcg_at_5_graded(fixture):
    test, recs = fixture
    got = metrics.ndcg_at_k(test, recs, 5, relevance_threshold=1.0).collect()[0]["value"]
    dcg1 = 5 / math.log2(2) + 3 / math.log2(4)
    idcg1 = 5 / math.log2(2) + 3 / math.log2(3)
    dcg2 = 4 / math.log2(6)
    idcg2 = 4.0
    want = (dcg1 / idcg1 + dcg2 / idcg2 + 0.0) / 3
    assert abs(got - want) < 1e-9


def test_user_below_threshold_excluded(spark):
    test = spark.createDataFrame([(1, 10, 0.1)], "user_id int, item_id int, rating double")
    recs = spark.createDataFrame([(1, 10, 1)], "user_id int, item_id int, rank int")
    out = metrics.map_at_k(test, recs, 5, relevance_threshold=1.0).collect()[0]["value"]
    assert out is None  # avg over zero users


def test_duplicate_rec_counts_once(spark):
    # reference map.py:30 — a repeated item in the rec list is not a 2nd hit
    test = spark.createDataFrame([(1, 10, 5.0)], "user_id int, item_id int, rating double")
    recs = spark.createDataFrame(
        [(1, 10, 1), (1, 10, 2), (1, 99, 3)], "user_id int, item_id int, rank int"
    )
    got = metrics.map_at_k(test, recs, 5, relevance_threshold=1.0).collect()[0]["value"]
    assert abs(got - 1.0) < 1e-9  # only rank-1 hit counts; denominator min(1,5)


def test_evaluate_suite(fixture):
    test, recs = fixture
    out = metrics.evaluate(test, recs).collect()
    names = {r.metric for r in out}
    assert names == {"MAP@5", "nDCG@5"}


def test_mrr_and_hitrate(spark):
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators import metrics as ME

    test = spark.createDataFrame(
        [
            (1, 10, 5.0), (1, 11, 5.0),   # user 1: relevant 10, 11
            (2, 20, 5.0),                  # user 2: relevant 20
            (3, 30, 1.0),                  # user 3: below threshold -> excluded
        ],
        "user_id int, item_id int, rating double",
    )
    recs = spark.createDataFrame(
        [
            (1, 99, 1), (1, 10, 2), (1, 11, 3),   # user 1: first hit rank 2
            (2, 21, 1), (2, 22, 2),               # user 2: no hit in top-k
            (3, 30, 1),                            # user 3 excluded anyway
        ],
        "user_id int, item_id int, rank int",
    )
    mrr = ME.mrr_at_k(test, recs, 3, relevance_threshold=2.0).collect()[0].value
    assert mrr == pytest.approx((0.5 + 0.0) / 2)
    hr = ME.hit_rate_at_k(test, recs, 3, relevance_threshold=2.0).collect()[0].value
    assert hr == pytest.approx(0.5)
    # k cutoff: with k=1 user 1's hit at rank 2 no longer counts
    mrr1 = ME.mrr_at_k(test, recs, 1, relevance_threshold=2.0).collect()[0].value
    assert mrr1 == 0.0


def test_auc_at_k_hand_computed(spark):
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators.metrics import auc_at_k

    # user 1: slate [pos, neg, pos, neg] -> pairs won: r1 beats both
    # negs (2) + r3 beats the rank-4 neg (1) = 3 of 4 -> 0.75
    # user 2: slate [neg, pos] -> 0 of 1 -> 0.0
    # user 3: all positives -> excluded (no negative)
    test = spark.createDataFrame(
        [(1, 10, 5.0), (1, 12, 5.0), (2, 21, 5.0), (3, 30, 5.0), (3, 31, 5.0)],
        "user_id bigint, item_id bigint, rating double",
    )
    recs = spark.createDataFrame(
        [
            (1, 10, 1), (1, 11, 2), (1, 12, 3), (1, 13, 4),
            (2, 20, 1), (2, 21, 2),
            (3, 30, 1), (3, 31, 2),
        ],
        "user_id bigint, item_id bigint, rank bigint",
    )
    got = auc_at_k(test, recs, k=5, relevance_threshold=1.0).collect()[0].value
    assert got == pytest.approx((0.75 + 0.0) / 2, abs=1e-12)


def test_auc_at_k_perfect_and_inverted(spark):
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators.metrics import auc_at_k

    test = spark.createDataFrame(
        [(1, 10, 5.0)], "user_id bigint, item_id bigint, rating double"
    )
    top = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2)], "user_id bigint, item_id bigint, rank bigint"
    )
    bottom = spark.createDataFrame(
        [(1, 11, 1), (1, 10, 2)], "user_id bigint, item_id bigint, rank bigint"
    )
    assert auc_at_k(test, top, 5).collect()[0].value == 1.0
    assert auc_at_k(test, bottom, 5).collect()[0].value == 0.0
