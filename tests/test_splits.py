import math

import pytest
from pyspark.sql import functions as F

from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators import splits


@pytest.fixture(scope="module")
def ratings(spark):
    rows = [
        (u, i, float(i % 5 + 1), float(1000 + u * 100 + i))
        for u in range(10)
        for i in range(5 + u)  # user u has 5+u ratings
    ]
    return spark.createDataFrame(
        rows, "user_id int, item_id int, rating double, timestamp double"
    ).cache()


def test_random_user_ceil_sizes(ratings):
    df = splits.split_ratings(ratings, "random_by_ratio", seed=42, p=0.3, level="user")
    sizes = (
        df.groupBy("user_id")
        .agg(
            F.sum(F.col("is_test").cast("int")).alias("n_test"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    for r in sizes:
        assert r.n_test == math.ceil(r.n * 0.3)


def test_random_global_ceil_size(ratings):
    df = splits.split_ratings(ratings, "random_by_ratio", seed=42, p=0.25, level="global")
    n = ratings.count()
    n_test = df.filter("is_test").count()
    assert n_test == math.ceil(n * 0.25)


def test_deterministic_across_partitionings(ratings):
    a = splits.split_ratings(ratings.repartition(7), "random_by_ratio", seed=1, p=0.4, level="user")
    b = splits.split_ratings(ratings.coalesce(1), "random_by_ratio", seed=1, p=0.4, level="user")
    assert (
        a.select("user_id", "item_id", "is_test")
        .exceptAll(b.select("user_id", "item_id", "is_test"))
        .count()
        == 0
    )


def test_different_seed_different_split(ratings):
    a = splits.split_ratings(ratings, "random_by_ratio", seed=1, p=0.4, level="user")
    b = splits.split_ratings(ratings, "random_by_ratio", seed=2, p=0.4, level="user")
    diff = (
        a.select("user_id", "item_id", "is_test")
        .exceptAll(b.select("user_id", "item_id", "is_test"))
        .count()
    )
    assert diff > 0


def test_temporal_user_newest_in_test(ratings):
    df = splits.split_ratings(
        ratings, "timestamp_by_ratio", seed=42, p=0.4, level="user", ts_col="timestamp"
    )
    # every test row's timestamp >= every train row's timestamp per user
    agg = df.groupBy("user_id").agg(
        F.min(F.when(F.col("is_test"), F.col("timestamp"))).alias("min_test"),
        F.max(F.when(~F.col("is_test"), F.col("timestamp"))).alias("max_train"),
    )
    bad = agg.filter(F.col("min_test") < F.col("max_train")).count()
    assert bad == 0


def test_fixed_timestamp(ratings):
    df = splits.split_ratings(ratings, "fixed_timestamp", timestamp=1500.0, ts_col="timestamp")
    assert df.filter(F.col("is_test") != (F.col("timestamp") > 1500.0)).count() == 0


def test_kfold_sklearn_sizing(ratings):
    df = splits.split_ratings(ratings, "k_fold", seed=42, k=3, level="user")
    sizes = df.groupBy("user_id", "fold").count().collect()
    per_user = {}
    for r in sizes:
        per_user.setdefault(r.user_id, {})[r.fold] = r["count"]
    for u, folds in per_user.items():
        n = sum(folds.values())
        expected = [n // 3 + (1 if i < n % 3 else 0) for i in range(3)]
        assert sorted(folds.values(), reverse=True) == sorted(expected, reverse=True)
        # fold ids must be exactly 0..k-1
        assert set(folds) == {0, 1, 2}


def test_kfold_folds_are_partition(ratings):
    df = splits.split_ratings(ratings, "k_fold", seed=42, k=4, level="global")
    assert df.count() == ratings.count()
    assert df.select("user_id", "item_id").distinct().count() == ratings.count()


def test_validation_subsplit_rejects_kfold(ratings):
    with pytest.raises(ValueError):
        splits.validation_subsplit(ratings, method="k_fold", k=3)


@pytest.mark.parametrize(
    "kw",
    [
        dict(method="nope"),
        dict(method="random_by_ratio", p=0.0, level="user"),
        dict(method="random_by_ratio", p=0.5, level="bad"),
        dict(method="k_fold", k=1, level="user"),
    ],
)
def test_invalid_args(ratings, kw):
    with pytest.raises(ValueError):
        splits.split_ratings(ratings, **kw)


@pytest.mark.slow
def test_global_variants_deterministic_across_partitionings(ratings):
    # the two-pass bucketed global rank must give identical membership
    # regardless of physical partitioning (retry/speculation safety)
    for method, kw in [
        ("random_by_ratio", {"p": 0.25, "level": "global"}),
        ("timestamp_by_ratio", {"p": 0.25, "level": "global"}),
        ("k_fold", {"k": 3, "level": "global"}),
    ]:
        col = "fold" if method == "k_fold" else "is_test"
        a = splits.split_ratings(ratings.repartition(11), method, seed=5, **kw)
        b = splits.split_ratings(ratings.coalesce(1), method, seed=5, **kw)
        assert (
            a.select("user_id", "item_id", col)
            .exceptAll(b.select("user_id", "item_id", col))
            .count()
            == 0
        ), method


@pytest.mark.slow
def test_kfold_sklearn_sizing_property(spark):
    from hypothesis import given, settings, strategies as st

    from hypothesis import assume

    @settings(max_examples=5, deadline=None, derandomize=True)
    @given(n=st.integers(min_value=4, max_value=60), k=st.integers(min_value=2, max_value=5))
    def check(n, k):
        assume(n >= k)  # sklearn KFold itself raises for n < k
        df = spark.createDataFrame(
            [(1, i, float(i)) for i in range(n)],
            "user_id int, item_id int, rating double",
        )
        out = splits.split_ratings(df, "k_fold", seed=3, k=k, level="global")
        sizes = {r.fold: r["count"] for r in out.groupBy("fold").count().collect()}
        assert sorted(sizes) == list(range(k))
        # sklearn KFold: first n % k folds get n//k + 1 rows, rest n//k
        for fold, size in sizes.items():
            assert size == (n // k + 1 if fold < n % k else n // k)

    check()


def test_stratified_sample_rates_and_determinism(ratings):
    """Per-stratum det-hash Bernoulli: rate 1.0 keeps everything,
    rate 0.0 / missing stratum drops everything; membership is stable
    under repartitioning and a subset of the rate-1.0 stratum."""
    df = ratings.withColumn(
        "band", F.when(F.col("user_id") < 5, "lo").otherwise("hi")
    )
    full = splits.stratified_sample(
        df, "band", {"hi": 1.0, "lo": 0.4}, key_cols=["user_id", "item_id"]
    )
    hi_in = df.filter(F.col("band") == "hi").count()
    assert full.filter(F.col("band") == "hi").count() == hi_in
    lo_in = df.filter(F.col("band") == "lo").count()
    lo_kept = full.filter(F.col("band") == "lo").count()
    assert 0 < lo_kept < lo_in
    # default_rate drops strata missing from the rate map
    none = splits.stratified_sample(
        df, "band", {"hi": 1.0}, key_cols=["user_id", "item_id"]
    )
    assert none.filter(F.col("band") == "lo").count() == 0
    # deterministic under physical layout changes
    again = splits.stratified_sample(
        df.repartition(13), "band", {"hi": 1.0, "lo": 0.4},
        key_cols=["user_id", "item_id"],
    )
    assert sorted(map(tuple, full.collect())) == sorted(map(tuple, again.collect()))
    # a different seed changes membership
    other = splits.stratified_sample(
        df, "band", {"hi": 1.0, "lo": 0.4}, key_cols=["user_id", "item_id"],
        seed=7,
    )
    assert sorted(map(tuple, full.collect())) != sorted(map(tuple, other.collect()))


def test_stratified_sample_rate_accuracy(spark):
    """det_hash is uniform enough that the kept fraction tracks the
    configured rate (20k keys, ±2% absolute)."""
    df = spark.range(20000).select(
        F.col("id").alias("k"), F.lit("s").alias("band")
    )
    for rate in (0.1, 0.5, 0.9):
        kept = splits.stratified_sample(df, "band", {"s": rate}, key_cols=["k"]).count()
        assert abs(kept / 20000 - rate) < 0.02, (rate, kept)


def test_stratified_head_exact_and_stable(spark):
    """stratified_head == the naive whole-stratum window rank, takes
    exactly min(n, |stratum|) rows, and is invariant under
    repartitioning (pure function of the key)."""
    from pyspark.sql import Window

    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.functions.hashing import det_unit
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators.splits import stratified_head

    rows = [(i, "abc"[i % 3]) for i in range(90)] + [(1000, "d")]
    df = spark.createDataFrame(rows, "id bigint, grp string")
    got = stratified_head(df, "grp", n=7, key_cols=["id"], n_buckets=4)
    picked = {(r.grp, r.id) for r in got.collect()}

    naive = (
        df.withColumn("_u", det_unit(F.col("id")))
        .withColumn(
            "_rn",
            F.row_number().over(Window.partitionBy("grp").orderBy("_u", "id")),
        )
        .filter(F.col("_rn") <= 7)
    )
    want = {(r.grp, r.id) for r in naive.collect()}
    assert picked == want
    from collections import Counter

    sizes = Counter(g for g, _ in picked)
    assert sizes == {"a": 7, "b": 7, "c": 7, "d": 1}
    re_got = {
        (r.grp, r.id)
        for r in stratified_head(
            df.repartition(7), "grp", n=7, key_cols=["id"], n_buckets=4
        ).collect()
    }
    assert re_got == picked


def test_quota_by_score_matches_naive_window(spark):
    """quota_by_score == the naive whole-stratum (score desc, id) rank;
    exact per-stratum sizes; repartition-invariant; boundary scores
    (0.0 / 1.0) bucket safely."""
    from pyspark.sql import Window

    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators.splits import quota_by_score

    rows = [
        (i, "ab"[i % 2], round(((i * 37) % 101) / 100.0, 6)) for i in range(80)
    ] + [(900, "a", 0.0), (901, "a", 1.0), (902, "c", 0.5)]
    df = spark.createDataFrame(rows, "id bigint, grp string, score double")
    got = {
        (r.grp, r.id)
        for r in quota_by_score(df, "grp", "score", n=9, key_cols=["id"], n_buckets=4).collect()
    }
    naive = (
        df.withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("grp").orderBy(F.desc("score"), "id")
            ),
        ).filter(F.col("_rn") <= 9)
    )
    want = {(r.grp, r.id) for r in naive.collect()}
    assert got == want
    from collections import Counter

    sizes = Counter(g for g, _ in got)
    assert sizes == {"a": 9, "b": 9, "c": 1}
    assert ("a", 901) in got  # score 1.0 always survives a top-9 quota
    re_got = {
        (r.grp, r.id)
        for r in quota_by_score(
            df.repartition(7), "grp", "score", n=9, key_cols=["id"], n_buckets=4
        ).collect()
    }
    assert re_got == got


def test_leave_one_out_marks_each_users_last_interaction(spark):
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators.splits import split_ratings

    rows = [
        (1, 10, 4.0, 100), (1, 11, 3.0, 200), (1, 12, 5.0, 150),
        (2, 10, 2.0, 300),
        (3, 13, 1.0, 50), (3, 14, 1.0, 50),  # ts tie -> higher item_id wins
    ]
    df = spark.createDataFrame(
        rows, "user_id bigint, item_id bigint, rating double, ts bigint"
    )
    out = split_ratings(df, "leave_one_out", ts_col="ts")
    test = {(r.user_id, r.item_id) for r in out.filter("is_test").collect()}
    assert test == {(1, 11), (2, 10), (3, 14)}
    # exactly one test row per user, train = everything else
    per_user = (
        out.groupBy("user_id").agg(F.sum(F.col("is_test").cast("int")).alias("n"))
        .collect()
    )
    assert all(r.n == 1 for r in per_user)
    assert out.count() == len(rows)


def test_rolling_origin_folds_hand_computed(spark):
    """10 rows, k=4 -> 5 rank-equal segments of 2; fold f trains on
    2f rows and tests on 2; expanding history, strictly leak-free."""
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators.splits import rolling_origin_folds

    rows = [(u, 100 + u, 3.0, float(10 * u)) for u in range(10)]
    df = spark.createDataFrame(rows, "user_id bigint, item_id bigint, rating double, ts double")
    got = {r.fold: r for r in rolling_origin_folds(df, k=4).collect()}
    assert sorted(got) == [1, 2, 3, 4]
    for f, r in got.items():
        assert (r.n_train, r.n_test) == (2 * f, 2)
        assert r.leakage_free
        assert r.train_max_ts < r.test_min_ts <= r.test_max_ts
    assert got[4].train_max_ts == 70.0 and got[4].test_min_ts == 80.0


def test_rolling_origin_folds_tied_timestamps_still_leak_free(spark):
    """All-equal timestamps: the rank cut is arbitrary but the audit
    must still report leakage_free (train_max == test_min is the tie
    case, not a leak — rank order is strict)."""
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators.splits import rolling_origin_folds

    rows = [(u, 100 + u, 3.0, 5.0) for u in range(9)]
    df = spark.createDataFrame(rows, "user_id bigint, item_id bigint, rating double, ts double")
    got = rolling_origin_folds(df, k=2).collect()
    assert len(got) == 2
    assert all(r.leakage_free for r in got)
    assert sum(r.n_test for r in got) == 6  # 9 rows -> segments 3/3/3


def test_group_kfold_users_never_straddle_folds(spark):
    """GroupKFold's leakage contract: every user's rows share ONE
    fold; all k folds are populated on enough users; determinism
    across invocations; seed changes reshuffle assignment."""
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators.splits import split_ratings

    rows = [(u, i, 3.0, float(i)) for u in range(60) for i in range(1 + u % 4)]
    df = spark.createDataFrame(rows, "user_id bigint, item_id bigint, rating double, ts double")
    out = split_ratings(df, "group_kfold", seed=42, k=4)
    per_user = out.groupBy("user_id").agg(F.count_distinct("fold").alias("nf")).collect()
    assert all(r.nf == 1 for r in per_user)
    folds = {r.fold for r in out.select("fold").distinct().collect()}
    assert folds == {0, 1, 2, 3}
    again = {(r.user_id, r.item_id): r.fold for r in split_ratings(df, "group_kfold", seed=42, k=4).collect()}
    first = {(r.user_id, r.item_id): r.fold for r in out.collect()}
    assert again == first
    other = {(r.user_id, r.item_id): r.fold for r in split_ratings(df, "group_kfold", seed=7, k=4).collect()}
    assert other != first


def test_purged_embargo_folds_bruteforce(spark):
    """Pin purged-embargo CV against a brute-force replay of the rank
    arithmetic: block bounds via sp6 sizing, embargo = ceil(frac*n)
    ranks each side, roles partition every (row, fold) pair."""
    import math

    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators.splits import purged_embargo_folds

    n = 103
    rows = [(i % 7, i % 11, float(i % 5), float(i * 3 % 97)) for i in range(n)]
    df = spark.createDataFrame(rows, "user_id long, item_id long, rating double, ts double")
    k, frac = 4, 0.05
    got = {
        r.fold: (r.n_train, r.n_test, r.n_purged, r.test_min_ts, r.test_max_ts)
        for r in purged_embargo_folds(df, k=k, embargo_frac=frac).collect()
    }
    ordered = sorted(rows, key=lambda t: (t[3], t[0], t[1], t[2]))
    emb = math.ceil(n * frac)
    small, big = n // k, n % k
    for f in range(k):
        s = f * (small + 1) if f < big else big * (small + 1) + (f - big) * small
        e = s + (small + 1 if f < big else small) - 1
        test = [r for i, r in enumerate(ordered) if s <= i <= e]
        purged = [
            r
            for i, r in enumerate(ordered)
            if (s - emb <= i <= e + emb) and not (s <= i <= e)
        ]
        train_n = n - len(test) - len(purged)
        assert got[f] == (
            train_n,
            len(test),
            len(purged),
            min(r[3] for r in test),
            max(r[3] for r in test),
        ), f"fold {f}"
    # every fold partitions all n rows
    for f in range(k):
        assert got[f][0] + got[f][1] + got[f][2] == n


@pytest.mark.slow
def test_rolling_origin_registry_method_matches_audit(spark):
    """VERDICT r13 item 7: split_ratings(method='rolling_origin') is
    the ROW-LEVEL twin of the sp13 audit — per-fold train/test counts
    from the expanding-window filters equal the audit's fold rows, and
    every train row's rank precedes every test row's (leak-free)."""
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators.splits import (
        rolling_origin_folds,
    )

    n, k = 103, 4
    rows = [(i % 7, i % 11, float(i % 5), float(i * 3 % 97)) for i in range(n)]
    df = spark.createDataFrame(
        rows, "user_id long, item_id long, rating double, ts double"
    )
    audit = {
        r.fold: (r.n_train, r.n_test)
        for r in rolling_origin_folds(df, k=k).collect()
    }
    sp_df = splits.split_ratings(df, "rolling_origin", k=k, ts_col="ts")
    assert set(sp_df.columns) == {"user_id", "item_id", "rating", "ts", "fold"}
    assert sp_df.count() == n
    for f in range(1, k + 1):
        train, test = splits.rolling_origin_train_test(sp_df, f)
        assert (train.count(), test.count()) == audit[f], f"fold {f}"
        # leak-free: train's max ts <= test's min ts
        tmax = train.agg(F.max("ts")).collect()[0][0]
        tmin = test.agg(F.min("ts")).collect()[0][0]
        assert tmax <= tmin
    with pytest.raises(ValueError, match="segment 0"):
        splits.rolling_origin_train_test(sp_df, 0)
    # upper bound (r14 review): with k passed, an out-of-range fold
    # raises instead of silently returning (all rows, empty test)
    with pytest.raises(ValueError, match="fold=5 with k=4"):
        splits.rolling_origin_train_test(sp_df, k + 1, k)


def test_purged_embargo_registry_method_matches_audit(spark):
    """VERDICT r13 item 7: split_ratings(method='purged_embargo') +
    purged_embargo_train_test reproduce the sp15 audit exactly —
    per-fold (n_train, n_test) match and n - train - test equals the
    audit's n_purged; helper columns dropped from both outputs."""
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators.splits import (
        purged_embargo_folds,
    )

    n, k, frac = 103, 4, 0.05
    rows = [(i % 7, i % 11, float(i % 5), float(i * 3 % 97)) for i in range(n)]
    df = spark.createDataFrame(
        rows, "user_id long, item_id long, rating double, ts double"
    )
    audit = {
        r.fold: (r.n_train, r.n_test, r.n_purged)
        for r in purged_embargo_folds(df, k=k, embargo_frac=frac).collect()
    }
    sp_df = splits.split_ratings(df, "purged_embargo", k=k, ts_col="ts")
    assert {"fold", "rank", "n_total"} <= set(sp_df.columns)
    for f in range(k):
        train, test = splits.purged_embargo_train_test(sp_df, f, k, frac)
        nt, ns = train.count(), test.count()
        assert (nt, ns) == audit[f][:2], f"fold {f}"
        assert n - nt - ns == audit[f][2], f"fold {f} purge"
        assert "rank" not in train.columns and "n_total" not in test.columns
    with pytest.raises(ValueError, match="0..k-1"):
        splits.purged_embargo_train_test(sp_df, k, k, frac)


def test_token_budget_select_matches_naive_cumsum(spark):
    """token_budget_select == the naive per-stratum (score desc, id)
    window cumsum rule: take rows while the tokens of strictly-better
    rows are under budget (so the crossing doc is INCLUDED); a budget
    above the stratum's mass selects it whole; budget 0 selects
    nothing. The bucketed prefix-sum reconstruction (never a
    whole-stratum window) must reproduce the naive rule exactly."""
    from pyspark.sql import functions as F

    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators.splits import token_budget_select

    rows = [
        (i, f"s{i % 3}", round(((i * 37) % 101) / 101.0, 6), 10 + (i * 13) % 50)
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, quality double, tc long")
    budgets = spark.createDataFrame(
        [("s0", 300), ("s1", 10**9), ("s2", 0)], "source string, budget_tokens long"
    )
    got = {
        r.doc_id
        for r in token_budget_select(
            df, "source", "quality", "tc", budgets, key_cols=["doc_id"]
        ).collect()
    }
    want = set()
    b = {"s0": 300, "s1": 10**9, "s2": 0}
    for s in ("s0", "s1", "s2"):
        cum = 0
        for doc_id, _, q, tc in sorted(
            (r for r in rows if r[1] == s), key=lambda r: (-r[2], r[0])
        ):
            if cum < b[s]:
                want.add(doc_id)
            cum += tc
    assert got == want
    assert not {d for d in got if rows[d][1] == "s2"}  # budget 0 -> none
    assert {d for d in got if rows[d][1] == "s1"} == {
        r[0] for r in rows if r[1] == "s1"
    }  # over-mass budget -> whole stratum
    # crossing doc included: s0's selected mass strictly exceeds 300
    s0_sel = sum(rows[d][3] for d in got if rows[d][1] == "s0")
    assert s0_sel >= 300
    # partitioning-invariant (deterministic ordering, no rand())
    got1 = {
        r.doc_id
        for r in token_budget_select(
            df.repartition(7), "source", "quality", "tc", budgets, key_cols=["doc_id"]
        ).collect()
    }
    assert got1 == got


def test_leakage_safe_split_clusters_never_span(spark):
    """sp16's invariant: every near-dup cluster lands WHOLLY on one
    side of the split (a random doc-level split leaks train text into
    test through a near-dup twin). Planted exact-dup pairs must end up
    with one is_test value per cluster, and the assignment must be a
    pure function of cluster_id (repartition-invariant)."""
    from pyspark.sql import functions as F

    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.functions.hashing import det_unit
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators import dedup as DD

    base = [
        (i, f"unique document number {i} with plenty of words to shingle "
            f"alpha beta gamma delta {i}")
        for i in range(30)
    ]
    # plant dup pairs: 30+i copies doc i for i in 0..9
    dups = [(30 + i, base[i][1]) for i in range(10)]
    docs = spark.createDataFrame(base + dups, "doc_id long, text string")
    pairs = DD.minhash_lsh_pairs(docs, bands=8, n_hashes=16, verify_threshold=0.5)
    comps = DD.connected_components(docs.select(F.col("doc_id").alias("id")), pairs)
    split = comps.select(
        "id", "cluster_id", (det_unit(F.col("cluster_id"), seed=42) < 0.2).alias("is_test")
    )
    rows = split.collect()
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r.cluster_id, set()).add(r.is_test)
    assert all(len(v) == 1 for v in by_cluster.values())  # never spans
    # the planted pairs really are clustered (invariant is non-vacuous)
    cl = {r.id: r.cluster_id for r in rows}
    for i in range(10):
        assert cl[i] == cl[30 + i] == min(i, cl[i])
    # repartition-invariant
    rows2 = {
        (r.id, r.cluster_id, r.is_test)
        for r in DD.connected_components(
            docs.repartition(7).select(F.col("doc_id").alias("id")),
            pairs,
        ).select(
            "id", "cluster_id",
            (det_unit(F.col("cluster_id"), seed=42) < 0.2).alias("is_test"),
        ).collect()
    }
    assert rows2 == {(r.id, r.cluster_id, r.is_test) for r in rows}


def test_dedup_aware_split_clusters_never_span(spark):
    """SP16 as a registry method (VERDICT r12 item 6): rows whose keys
    share a near-dup cluster always land on the same side; keys absent
    from the cluster map behave as singleton clusters of themselves
    (identical to a plain det-hash split of the key)."""
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.functions.hashing import det_unit

    ratings = spark.createDataFrame(
        [(u, i, 3.0) for u in range(6) for i in range(10)],
        "user_id long, item_id long, rating double",
    )
    # items 0..3 form one cluster (canonical id 0); 4/5 another; 6-9 unmapped
    clusters = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 0), (3, 0), (4, 4), (5, 4)],
        "item_id long, cluster_id long",
    )
    out = splits.split_ratings(
        ratings, "dedup_aware", seed=42, p=0.3, clusters=clusters
    )
    rows = out.collect()
    assert len(rows) == 60 and set(out.columns) == {
        "user_id", "item_id", "rating", "is_test"
    }
    side = {}
    for r in rows:
        side.setdefault(r.item_id, set()).add(r.is_test)
    assert all(len(v) == 1 for v in side.values())
    # the whole cluster moves together
    assert len({next(iter(side[i])) for i in range(4)}) == 1
    assert len({next(iter(side[i])) for i in (4, 5)}) == 1
    # unmapped keys == singleton det-hash split of the key itself
    want = {
        r.item_id: r.u < 0.3
        for r in spark.createDataFrame(
            [(i,) for i in range(6, 10)], "item_id long"
        ).select(
            "item_id",
            det_unit(F.col("item_id").cast("string"), seed=42).alias("u"),
        ).collect()
    }
    for i in range(6, 10):
        assert next(iter(side[i])) == want[i], i
    # repartition-invariant (pure function of the key/cluster)
    again = {
        (r.user_id, r.item_id): r.is_test
        for r in splits.split_ratings(
            ratings.repartition(13), "dedup_aware", seed=42, p=0.3,
            clusters=clusters.repartition(3),
        ).collect()
    }
    assert again == {(r.user_id, r.item_id): r.is_test for r in rows}


def test_dedup_aware_split_validates_inputs(spark):
    ratings = spark.createDataFrame(
        [(1, 1, 3.0)], "user_id long, item_id long, rating double"
    )
    clusters = spark.createDataFrame([(1, 1)], "item_id long, cluster_id long")
    with pytest.raises(ValueError, match="clusters"):
        splits.split_ratings(ratings, "dedup_aware", p=0.3)
    with pytest.raises(ValueError, match="p must be"):
        splits.split_ratings(ratings, "dedup_aware", p=1.5, clusters=clusters)
    with pytest.raises(ValueError, match="dedup_aware"):
        splits.split_ratings(ratings, "not_a_method", p=0.3)


def test_dedup_aware_split_duplicate_cluster_rows(spark):
    """ADVICE r13: the user-supplied clusters frame carries no
    one-row-per-key guarantee. Benign duplicates (same key -> same
    cluster twice) must NOT fan ratings out; a key mapping to
    CONFLICTING cluster ids must fail loudly at execution rather than
    resolve arbitrarily; NULL cluster ids behave as absent (singleton
    fallback to the key)."""
    ratings = spark.createDataFrame(
        [(u, i, 3.0) for u in range(3) for i in range(4)],
        "user_id long, item_id long, rating double",
    )
    # item 0 duplicated benignly; item 2 maps to NULL (-> singleton)
    dup = spark.createDataFrame(
        [(0, 7), (0, 7), (1, 7), (2, None)],
        "item_id long, cluster_id long",
    )
    out = splits.split_ratings(ratings, "dedup_aware", seed=42, p=0.3, clusters=dup)
    rows = out.collect()
    assert len(rows) == 12  # no fan-out from the duplicate row
    side = {}
    for r in rows:
        side.setdefault(r.item_id, set()).add(r.is_test)
    assert all(len(v) == 1 for v in side.values())
    assert next(iter(side[0])) == next(iter(side[1]))  # cluster 7 together
    # NULL-cluster key == plain singleton split of the key itself
    clean = {
        r.item_id: r.is_test
        for r in splits.split_ratings(
            ratings, "dedup_aware", seed=42, p=0.3,
            clusters=spark.createDataFrame(
                [(0, 7), (1, 7)], "item_id long, cluster_id long"
            ),
        ).collect()
    }
    assert next(iter(side[2])) == clean[2] and next(iter(side[3])) == clean[3]
    # conflicting cluster ids for one key -> loud execution-time error
    conflict = spark.createDataFrame(
        [(0, 7), (0, 8)], "item_id long, cluster_id long"
    )
    bad = splits.split_ratings(
        ratings, "dedup_aware", seed=42, p=0.3, clusters=conflict
    )
    with pytest.raises(Exception, match="conflicting"):
        bad.collect()


def test_dedup_aware_kfold_clusters_never_straddle(spark):
    """dedup_aware k-fold form: fold = det_hash(cluster) mod k — every
    member of a near-dup cluster lands in the same fold (each held-out
    fold is leakage-safe against the other k-1), folds are in [0, k),
    and unmapped keys fold as singleton clusters of themselves."""
    ratings = spark.createDataFrame(
        [(u, i, 3.0) for u in range(4) for i in range(12)],
        "user_id long, item_id long, rating double",
    )
    clusters = spark.createDataFrame(
        [(i, i // 3 * 3) for i in range(9)],  # 3 clusters of 3 items
        "item_id long, cluster_id long",
    )
    out = splits.split_ratings(
        ratings, "dedup_aware", seed=7, k=4, clusters=clusters
    )
    rows = out.collect()
    assert set(out.columns) == {"user_id", "item_id", "rating", "fold"}
    folds = {}
    for r in rows:
        assert 0 <= r.fold < 4
        folds.setdefault(r.item_id, set()).add(r.fold)
    assert all(len(v) == 1 for v in folds.values())
    for base in (0, 3, 6):  # cluster members share the fold
        assert len({next(iter(folds[base + j])) for j in range(3)}) == 1
    # train/test accessor works per fold and partitions the rows
    tr, te = splits.train_test(out, fold=0)
    assert tr.count() + te.count() == 48
    import pytest

    with pytest.raises(ValueError, match="k >= 2"):
        splits.split_ratings(ratings, "dedup_aware", k=1, clusters=clusters)
