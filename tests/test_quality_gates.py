"""Unit tests for the pipeline-gate operators: expectations (dq1),
snapshot_diff (dq2), sample_negatives (sp11), prefiltered_join (j9)."""

import pytest
from pyspark.sql import functions as F

from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators.expectations import Check, run_expectations
from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators.negatives import sample_negatives
from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators.reconcile import snapshot_diff
from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators.runtime_filter import prefiltered_join


# ------------------------------------------------------------------ dq1


def _report(spark, df, checks):
    rows = run_expectations(spark, df, checks).collect()
    return {r["check"]: (r["metric"], r["passed"]) for r in rows}


def test_expectations_metrics_exact(spark):
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, None, 30.0), (3, "a", -5.0)],
        "id bigint, tag string, val double",
    )
    rep = _report(
        spark,
        df,
        [
            Check("tag_complete", "completeness", "tag", 0.9),
            Check("id_unique", "uniqueness", "id", 1.0),
            Check("tag_in_set", "in_set", "tag", 0.5, values=("a", "b")),
            Check("val_range", "between", "val", 1.0, lo=0.0, hi=100.0),
        ],
    )
    assert rep["tag_complete"] == (0.75, False)
    assert rep["id_unique"] == (0.75, False)  # 3 distinct / 4 rows
    assert rep["tag_in_set"] == (0.75, True)  # null fails membership
    assert rep["val_range"] == (0.75, False)


def test_expectations_referential_and_regex(spark):
    fact = spark.createDataFrame([(1,), (2,), (9,)], "fk bigint").withColumn(
        "code", F.concat(F.lit("X-"), F.col("fk"))
    )
    dim = spark.createDataFrame([(1,), (2,), (3,)], "pk bigint")
    rep = _report(
        spark,
        fact,
        [
            Check("fk_ref", "referential", "fk", 1.0, ref_table=dim, ref_column="pk"),
            Check("code_shape", "matches", "code", 0.5, pattern="^X-[0-9]$"),
        ],
    )
    assert rep["fk_ref"][0] == pytest.approx(2 / 3, abs=1e-6)
    assert rep["fk_ref"][1] is False
    assert rep["code_shape"] == (1.0, True)


def test_expectations_unknown_kind_raises(spark):
    df = spark.createDataFrame([(1,)], "id bigint")
    with pytest.raises(ValueError):
        run_expectations(spark, df, [Check("bad", "entropy", "id", 1.0)])


def test_expectations_empty_input_all_zero(spark):
    df = spark.createDataFrame([], "id bigint")
    rep = _report(spark, df, [Check("c", "completeness", "id", 0.5)])
    assert rep["c"] == (0.0, False)


def test_expectations_empty_input_exact_gates_uniform(spark):
    """Exact gates (threshold >= 1) on an EMPTY frame must agree across
    check kinds: SUM-backed row-level counts aggregate to NULL while
    count_distinct gives 0, and before the coalesce `None == 0` made
    row-level gates fail while uniqueness gates passed the same n=0.
    Uniform rule: n == 0 passes every exact gate vacuously."""
    df = spark.createDataFrame([], "id bigint, k bigint")
    ref = spark.createDataFrame([(1,)], "k bigint")
    rep = _report(
        spark,
        df,
        [
            Check("comp", "completeness", "id", 1.0),
            Check("uniq", "uniqueness", "id", 1.0),
            Check("refi", "referential", "k", 1.0, ref_table=ref, ref_column="k"),
        ],
    )
    assert rep["comp"] == (0.0, True)
    assert rep["uniq"] == (0.0, True)
    assert rep["refi"] == (0.0, True)


# ------------------------------------------------------------------ dq2


def test_snapshot_diff_statuses_and_flags(spark):
    old = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", None), (4, "d", 4.0)],
        "k bigint, s string, v double",
    )
    new = spark.createDataFrame(
        [(1, "a", 1.0), (2, "B", 2.0), (3, "c", None), (5, "e", 5.0)],
        "k bigint, s string, v double",
    )
    rows = {
        r["k"]: r
        for r in snapshot_diff(old, new, ["k"], ["s", "v"]).collect()
    }
    assert rows[1]["status"] == "unchanged"
    assert rows[2]["status"] == "changed" and rows[2]["s_changed"] and not rows[2]["v_changed"]
    # null == null is a MATCH under null-safe equality
    assert rows[3]["status"] == "unchanged"
    assert rows[4]["status"] == "removed" and not rows[4]["s_changed"]
    assert rows[5]["status"] == "added" and not rows[5]["v_changed"]


def test_snapshot_diff_null_to_value_is_change(spark):
    old = spark.createDataFrame([(1, None)], "k bigint, v string")
    new = spark.createDataFrame([(1, "x")], "k bigint, v string")
    (r,) = snapshot_diff(old, new, ["k"], ["v"]).collect()
    assert r["status"] == "changed" and r["v_changed"]


# ----------------------------------------------------------------- sp11


def _toy_ratings(spark, n_users=30, n_items=40):
    rows = [
        (u, (u * 7 + j) % n_items, 1.0, 0)
        for u in range(n_users)
        for j in range(5)
    ]
    return spark.createDataFrame(
        rows, "user_id bigint, item_id bigint, rating double, ts bigint"
    )


def test_negatives_never_positive_and_at_most_k(spark):
    r = _toy_ratings(spark)
    neg = sample_negatives(r, k=4, n_proposals=12, seed=3)
    assert neg.join(
        r.select("user_id", "item_id").distinct(), ["user_id", "item_id"], "inner"
    ).count() == 0
    per_user = neg.groupBy("user_id").count().collect()
    assert all(row["count"] <= 4 for row in per_user)
    # sparse positives + 12 proposals: every user should fill its k
    assert all(row["count"] == 4 for row in per_user)


def test_negatives_deterministic_and_seed_sensitive(spark):
    r = _toy_ratings(spark)
    a = sorted(map(tuple, sample_negatives(r, k=3, seed=3).collect()))
    b = sorted(map(tuple, sample_negatives(r, k=3, seed=3).collect()))
    c = sorted(map(tuple, sample_negatives(r, k=3, seed=4).collect()))
    assert a == b
    assert a != c


def test_negatives_items_come_from_catalog(spark):
    r = _toy_ratings(spark)
    catalog = {row["item_id"] for row in r.select("item_id").distinct().collect()}
    assert all(
        row["item_id"] in catalog for row in sample_negatives(r, k=3).collect()
    )


# ------------------------------------------------------------------- j9


def test_prefiltered_join_matches_plain_join(spark):
    probe = spark.createDataFrame(
        [(i, i * 10.0) for i in range(200)], "k bigint, v double"
    )
    build = spark.createDataFrame(
        [(i, f"d{i}") for i in range(0, 200, 7)], "bk bigint, name string"
    )
    got = sorted(
        map(tuple, prefiltered_join(probe, build, "k", "bk").collect())
    )
    want = sorted(
        map(tuple, probe.join(build, probe.k == build.bk).collect())
    )
    assert got == want and len(got) > 0


def test_prefiltered_join_collisions_are_eliminated(spark):
    # 4 buckets force heavy collisions; exact join must still be exact
    probe = spark.createDataFrame([(i,) for i in range(100)], "k bigint")
    build = spark.createDataFrame([(5,), (50,)], "bk bigint")
    got = sorted(
        r["k"]
        for r in prefiltered_join(probe, build, "k", "bk", n_buckets=4).collect()
    )
    assert got == [5, 50]


def test_prefiltered_join_broadcasts_bucket_table(spark):
    probe = spark.createDataFrame([(i,) for i in range(50)], "k bigint")
    build = spark.createDataFrame([(1,)], "bk bigint")
    plan = prefiltered_join(probe, build, "k", "bk")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_prefiltered_join_rejects_unsound_join_type(spark):
    df = spark.createDataFrame([(1,)], "k bigint")
    with pytest.raises(ValueError):
        prefiltered_join(df, df, "k", "k", how="left_outer")


# ------------------------------------------------- property-based checks


def test_snapshot_diff_properties_vs_pandas(spark):
    """Randomized old/new snapshots: statuses and drift flags must
    match a pandas-computed reference, and the diff must partition the
    key universe (every key in either side appears exactly once)."""
    from hypothesis import given, settings, strategies as st

    vals = st.one_of(st.none(), st.integers(min_value=0, max_value=3))
    snap = st.lists(
        st.tuples(st.integers(min_value=0, max_value=15), vals, vals),
        min_size=0,
        max_size=12,
        unique_by=lambda t: t[0],
    )

    @settings(max_examples=8, deadline=None, derandomize=True)
    @given(old=snap, new=snap)
    def check(old, new):
        schema = "k bigint, x bigint, y bigint"
        o = spark.createDataFrame(old, schema) if old else spark.createDataFrame([], schema)
        n = spark.createDataFrame(new, schema) if new else spark.createDataFrame([], schema)
        got = {
            r["k"]: (r["status"], r["x_changed"], r["y_changed"])
            for r in snapshot_diff(o, n, ["k"], ["x", "y"]).collect()
        }
        om, nm = {t[0]: t[1:] for t in old}, {t[0]: t[1:] for t in new}
        assert set(got) == set(om) | set(nm)
        for k, (status, fx, fy) in got.items():
            if k not in om:
                assert status == "added" and not fx and not fy
            elif k not in nm:
                assert status == "removed" and not fx and not fy
            else:
                ex = om[k][0] != nm[k][0]
                ey = om[k][1] != nm[k][1]
                assert (fx, fy) == (ex, ey)
                assert status == ("changed" if ex or ey else "unchanged")

    check()


@pytest.mark.slow
def test_expectations_row_level_metrics_vs_python(spark):
    """Randomized frames: the compiled one-pass metrics must equal the
    per-row Python evaluation of the same predicates."""
    from hypothesis import given, settings, strategies as st

    rows = st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),
            st.one_of(st.none(), st.sampled_from(["a", "b", "zz"])),
            st.one_of(st.none(), st.floats(min_value=-5, max_value=15, allow_nan=False)),
        ),
        min_size=1,
        max_size=20,
    )

    @settings(max_examples=8, deadline=None, derandomize=True)
    @given(data=rows)
    def check(data):
        df = spark.createDataFrame(data, "id bigint, tag string, val double")
        rep = _report(
            spark,
            df,
            [
                Check("c", "completeness", "tag", 0.5),
                Check("u", "uniqueness", "id", 0.5),
                Check("s", "in_set", "tag", 0.5, values=("a", "b")),
                Check("r", "between", "val", 0.5, lo=0.0, hi=10.0),
            ],
        )
        n = len(data)
        exp = {
            "c": sum(1 for t in data if t[1] is not None) / n,
            "u": len({t[0] for t in data}) / n,
            "s": sum(1 for t in data if t[1] in ("a", "b")) / n,
            "r": sum(1 for t in data if t[2] is not None and 0.0 <= t[2] <= 10.0) / n,
        }
        for k, want in exp.items():
            assert rep[k][0] == pytest.approx(want, abs=1e-6), k
            assert rep[k][1] == (rep[k][0] >= 0.5)

    check()


@pytest.mark.slow
def test_negatives_invariants_random_graphs(spark):
    """Randomized rating graphs: negatives are never positives, come
    from the rated catalog, respect k, and are repartition-invariant."""
    from hypothesis import given, settings, strategies as st

    edges = st.lists(
        st.tuples(st.integers(min_value=0, max_value=8), st.integers(min_value=0, max_value=12)),
        min_size=3,
        max_size=40,
    )

    @settings(max_examples=8, deadline=None, derandomize=True)
    @given(pairs=edges, k=st.integers(min_value=1, max_value=4))
    def check(pairs, k):
        df = spark.createDataFrame(
            [(u, i, 1.0, 0) for u, i in pairs],
            "user_id bigint, item_id bigint, rating double, ts bigint",
        )
        neg = sample_negatives(df, k=k, n_proposals=8, seed=5).collect()
        pos = set(pairs)
        catalog = {i for _, i in pairs}
        per_user: dict = {}
        for r in neg:
            assert (r["user_id"], r["item_id"]) not in pos
            assert r["item_id"] in catalog
            per_user[r["user_id"]] = per_user.get(r["user_id"], 0) + 1
        assert all(v <= k for v in per_user.values())
        again = sample_negatives(df.repartition(7), k=k, n_proposals=8, seed=5).collect()
        assert sorted(map(tuple, neg)) == sorted(map(tuple, again))

    check()


# ------------------------------------------------------------------ st11


def test_stream_quality_gate_batching_invariant(spark, tmp_path):
    """The corpus-level report must be identical whether the corpus
    ingests as one micro-batch or three — the counters are mergeable
    integer sums (st11's contract)."""
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.streaming import quality as SQ

    docs = spark.createDataFrame(
        [(i, "en" if i % 3 else None, 40 + i * 7) for i in range(30)],
        "doc_id bigint, lang string, n_chars bigint",
    )
    checks = [
        Check("lang_complete", "completeness", "lang", 0.9),
        Check("len_band", "between", "n_chars", 0.5, lo=50.0, hi=150.0),
    ]

    def run(n_files, tag):
        in_dir = str(tmp_path / f"in_{tag}")
        met = str(tmp_path / f"met_{tag}")
        ck = str(tmp_path / f"ck_{tag}")
        docs.repartitionByRange(n_files, "doc_id").write.parquet(in_dir)
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(in_dir)
        )
        SQ.quality_gate_stream(stream, checks, met, ck).awaitTermination()
        log = spark.read.parquet(met)
        n_batches = log.select("batch_id").distinct().count()
        rep = sorted(map(tuple, SQ.corpus_metrics(spark, met, checks).collect()))
        return n_batches, rep

    nb1, rep1 = run(1, "one")
    nb3, rep3 = run(3, "three")
    assert nb1 == 1 and nb3 == 3  # the invariance claim was exercised
    assert rep1 == rep3
    got = {r[0]: (r[1], r[3]) for r in rep1}
    assert got["lang_complete"] == (pytest.approx(20 / 30, abs=1e-6), False)


def test_batch_check_counts_rejects_non_mergeable(spark):
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.streaming.quality import batch_check_counts

    df = spark.createDataFrame([(1,)], "id bigint")
    with pytest.raises(ValueError):
        batch_check_counts(df, [Check("u", "uniqueness", "id", 1.0)])


# ------------------------------------------------------------------ dp6


def test_training_triples_invariants(spark):
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators.negatives import training_triples

    r = _toy_ratings(spark)
    pos = {(row["user_id"], row["item_id"]) for row in r.collect()}
    rows = training_triples(r, k=3, n_proposals=10, seed=5, pos_seed=9).collect()
    assert rows
    for t in rows:
        assert (t["user_id"], t["pos_item"]) in pos       # pos is rated
        assert (t["user_id"], t["neg_item"]) not in pos   # neg is not
        assert t["pos_item"] != t["neg_item"]
    again = training_triples(r.repartition(5), k=3, n_proposals=10, seed=5, pos_seed=9).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_prefiltered_join_mixed_integral_key_types(spark):
    # int vs bigint keys: the plain equi-join matches via implicit cast,
    # so the hash pre-filter must too (F.hash is type-sensitive —
    # ADVICE r07: hash through a common widened type).
    probe = spark.createDataFrame([(i, f"p{i}") for i in range(20)], "k int, pv string")
    build = spark.createDataFrame([(i * 2, f"b{i}") for i in range(8)], "bk bigint, bv string")
    got = sorted(
        (r["pv"], r["bv"]) for r in prefiltered_join(probe, build, "k", "bk").collect()
    )
    want = sorted(
        (r["pv"], r["bv"])
        for r in probe.join(build, probe["k"] == build["bk"]).collect()
    )
    assert got == want and len(got) == 8


def test_prefiltered_join_rejects_incompatible_key_types(spark):
    probe = spark.createDataFrame([("1",)], "k string")
    build = spark.createDataFrame([(1,)], "bk bigint")
    with pytest.raises(ValueError, match="dtypes differ"):
        prefiltered_join(probe, build, "k", "bk")


def test_expectations_exact_gate_compares_integer_counts(spark):
    # 2,000,001 rows with ONE violator: the q6-rounded metric is 1.0
    # (bad fraction ~5e-7 rounds away) but an exact threshold-1.0 gate
    # must still fail — the pass rule is good == total, not the rounded
    # ratio (ADVICE r07).
    df = spark.range(2_000_001).select(
        F.when(F.col("id") > 0, F.col("id")).alias("v")  # id=0 -> null
    )
    rep = _report(
        spark,
        df,
        [
            Check("v_exact", "completeness", "v", 1.0),
            Check("v_soft", "completeness", "v", 0.99),
        ],
    )
    assert rep["v_exact"] == (1.0, False)  # reported metric rounds to 1.0
    assert rep["v_soft"] == (1.0, True)


def test_stream_quality_gate_retried_batch_not_double_counted(spark, tmp_path):
    # foreachBatch is at-least-once: replaying the same micro-batch id
    # must leave the metrics log (and the corpus report) unchanged.
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.streaming import quality as SQ

    docs = spark.createDataFrame(
        [(i, "en" if i % 4 else None) for i in range(40)],
        "doc_id bigint, lang string",
    )
    checks = [Check("lang_complete", "completeness", "lang", 0.5)]
    met = str(tmp_path / "met_retry")
    SQ.write_batch_counts(docs, checks, met, batch_id=0)
    once = sorted(map(tuple, SQ.corpus_metrics(spark, met, checks).collect()))
    SQ.write_batch_counts(docs, checks, met, batch_id=0)  # the retry
    twice = sorted(map(tuple, SQ.corpus_metrics(spark, met, checks).collect()))
    assert once == twice
    assert once[0][1] == pytest.approx(30 / 40, abs=1e-6)


def test_corpus_metrics_exact_gate_integer_compare(spark, tmp_path):
    # a fabricated log where good/total rounds to 1.0: exact gates
    # (threshold >= 1) must compare the integer sums and fail.
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.streaming import quality as SQ

    met = str(tmp_path / "met_exact")
    spark.createDataFrame(
        [("c_exact", 1_999_999, 2_000_000), ("c_soft", 1_999_999, 2_000_000)],
        "check string, good bigint, total bigint",
    ).write.parquet(met + "/batch_id=0")
    checks = [
        Check("c_exact", "completeness", "x", 1.0),
        Check("c_soft", "completeness", "x", 0.99),
    ]
    rep = {r["check"]: (r["metric"], r["passed"]) for r in SQ.corpus_metrics(spark, met, checks).collect()}
    assert rep["c_exact"] == (1.0, False)
    assert rep["c_soft"] == (1.0, True)


def test_merge_upsert_semantics_and_idempotence(spark):
    """MERGE INTO: matched keys replaced, unmatched inserted, flagged
    keys deleted — and applying the SAME change set twice yields the
    identical table (retry safety)."""
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators.reconcile import merge_upsert

    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k bigint, s string, v double",
    )
    changes = spark.createDataFrame(
        [
            (2, "B", 21.0, "upsert"),   # update
            (9, "n", 90.0, "upsert"),   # insert
            (3, "c", 30.0, "delete"),   # delete
        ],
        "k bigint, s string, v double, op string",
    )
    once = merge_upsert(base, changes, ["k"], op_col="op")
    got = {r.k: (r.s, r.v) for r in once.collect()}
    assert got == {1: ("a", 10.0), 2: ("B", 21.0), 9: ("n", 90.0)}
    twice = merge_upsert(once, changes, ["k"], op_col="op")
    assert {tuple(r) for r in twice.collect()} == {tuple(r) for r in once.collect()}


def test_merge_upsert_without_ops_is_pure_upsert(spark):
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators.reconcile import merge_upsert

    base = spark.createDataFrame([(1, 1.0), (2, 2.0)], "k bigint, v double")
    ch = spark.createDataFrame([(2, 9.0), (5, 5.0)], "k bigint, v double")
    got = {r.k: r.v for r in merge_upsert(base, ch, ["k"]).collect()}
    assert got == {1: 1.0, 2: 9.0, 5: 5.0}


def test_merge_upsert_null_op_is_upsert_not_dropped(spark):
    """ADVICE r10: with a plain != predicate a NULL op flag is
    NULL-false on BOTH branches, so the row vanished from the applied
    change set. The null-safe predicate treats missing ops as upserts
    — a CDC feed with absent op flags loses nothing."""
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators.reconcile import merge_upsert

    base = spark.createDataFrame([(1, 1.0), (2, 2.0)], "k bigint, v double")
    changes = spark.createDataFrame(
        [(2, 9.0, None), (5, 5.0, None), (1, 1.0, "delete")],
        "k bigint, v double, op string",
    )
    got = {r.k: r.v for r in merge_upsert(base, changes, ["k"], op_col="op").collect()}
    assert got == {2: 9.0, 5: 5.0}  # NULL-op rows applied, key 1 deleted


def test_scd2_apply_broadcasts_change_batch(spark):
    """ADVICE r10: broadcast on a full_outer join is silently ignored
    (no broadcast hash full-outer exists), so the old plan sort-merged
    the whole dimension. The split left-join + anti-join plan must
    contain broadcast joins and never shuffle-join the dimension."""
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators.reconcile import scd2_apply

    dim = spark.createDataFrame(
        [(1, "b", 50, None, True), (2, "x", 0, None, True)],
        "k bigint, attr string, valid_from bigint, valid_to bigint, is_current boolean",
    )
    changes = spark.createDataFrame(
        [(1, "c", 100), (9, "n", 100)], "k bigint, attr string, ts bigint"
    )
    out = scd2_apply(dim, changes, ["k"], ["attr"], ts_col="ts")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_scd2_apply_case_algebra_and_idempotence(spark):
    """SCD-2 apply: changed attrs close+open, equal attrs no-op, new
    keys open, history passes through untouched; re-applying the same
    batch changes nothing (the opened rows now EQUAL the batch)."""
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators.reconcile import scd2_apply

    dim = spark.createDataFrame(
        [
            (1, "a", 0, 50, False),   # closed history row
            (1, "b", 50, None, True), # current for key 1
            (2, "x", 0, None, True),  # current for key 2
        ],
        "k bigint, attr string, valid_from bigint, valid_to bigint, is_current boolean",
    )
    changes = spark.createDataFrame(
        [
            (1, "c", 100),  # differs -> close 'b' at 100, open 'c'
            (2, "x", 100),  # equal   -> no-op
            (9, "n", 100),  # new key -> first current row
        ],
        "k bigint, attr string, ts bigint",
    )
    out = scd2_apply(dim, changes, ["k"], ["attr"], ts_col="ts")
    rows = {(r.k, r.attr): (r.valid_from, r.valid_to, r.is_current) for r in out.collect()}
    assert rows == {
        (1, "a"): (0, 50, False),
        (1, "b"): (50, 100, False),
        (1, "c"): (100, None, True),
        (2, "x"): (0, None, True),
        (9, "n"): (100, None, True),
    }
    again = scd2_apply(out, changes, ["k"], ["attr"], ts_col="ts")
    assert {tuple(r) for r in again.collect()} == {tuple(r) for r in out.collect()}


def test_column_profiles_and_drift(spark):
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators.drift import (
        column_profiles,
        profile_drift,
    )

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, None, 30.0), (4, "a", None)],
        "id long, cat string, x double",
    )
    prof = {r.column: r for r in column_profiles(old).collect()}
    assert prof["id"].n_rows == 4 and prof["id"].n_null == 0
    assert prof["cat"].n_null == 1 and prof["cat"].n_distinct == 2
    assert prof["cat"].mean is None
    assert prof["x"].n_distinct == 3 and prof["x"].mean == 20.0

    # new snapshot: cat nulls spike, x mean shifts +50%, id stable
    new = spark.createDataFrame(
        [(1, None, 30.0), (2, None, 30.0), (3, None, 30.0), (4, "a", 30.0)],
        "id long, cat string, x double",
    )
    rep = {r.column: r for r in profile_drift(old, new).collect()}
    assert rep["id"].status == "stable"
    assert rep["cat"].null_drift and rep["cat"].status == "drifted"
    assert rep["x"].mean_drift and rep["x"].status == "drifted"


def test_profile_drift_schema_add_remove(spark):
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators.drift import profile_drift

    old = spark.createDataFrame([(1, 2.0)], "id long, gone double")
    new = spark.createDataFrame([(1, "x")], "id long, born string")
    rep = {r.column: r.status for r in profile_drift(old, new).collect()}
    assert rep == {"id": "stable", "gone": "removed", "born": "added"}


def test_profile_drift_cols_validation(spark):
    """ADVICE r11: a typo'd gate column must raise (it used to vanish
    from the report — a false PASS), but a column present in exactly
    ONE snapshot is the legitimate schema-drift case and must keep
    reporting 'added'/'removed' rather than raising."""
    import pytest as _pytest

    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators.drift import (
        column_profiles,
        profile_drift,
    )

    old = spark.createDataFrame([(1, 2.0)], "id long, gone double")
    new = spark.createDataFrame([(1, "x")], "id long, born string")
    with _pytest.raises(ValueError, match="neither snapshot"):
        profile_drift(old, new, cols=["id", "typo_col"])
    with _pytest.raises(ValueError, match="not in schema"):
        column_profiles(old, cols=["id", "typo_col"])
    # one-sided columns still profile on their side and report drift
    rep = {
        r.column: r.status
        for r in profile_drift(old, new, cols=["id", "gone", "born"]).collect()
    }
    assert rep == {"id": "stable", "gone": "removed", "born": "added"}
