"""Invariants for the event-analytics queries (funnel, retention,
percentiles) beyond the DuckDB hash oracle: structural properties that
must hold on ANY events table, checked at sf0.001.
"""

import pytest
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


def test_chi2_drift_hand_computed(spark):
    """chi2 vs hand arithmetic: ref {b0:8, b1:2} (n=10), cur {b0:3,
    b1:2, b2:1} (n=6) -> e0=4.8, e1=1.2; chi2 = (3-4.8)^2/4.8 +
    (2-1.2)^2/1.2 = 0.675 + 0.5333...; b2 is a NEW bucket (excluded
    from chi2, counted separately)."""
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators.drift import chi2_drift

    ref = spark.createDataFrame(
        [("a", 0)] * 8 + [("a", 1)] * 2, "g string, b int"
    )
    cur = spark.createDataFrame(
        [("a", 0)] * 3 + [("a", 1)] * 2 + [("a", 2)], "g string, b int"
    )
    rows = chi2_drift(ref, cur, "g", "b").collect()
    assert len(rows) == 1
    r = rows[0]
    want = (3 - 4.8) ** 2 / 4.8 + (2 - 1.2) ** 2 / 1.2
    assert (r.n_ref, r.n_cur, r.n_new_buckets) == (10, 6, 1)
    assert r.chi2 == pytest.approx(want, abs=1e-12)


def test_chi2_drift_identical_windows_score_zero(spark):
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators.drift import chi2_drift

    df = spark.createDataFrame(
        [("a", i % 3) for i in range(30)] + [("b", i % 2) for i in range(10)],
        "g string, b int",
    )
    rows = {r.g: r for r in chi2_drift(df, df, "g", "b").collect()}
    assert set(rows) == {"a", "b"}
    for r in rows.values():
        assert r.chi2 == 0.0 and r.n_new_buckets == 0


def test_chi2_drift_groups_without_reference_are_excluded(spark):
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators.drift import chi2_drift

    ref = spark.createDataFrame([("a", 0)], "g string, b int")
    cur = spark.createDataFrame([("a", 0), ("zzz", 1)], "g string, b int")
    got = {r.g for r in chi2_drift(ref, cur, "g", "b").collect()}
    assert got == {"a"}


def test_chi2_drift_vanished_group_flags_not_nan(spark):
    """A group present in ref but ABSENT from cur has n_cur=0, so every
    e(b)=0: the fold must not compute 0/0 = NaN (NaN fails every
    `chi2 > t` gate). The group comes back with chi2=0.0 and
    vanished=True so a gate on `vanished OR chi2 > t` still trips."""
    import math

    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators.drift import chi2_drift

    ref = spark.createDataFrame(
        [("gone", 0)] * 4 + [("gone", 1)] * 2 + [("kept", 0)] * 3,
        "g string, b int",
    )
    cur = spark.createDataFrame([("kept", 0)] * 3, "g string, b int")
    rows = {r.g: r for r in chi2_drift(ref, cur, "g", "b").collect()}
    assert set(rows) == {"gone", "kept"}
    gone = rows["gone"]
    assert (gone.n_ref, gone.n_cur, gone.vanished) == (6, 0, True)
    assert not math.isnan(gone.chi2) and gone.chi2 == 0.0
    kept = rows["kept"]
    assert (kept.vanished, kept.chi2) == (False, 0.0)


def test_psi_drift_hand_computed(spark):
    """psi/tv/chi2_sym vs plain-python arithmetic on the same smoothed
    (alpha=0.5, union-support) proportions: ref {b0:8, b1:2}, cur
    {b0:3, b1:2, b2:1} -> B=3 buckets."""
    import math

    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators.drift import psi_drift

    ref = spark.createDataFrame(
        [("a", 0)] * 8 + [("a", 1)] * 2, "g string, b int"
    )
    cur = spark.createDataFrame(
        [("a", 0)] * 3 + [("a", 1)] * 2 + [("a", 2)], "g string, b int"
    )
    rows = psi_drift(ref, cur, "g", "b").collect()
    assert len(rows) == 1
    r = rows[0]
    p = [(x + 0.5) / (10 + 0.5 * 3) for x in (8, 2, 0)]
    q = [(x + 0.5) / (6 + 0.5 * 3) for x in (3, 2, 1)]
    tv = 0.5 * sum(abs(pi - qi) for pi, qi in zip(p, q))
    x2 = sum((pi - qi) ** 2 / qi + (pi - qi) ** 2 / pi for pi, qi in zip(p, q))
    psi = sum((pi - qi) * math.log(pi / qi) for pi, qi in zip(p, q))
    assert (r.n_ref, r.n_cur, r.n_buckets) == (10, 6, 3)
    assert r.tv == pytest.approx(tv, abs=1e-12)
    assert r.chi2_sym == pytest.approx(x2, abs=1e-12)
    assert r.psi == pytest.approx(psi, abs=1e-12)
    assert r.psi_within_bounds
    # the sandwich itself, on the hand numbers
    assert 4 * tv * tv <= psi <= x2


def test_psi_drift_identical_windows_near_zero(spark):
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators.drift import psi_drift

    df = spark.createDataFrame(
        [("a", i % 3) for i in range(30)] + [("b", i % 2) for i in range(10)],
        "g string, b int",
    )
    rows = {r.g: r for r in psi_drift(df, df, "g", "b").collect()}
    assert set(rows) == {"a", "b"}
    for r in rows.values():
        assert r.tv == 0.0 and r.psi == 0.0 and r.psi_within_bounds


def test_psi_drift_one_sided_groups_flagged(spark):
    """A group missing from either window — the most-drifted case
    possible — must SURFACE as a flagged row with NULL statistics, not
    silently vanish from the report (VERDICT r09 item 3: the old
    filter made a team gating on ev20 alone blind to total
    disappearance)."""
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators.drift import psi_drift

    ref = spark.createDataFrame(
        [("a", 0), ("gone", 1), ("gone", 1), ("gone", 2)], "g string, b int"
    )
    cur = spark.createDataFrame([("a", 0), ("new", 1)], "g string, b int")
    rows = {r.g: r for r in psi_drift(ref, cur, "g", "b").collect()}
    assert set(rows) == {"a", "gone", "new"}
    healthy = rows["a"]
    assert (healthy.vanished, healthy.newborn) == (False, False)
    assert healthy.psi_within_bounds
    gone = rows["gone"]
    assert (gone.vanished, gone.newborn) == (True, False)
    assert (gone.n_ref, gone.n_cur) == (3, 0)
    assert gone.tv is None and gone.chi2_sym is None and gone.psi is None
    assert gone.psi_within_bounds is None
    new = rows["new"]
    assert (new.vanished, new.newborn) == (False, True)
    assert (new.n_ref, new.n_cur) == (0, 1)
    assert new.tv is None


def test_psi_drift_bounds_random(spark):
    """Pinsker/chi2 sandwich holds on randomized histograms (the
    boolean ev20 stakes its oracle hash on)."""
    import random

    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators.drift import psi_drift

    rng = random.Random(7)
    rows_ref, rows_cur = [], []
    for g in range(8):
        for b in range(6):
            rows_ref += [(f"g{g}", b)] * rng.randint(0, 20)
            rows_cur += [(f"g{g}", b)] * rng.randint(0, 20)
    ref = spark.createDataFrame(rows_ref, "g string, b int")
    cur = spark.createDataFrame(rows_cur, "g string, b int")
    out = psi_drift(ref, cur, "g", "b").collect()
    healthy = [r for r in out if not (r.vanished or r.newborn)]
    assert healthy and all(r.psi_within_bounds for r in healthy)


def test_cusum_changepoint_detects_injected_shift(spark):
    """A level shift injected at t=30 must alarm shortly after 30 and
    never before; a stationary control group must not alarm."""
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators.drift import cusum_changepoint

    rows = []
    for t in range(60):
        rows.append(("shifted", t, 10 if t < 30 else 25))
        rows.append(("flat", t, 10))
    df = spark.createDataFrame(rows, "g string, t bigint, n bigint")
    out = {r.g: r for r in cusum_changepoint(df, "g", "t", "n", ref_end=20).collect()}
    assert set(out) == {"shifted", "flat"}
    sh = out["shifted"]
    # ref window: t<20, total=200, n_ref=20 -> dev = n*20 - 200 - 50
    # pre-shift dev = -50/hour (no alarm), post-shift dev = +250/hour;
    # threshold 2*total_ref = 400 -> alarm on the 2nd shifted hour
    assert (sh.n_ref, sh.total_ref) == (20, 200)
    assert sh.first_alarm == 31 and sh.n_alarm_buckets == 60 - 31
    flat = out["flat"]
    assert flat.first_alarm == -1 and flat.n_alarm_buckets == 0
    assert flat.max_cusum == 0  # dev always negative -> floored at 0


def test_cusum_changepoint_matches_textbook_recursion(spark):
    """The windowed closed form C_t = S_t - min(0, min_j S_j) equals
    the sequential recursion max(0, C_{t-1} + dev_t) on random
    series."""
    import random

    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators.drift import cusum_changepoint

    rng = random.Random(3)
    rows = []
    series = {}
    for g in range(5):
        xs = [rng.randint(0, 20) for _ in range(40)]
        series[f"g{g}"] = xs
        rows += [(f"g{g}", t, x) for t, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "g string, t bigint, n bigint")
    out = {r.g: r for r in cusum_changepoint(df, "g", "t", "n", ref_end=15).collect()}
    for g, xs in series.items():
        total_ref, n_ref = sum(xs[:15]), 15
        slack = total_ref // 4
        c, cmax, first, n_alarm = 0, 0, -1, 0
        for t in range(15, 40):
            dev = xs[t] * n_ref - total_ref - slack
            c = max(0, c + dev)
            cmax = max(cmax, c)
            if c > 2 * total_ref:
                n_alarm += 1
                if first == -1:
                    first = t
        r = out[g]
        assert (r.max_cusum, r.first_alarm, r.n_alarm_buckets) == (cmax, first, n_alarm)
        assert (r.n_ref, r.total_ref) == (n_ref, total_ref)


def test_cusum_changepoint_empty_reference_group_excluded(spark):
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators.drift import cusum_changepoint

    df = spark.createDataFrame(
        [("late", 25, 5), ("ok", 1, 5), ("ok", 25, 5)], "g string, t bigint, n bigint"
    )
    got = {r.g for r in cusum_changepoint(df, "g", "t", "n", ref_end=10).collect()}
    assert got == {"ok"}


def test_overlap_sketch_band_exact_intersection(spark):
    """a21's inclusion-exclusion intersection must equal the direct
    per-pair distinct-user intersection, with the sketch boolean
    holding."""
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.plans.driver_queries import a21_overlap_sketch_band

    rows = a21_overlap_sketch_band(spark, SF).collect()
    assert rows and all(r.overlap_within_band for r in rows)
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.sources.tables import load_table

    e = load_table(spark, SF, "events").select("event_type", "user_id").distinct()
    by_type = {}
    for r in e.collect():
        by_type.setdefault(r.event_type, set()).add(r.user_id)
    for r in rows:
        a, b = by_type[r.type_a], by_type[r.type_b]
        assert r.type_a < r.type_b
        assert (r.n_a, r.n_b) == (len(a), len(b))
        assert r.n_union == len(a | b)
        assert r.n_inter == len(a & b)
    # all C(5,2) unordered pairs exactly once
    assert len(rows) == len(by_type) * (len(by_type) - 1) // 2


def test_seasonal_mad_anomalies_hand_computed(spark):
    """MAD rule on a hand profile: a 10x spike over a flat baseline
    flags (mad=0 -> any deviation trips); a mild wobble within
    3*1.4826*mad does not; the flagged row carries the exact med/mad."""
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators.drift import seasonal_mad_anomalies

    rows = []
    # group A, slot 1: six flat days + one spike -> med 10, mad 0
    for d in range(6):
        rows.append(("A", d, 1, 10))
    rows.append(("A", 6, 1, 100))
    # group A, slot 2: wobble 9..13 -> med 11, adevs {2,1,0,1,2} mad 1
    # threshold 3*1.4826 = 4.4478 -> nothing flags
    for d, n in enumerate([9, 10, 11, 12, 13]):
        rows.append(("A", d, 2, n))
    df = spark.createDataFrame(rows, "g string, day bigint, slot bigint, n bigint")
    got = seasonal_mad_anomalies(df, "g", "day", "slot", "n", z=3.0).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.g, r.day, r.slot, r.n) == ("A", 6, 1, 100)
    assert (r.med, r.mad, r.n_days) == (10.0, 0.0, 7)


def test_seasonal_mad_anomalies_robust_to_the_outlier_itself(spark):
    """The point of median/MAD over mean/std: the spike must not drag
    its own baseline. With mean/std the same spike would sit at ~2.4
    sigma and pass; the MAD profile flags it."""
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators.drift import seasonal_mad_anomalies

    rows = [("A", d, 0, n) for d, n in enumerate([10, 11, 10, 9, 10, 11, 60])]
    df = spark.createDataFrame(rows, "g string, day bigint, slot bigint, n bigint")
    got = seasonal_mad_anomalies(df, "g", "day", "slot", "n", z=3.0).collect()
    assert [(r.day, r.n) for r in got] == [(6, 60)]


def test_rolling_reach_hand_computed(spark):
    """7-day rolling distinct reach via the x7 fan-out: hand data
    where users overlap across days, verifying dedup within the
    window and the full-window-only output contract."""
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.plans.driver_queries import ev24_rolling_reach
    import pyspark.sql.functions as _F

    # build a tiny parquet events table: day d = user set
    import tempfile, os
    days = {0: [1, 2], 1: [2], 2: [3], 3: [], 4: [1], 5: [4], 6: [2, 4],
            7: [5], 8: [1]}
    rows = []
    eid = 0
    for d, users in days.items():
        for u in users:
            rows.append((eid, u, "view", float(u), d * 86400_000_000_000 + 1))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, event_type string, value double, ts_ns bigint"
    ).withColumn("ts", _F.timestamp_micros(_F.expr("ts_ns div 1000")))
    tmp = tempfile.mkdtemp()
    df.drop("ts_ns").withColumn("ts", _F.col("ts")).write.parquet(os.path.join(tmp, "events.parquet"))
    got = {r.day: r.reach_7d for r in ev24_rolling_reach(spark, tmp).collect()}
    # day 6 window [0..6]: users {1,2,3,4} = 4
    # day 7 window [1..7]: users {2,3,1,4,5} = 5
    # day 8 window [2..8]: users {3,1,4,2,5} = 5
    assert got == {6: 4, 7: 5, 8: 5}
