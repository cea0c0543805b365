"""as-of join semantics (operators/asof.py).

Reference semantics: DuckDB ``l ASOF LEFT JOIN r ON l.by = r.by AND
l.t >= r.t`` — most recent right row at-or-before each left row.
The driver query ev4_asof_enrich cross-checks against DuckDB itself;
these tests pin the edge cases the oracle data may not contain.
"""

import pytest
from pyspark.sql import functions as F

from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators.asof import asof_join


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            # (id, key, t)
            (1, "a", 10),
            (2, "a", 20),
            (3, "a", 5),   # before any right row -> no match
            (4, "b", 100),
            (5, "c", 50),  # key with no right rows at all
        ],
        "id int, k string, t long",
    )
    right = spark.createDataFrame(
        [
            # (key, t, v, w)
            ("a", 10, 1.5, "x"),   # tie with left id=1 -> inclusive match
            ("a", 8, 9.9, "y"),
            ("a", 19, 2.5, None),  # NULL payload still matches (row semantics)
            ("b", 40, 7.0, "z"),
        ],
        "k string, t long, v double, w string",
    )
    return left, right


def _rows(df):
    return {r["id"]: (r["t_r"], r["v_r"], r["w_r"]) for r in df.collect()}


def test_backward_inclusive_match(spark, frames):
    left, right = frames
    out = asof_join(left, right, on="t", by=["k"], value_cols=["v", "w"], suffix="_r")
    got = _rows(out)
    assert got[1] == (10, 1.5, "x")        # tie at t=10 matches (>=)
    assert got[2] == (19, 2.5, None)       # latest prior row, NULL payload kept
    assert got[3] == (None, None, None)    # nothing at-or-before t=5
    assert got[4] == (40, 7.0, "z")
    assert got[5] == (None, None, None)    # key never seen on the right
    assert out.count() == left.count()     # left join: every left row once


def test_tolerance_voids_stale_matches(spark, frames):
    left, right = frames
    out = asof_join(
        left, right, on="t", by=["k"], value_cols=["v"], tolerance=2, suffix="_r"
    )
    got = {r["id"]: r["v_r"] for r in out.collect()}
    assert got[1] == 1.5      # gap 0 <= 2
    assert got[2] == 2.5      # gap 1 <= 2
    assert got[4] is None     # gap 60 > 2 -> voided
    assert got[3] is None and got[5] is None


def test_left_columns_pass_through_unchanged(spark, frames):
    left, right = frames
    out = asof_join(left, right, on="t", by=["k"], value_cols=["v"], suffix="_r")
    assert out.columns == ["id", "k", "t", "t_r", "v_r"]
    assert {r["id"] for r in out.collect()} == {1, 2, 3, 4, 5}


def test_single_shuffle_no_join_node(spark, frames):
    """The scalable claim: one exchange on the by-key, zero join
    operators (tagged union + window, not an inequality join)."""
    left, right = frames
    out = asof_join(left, right, on="t", by=["k"], value_cols=["v"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_latest_of_duplicate_right_ts_wins(spark):
    left = spark.createDataFrame([(1, "a", 10)], "id int, k string, t long")
    right = spark.createDataFrame(
        [("a", 10, 1.0), ("a", 10, 2.0)], "k string, t long, v double"
    )
    out = asof_join(left, right, on="t", by=["k"], value_cols=["v"], suffix="_r")
    # duplicate (by, t) rows: the operator keeps the LAST in sort order —
    # documented as caller-must-preaggregate for determinism; here both
    # orders collapse to one of the two values.
    assert out.collect()[0]["v_r"] in (1.0, 2.0)


def test_forward_inclusive_match(spark, frames):
    """direction='forward': earliest right row at-or-after, inclusive
    at equal timestamps, NULL when nothing follows."""
    left, right = frames
    got = {
        r.id: (r.t_right, r.v_right)
        for r in asof_join(
            left, right, on="t", by=["k"], value_cols=["v", "w"],
            direction="forward",
        ).collect()
    }
    assert got[1] == (10, 1.5)      # equal ts -> inclusive
    assert got[2] == (None, None)   # nothing at-or-after 20 for k=a... (19 < 20)
    assert got[3] == (8, 9.9)       # next right after 5
    assert got[4] == (None, None)   # right b@40 is before left 100
    assert got[5] == (None, None)   # no right rows for k=c


def test_nearest_prefers_closer_and_breaks_ties_backward(spark):
    left = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 14), (3, "a", 16), (4, "a", 15)],
        "id int, k string, t long",
    )
    right = spark.createDataFrame(
        [("a", 10, 1.0), ("a", 20, 2.0)], "k string, t long, v double"
    )
    got = {
        r.id: r.t_right
        for r in asof_join(
            left, right, on="t", by=["k"], value_cols=["v"], direction="nearest"
        ).collect()
    }
    assert got[1] == 10   # distance 0 backward
    assert got[2] == 10   # 4 back vs 6 forward
    assert got[3] == 20   # 6 back vs 4 forward
    assert got[4] == 10   # exact tie (5 vs 5) -> backward wins


def test_nearest_tolerance_both_sides(spark):
    left = spark.createDataFrame([(1, "a", 50)], "id int, k string, t long")
    right = spark.createDataFrame(
        [("a", 10, 1.0), ("a", 95, 2.0)], "k string, t long, v double"
    )
    with_tol = asof_join(
        left, right, on="t", by=["k"], value_cols=["v"],
        direction="nearest", tolerance=30,
    ).collect()[0]
    assert with_tol.t_right is None  # nearest is 40/45 away, > 30
    no_tol = asof_join(
        left, right, on="t", by=["k"], value_cols=["v"], direction="nearest"
    ).collect()[0]
    assert no_tol.t_right == 10


def test_directions_match_bruteforce_reference(spark):
    """Randomized pin of all three directions (+tolerance) against a
    brute-force argmin with OUR documented tie rule (nearest ties ->
    backward). Deterministic fixture via md5-free arithmetic."""
    import itertools

    lrows = [(i, f"k{i % 3}", (i * 37) % 101) for i in range(60)]
    rrows = [(f"k{j % 3}", (j * 53) % 97, float(j)) for j in range(40)]
    # one right row per (key, ts): keep max v like the driver queries do
    dedup = {}
    for k, t, v in rrows:
        dedup[(k, t)] = max(dedup.get((k, t), float("-inf")), v)
    rrows = [(k, t, v) for (k, t), v in dedup.items()]
    left = spark.createDataFrame(lrows, "id int, k string, t long")
    right = spark.createDataFrame(rrows, "k string, t long, v double")

    def brute(direction, tolerance):
        out = {}
        for i, k, t in lrows:
            cands = [(rt, v) for rk, rt, v in rrows if rk == k]
            if direction == "backward":
                cands = [c for c in cands if c[0] <= t]
                best = max(cands, key=lambda c: c[0], default=None)
            elif direction == "forward":
                cands = [c for c in cands if c[0] >= t]
                best = min(cands, key=lambda c: c[0], default=None)
            else:
                # nearest: min abs distance, tie -> backward (rt <= t)
                best = min(
                    cands, key=lambda c: (abs(c[0] - t), c[0] > t), default=None
                )
            if best is not None and tolerance is not None and abs(best[0] - t) > tolerance:
                best = None
            out[i] = best
        return out

    for direction, tol in itertools.product(
        ["backward", "forward", "nearest"], [None, 13]
    ):
        got = {
            r.id: (None if r.t_right is None else (r.t_right, r.v_right))
            for r in asof_join(
                left, right, on="t", by=["k"], value_cols=["v"],
                direction=direction, tolerance=tol,
            ).collect()
        }
        assert got == brute(direction, tol), f"{direction} tol={tol}"


def test_bad_direction_raises(spark, frames):
    left, right = frames
    with pytest.raises(ValueError, match="direction"):
        asof_join(left, right, on="t", by=["k"], value_cols=["v"], direction="sideways")
