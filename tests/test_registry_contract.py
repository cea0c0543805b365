"""Driver-contract registry consistency.

The driver grades exactly what QUERIES/ORACLES declare, so drift here
(an oracle key without a query, a typo'd SQL that only fails at sweep
time, an undocumented rows-only entry) silently costs a round. These
checks are pure-metadata + DuckDB EXPLAIN — no Spark session needed.
"""

import inspect
import re

import duckdb
import pytest

from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.plans import (
    ORACLES,
    QUERIES,
)

SF = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)

# the documented stochastic models — the ONLY rows-only entries allowed
EXPECTED_ROWS_ONLY = {
    "rec_node2vec_top5",
    "rec_kge_transe_top5",
    "rec_kge_sharded_top5",
    "rec_als_top5",
    "rec_kge_sharded_complex_top5",
}


def test_splits_registry_names_dispatch():
    """SPLITS registry (VERDICT r12 item 6): every config-facing split
    method name resolves to a callable that reaches split_ratings'
    dispatch (bad args raise its ValueErrors, not KeyError/TypeError)."""
    import pytest

    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.plans.registries import SPLITS

    assert set(SPLITS) == {
        "random_by_ratio", "timestamp_by_ratio", "fixed_timestamp",
        "leave_one_out", "k_fold", "group_kfold", "dedup_aware",
        "rolling_origin", "purged_embargo",
    }
    with pytest.raises(ValueError, match="clusters"):
        SPLITS["dedup_aware"](None, p=0.2)
    with pytest.raises(ValueError, match="p must be"):
        SPLITS["random_by_ratio"](None, p=7.0)
    with pytest.raises(ValueError, match="k >= 2"):
        SPLITS["rolling_origin"](None, k=1)
    with pytest.raises(ValueError, match="k >= 2"):
        SPLITS["purged_embargo"](None, k=None)


def test_every_oracle_has_a_query():
    assert set(ORACLES) <= set(QUERIES), sorted(set(ORACLES) - set(QUERIES))


def test_rows_only_set_is_exactly_the_documented_models():
    assert set(QUERIES) - set(ORACLES) == EXPECTED_ROWS_ONLY


def test_query_names_are_wellformed():
    for name in QUERIES:
        assert re.fullmatch(r"[a-z][a-z0-9_]+", name), name


def test_query_callables_take_spark_and_sf_dir():
    for name, fn in QUERIES.items():
        params = inspect.signature(fn).parameters
        assert len(params) >= 2, f"{name}: expected (spark, sf_dir)"


# Entries whose *builder* eagerly trains a model (the documented
# stochastic paths) — skipped by the schema scan below to keep it at
# unit-test speed; they are still scanned by scripts/check_correctness.py,
# which enforces the same no-complex-type rule on every sweep.
EAGER_TRAINERS = {
    "rec_node2vec_top5",
    "rec_kge_transe_top5",
    "rec_kge_sharded_top5",
    "rec_als_top5",
    "rec_node2vec_band",
    "rec_als_band",
    "rec_kge_transe_band",
    "rec_kge_sharded_band",
}


@pytest.mark.slow
def test_no_registry_query_returns_complex_columns(spark):
    """The driver's oracle canonicalizer sorts rows before stringifying
    and crashes on array/map cells (CORRECTNESS_r04's mm3 red row) —
    so complex-typed output columns are banned repo-wide. Schema-only:
    builds each lazy plan at sf0.001 and inspects analyzed dtypes."""
    bad = {}
    for name, fn in QUERIES.items():
        if name in EAGER_TRAINERS:
            continue
        df = fn(spark, SF)
        complex_cols = [
            f.name
            for f in df.schema.fields
            if f.dataType.typeName() in ("array", "map", "struct")
        ]
        if complex_cols:
            bad[name] = complex_cols
    assert not bad, f"flatten these to scalar strings (a2_o1 pattern): {bad}"


@pytest.mark.slow
def test_every_oracle_sql_plans_in_duckdb():
    """EXPLAIN (plan, don't execute) every oracle against the real
    sf0.001 views — catches column/table typos and dialect errors at
    unit-test speed instead of at sweep time."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    bad = {}
    for name, sql in ORACLES.items():
        try:
            con.execute(f"EXPLAIN {sql}")
        except Exception as exc:  # noqa: BLE001 — collecting all failures
            bad[name] = str(exc).splitlines()[0]
    assert not bad, bad


# ---------------------------------------------------------------------------
# Transcendental guard (VERDICT r06 item 2 — the tx14 red-driver class).
#
# ln/log/exp/pow are not correctly-rounded IEEE ops; a ULP of libm
# variance under a rounded hash-compared column flips the value on one
# box only (tx14, red r05+r06, fixed by a division-only rank key).
# Any oracle twin that calls one must be in TRANSCENDENTAL_ALLOWLIST
# (plans/driver_queries.py) with a margin-audit justification
# (scripts/audit_round_margins.py).  sqrt and arithmetic are exempt —
# IEEE 754 requires them correctly rounded, so identical inputs give
# identical bits on every engine.

_TRANSCENDENTAL_RE = re.compile(
    r"\b(ln|log|log2|log10|log1p|exp|pow|power)\s*\(", re.I
)


def _oracle_transcendental_hits():
    return {
        name
        for name, sql in ORACLES.items()
        if _TRANSCENDENTAL_RE.search(sql)
    }


def test_no_unallowlisted_transcendentals_in_oracles():
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.plans import (
        TRANSCENDENTAL_ALLOWLIST,
    )

    hits = _oracle_transcendental_hits()
    # e3's log2 is pinned to a literal table (functions/pinned.py) —
    # its CASE fallback branch still greps as log2(, which is fine:
    # the fallback is unreachable for rank domains <= PINNED_LOG2_MAX,
    # so it earns a standing allowlist-free exemption here.
    hits -= {"e3_ndcg_at_5"}
    unlisted = hits - set(TRANSCENDENTAL_ALLOWLIST)
    assert not unlisted, (
        f"new transcendental on a hash-compared surface: {sorted(unlisted)} — "
        "either remove it (tx14's w/u treatment, functions/pinned.py "
        "table) or margin-audit it (scripts/audit_round_margins.py) "
        "and allowlist with justification"
    )


def test_transcendental_allowlist_has_no_stale_entries():
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.plans import (
        TRANSCENDENTAL_ALLOWLIST,
    )

    stale = set(TRANSCENDENTAL_ALLOWLIST) - _oracle_transcendental_hits()
    assert not stale, f"allowlisted but no transcendental in SQL: {sorted(stale)}"


def test_allowlisted_queries_are_covered_by_margin_audit():
    """Every allowlist entry whose justification cites the margin audit
    must actually be in the audit's query list (and vice versa)."""
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.plans import (
        TRANSCENDENTAL_ALLOWLIST,
    )
    import importlib.util
    import os as _os

    spec = importlib.util.spec_from_file_location(
        "audit_round_margins",
        _os.path.join(
            _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
            "scripts",
            "audit_round_margins.py",
        ),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert set(mod.AUDITED) == set(TRANSCENDENTAL_ALLOWLIST)
