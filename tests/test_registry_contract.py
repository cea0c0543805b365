"""Driver-contract registry consistency.

The driver grades exactly what QUERIES/ORACLES declare, so drift here
(an oracle key without a query, a typo'd SQL that only fails at sweep
time, an undocumented rows-only entry) silently costs a round. These
checks are pure-metadata + DuckDB EXPLAIN — no Spark session needed.
"""

import inspect
import re

import duckdb

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
    "rec_als_top5",
}


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
    "rec_als_top5",
    "rec_node2vec_band",
    "rec_als_band",
    "rec_kge_transe_band",
}


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
