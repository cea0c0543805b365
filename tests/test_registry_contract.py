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
