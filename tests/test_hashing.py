"""det_hash / det_hash_sql engine-parity: the SQL text must be a
faithful twin of the Spark expression for EVERY key type — negative
ints (ANSI % vs pmod), strings (md5 fallback), and multi-key mixes."""

import duckdb
import pytest
from pyspark.sql import functions as F

from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.functions import hashing as H


def _spark_hashes(spark, rows, schema, keys, seed):
    """{key tuple -> hash} (keyed, not sorted: engines disagree on
    VARCHAR sort order, not on values)."""
    df = spark.createDataFrame(rows, schema)
    cols = [F.col(k) for k in keys]
    return {
        tuple(r[k] for k in keys): r["h"]
        for r in df.select(*keys, H.det_hash(*cols, seed=seed).alias("h")).collect()
    }


def _duck_hashes(rows, schema_sql, keys, seed):
    con = duckdb.connect()
    con.execute(f"CREATE TABLE t ({schema_sql})")
    placeholders = ", ".join("?" for _ in rows[0])
    con.executemany(f"INSERT INTO t VALUES ({placeholders})", rows)
    expr = H.det_hash_sql(*keys, seed=seed)
    sel = ", ".join(keys)
    return {
        tuple(r[:-1]): r[-1]
        for r in con.execute(f"SELECT {sel}, {expr} AS h FROM t").fetchall()
    }


@pytest.mark.parametrize("seed", [0, 42, 7])
def test_negative_keys_match(spark, seed):
    rows = [(-5,), (-1,), (0,), (3,), (-100_000,), (99_999_999,)]
    got_s = _spark_hashes(spark, rows, "k bigint", ["k"], seed)
    got_d = _duck_hashes(rows, "k BIGINT", ["k"], seed)
    assert got_s == got_d
    assert all(0 <= h < H.MOD for h in got_s.values())


def test_string_keys_match(spark):
    rows = [("alpha",), ("beta",), ("42",), ("",), ("Ünïcode",)]
    got_s = _spark_hashes(spark, rows, "k string", ["k"], 42)
    got_d = _duck_hashes(rows, "k VARCHAR", ["k"], 42)
    assert got_s == got_d


def test_multi_key_mixed_sign_match(spark):
    rows = [(-3, 7), (4, -9), (-1, -1), (10, 20)]
    got_s = _spark_hashes(spark, rows, "a bigint, b bigint", ["a", "b"], 42)
    got_d = _duck_hashes(rows, "a BIGINT, b BIGINT", ["a", "b"], 42)
    assert got_s == got_d


def test_nonnegative_keys_unchanged_by_wrap():
    """The ((x%m)+m)%m wrap must be a no-op for the non-negative keys
    every existing oracle uses (their value hashes depend on it)."""
    con = duckdb.connect()
    old = (
        f"(((((k) % {H._KEY_MOD}) * {H._seed_mult(42, 0)}) % {H._KEY_MOD})"
        f" * {H._PRIMES[0]} + 42) % {H.MOD}"
    )
    new = H.det_hash_sql("k", seed=42)
    n = con.execute(
        f"SELECT count(*) FROM (SELECT unnest(range(0, 5000)) AS k) t "
        f"WHERE ({old}) <> ({new})"
    ).fetchone()[0]
    assert n == 0
