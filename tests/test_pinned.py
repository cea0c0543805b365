"""functions/pinned.py — the literal-table transcendental pins.

The pin's whole argument is BIT-identity across engines: Python repr
-> shortest round-trip decimal -> correctly-rounding parsers on both
sides yield the same binary64. Assert that end to end: the value
DuckDB computes from the SQL twin's literal must equal (to the bit)
the Python double that generated it, for every table entry; and the
libm fallback branch must be unreachable on the pinned domain.
"""

import math
import struct

import duckdb
import pytest
from pyspark.sql import functions as F

from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.functions import (
    pinned as PIN,
)


def _bits(x: float) -> bytes:
    return struct.pack("<d", x)


def test_sql_literals_roundtrip_bit_exact_in_duckdb():
    con = duckdb.connect()
    expr = PIN.log2_int_pinned_sql("n")
    for n in range(2, PIN.PINNED_LOG2_MAX + 1):
        (got,) = con.execute(f"SELECT {expr} FROM (SELECT {n} AS n)").fetchone()
        assert _bits(got) == _bits(math.log2(n)), n


def test_spark_column_matches_python_bits(spark):
    df = spark.range(2, PIN.PINNED_LOG2_MAX + 1).select(
        F.col("id").alias("n"), PIN.log2_int_pinned(F.col("id")).alias("v")
    )
    for row in df.collect():
        assert _bits(row["v"]) == _bits(math.log2(row["n"])), row["n"]


def test_fallback_unreachable_on_rank_domain():
    # every nDCG call site uses positions 2..k+1 with k <= 32 — inside
    # the table. The fallback exists only for out-of-domain callers,
    # who must not put the result in a hash-compared column.
    assert PIN.PINNED_LOG2_MAX >= 33


def test_out_of_domain_falls_back_to_libm(spark):
    row = (
        spark.range(40, 41)
        .select(PIN.log2_int_pinned(F.col("id")).alias("v"))
        .collect()[0]
    )
    assert row["v"] == pytest.approx(math.log2(40), abs=1e-12)
