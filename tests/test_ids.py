"""dense_ids (P6) — exactness of the two-pass bucketed rank vs the
naive single-partition window it replaces, across key types and sizes."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators.ids import (
    dense_ids,
    sampled_boundaries,
)


def _naive(df, cols, id_name):
    w = Window.orderBy(*cols)
    return df.withColumn(id_name, F.row_number().over(w) - 1)


@pytest.mark.parametrize("n_buckets", [1, 4, 32])
def test_string_key_matches_naive_window(spark, n_buckets):
    rows = [(f"name_{i % 7}_{i:04d}", i) for i in range(500)]
    df = spark.createDataFrame(rows, "name string, v bigint")
    got = {
        r.name: r.dense_id
        for r in dense_ids(df, ["name"], "dense_id", n_buckets=n_buckets).collect()
    }
    want = {r.name: r.dense_id for r in _naive(df, ["name"], "dense_id").collect()}
    assert got == want


def test_multi_column_order_matches_naive_window(spark):
    rows = [(f"g{i % 3}", f"t{i % 11}", i) for i in range(300)]
    df = spark.createDataFrame(rows, "a string, b string, v bigint")
    d = df.select("a", "b").dropDuplicates(["a", "b"])
    got = sorted(
        (r.a, r.b, r.i) for r in dense_ids(d, ["a", "b"], "i", n_buckets=4).collect()
    )
    want = sorted((r.a, r.b, r.i) for r in _naive(d, ["a", "b"], "i").collect())
    assert got == want


def test_numeric_key(spark):
    df = spark.createDataFrame([(i * 37 % 101,) for i in range(101)], "k bigint")
    got = sorted((r.k, r.i) for r in dense_ids(df, ["k"], "i").collect())
    assert got == [(k, k) for k in range(101)]


def test_tiny_input_single_bucket(spark):
    df = spark.createDataFrame([("b",), ("a",)], "k string")
    assert sampled_boundaries(df, "k") == []
    got = {r.k: r.i for r in dense_ids(df, ["k"], "i").collect()}
    assert got == {"a": 0, "b": 1}


def test_ids_are_contiguous_and_parallel(spark):
    """The plan must NOT contain a data-sized single-partition window:
    the only SinglePartition exchange allowed is the bucket-count one."""
    import contextlib
    import io

    df = spark.createDataFrame([(f"k{i:05d}",) for i in range(2000)], "k string")
    out = dense_ids(df, ["k"], "i", n_buckets=8)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    # count-table window is fine; the data path must be hashpartitioned
    assert plan.count("SinglePartition") <= 1
    ids = sorted(r.i for r in out.collect())
    assert ids == list(range(2000))
