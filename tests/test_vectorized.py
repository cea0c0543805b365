"""The Arrow-batched pandas-UDF escape hatch: parity with the codegen
cosine path, and the documented float-order caveat."""

import pytest
from pyspark.sql import functions as F

from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.functions.vectorized import cosine_pandas_udf
from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators.similarity import _dot


def test_pandas_udf_cosine_matches_codegen_path(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    a = emb.limit(64).select(F.col("vec_id").alias("id_a"), F.col("v").alias("va"))
    b = emb.limit(64).select(F.col("vec_id").alias("id_b"), F.col("v").alias("vb"))
    pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))

    norm = lambda c: F.sqrt(F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x * x))
    codegen = pairs.select(
        "id_a", "id_b",
        (_dot(F.col("va"), F.col("vb")) / (norm(F.col("va")) * norm(F.col("vb")))).alias("cos"),
    )
    pudf = cosine_pandas_udf()
    vectorized = pairs.select(
        "id_a", "id_b", pudf(F.col("va"), F.col("vb")).alias("cos")
    )
    got = {(r.id_a, r.id_b): r.cos for r in vectorized.collect()}
    want = {(r.id_a, r.id_b): r.cos for r in codegen.collect()}
    assert set(got) == set(want) and len(got) > 1000
    for k in want:
        # numpy pairwise summation vs Spark's left fold: near-equal,
        # deliberately NOT bit-equal (why oracled queries stay on the
        # expression path)
        assert got[k] == pytest.approx(want[k], rel=1e-9, abs=1e-12)


def test_pandas_udf_handles_zero_vectors(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 0.0], [1.0, 2.0]), (2, [1.0, 0.0], [1.0, 0.0])],
        "id bigint, a array<double>, b array<double>",
    )
    pudf = cosine_pandas_udf()
    rows = {r.id: r.c for r in df.select("id", pudf("a", "b").alias("c")).collect()}
    assert rows[1] == 0.0  # zero-norm -> 0, no NaN/division error
    assert rows[2] == pytest.approx(1.0)
