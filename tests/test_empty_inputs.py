"""Empty-input robustness: every pipeline operator must return an
empty (correctly-typed) result on an empty corpus, not throw — at
100 TB, empty partitions, empty date slices, and freshly-created
tables are routine inputs."""

import pytest
from pyspark.sql import functions as F

from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators import (
    dedup as DD,
    packing as PK,
    quality as Q,
    similarity as SIM,
)
from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators.splits import stratified_sample


@pytest.fixture(scope="module")
def empty_docs(spark):
    return spark.createDataFrame([], "doc_id bigint, text string")


@pytest.fixture(scope="module")
def some_docs(spark):
    return spark.createDataFrame(
        [(1, "one small doc here")], "doc_id bigint, text string"
    )


@pytest.fixture(scope="module")
def empty_emb(spark):
    return spark.createDataFrame([], "vec_id bigint, embedding array<double>")


def test_dedup_ops_on_empty(spark, empty_docs, some_docs):
    assert DD.exact_dedup(empty_docs).count() == 0
    assert DD.ngram_jaccard_pairs(empty_docs).count() == 0
    assert DD.minhash_signatures(empty_docs).count() == 0
    assert DD.simhash(empty_docs).count() == 0
    assert DD.contamination_pairs(empty_docs, some_docs).count() == 0
    assert DD.contamination_pairs(some_docs, empty_docs).count() == 0
    assert DD.decontaminate(some_docs, empty_docs).count() == 1


def test_text_pipeline_ops_on_empty(spark, empty_docs):
    assert Q.repetition_stats(empty_docs).count() == 0
    assert Q.unigram_logprob(empty_docs).count() == 0
    assert PK.pack_sequences(empty_docs).count() == 0
    assert PK.chunk_documents(empty_docs).count() == 0
    assert stratified_sample(
        empty_docs.withColumn("lang", F.lit("en")), "lang", {"en": 1.0},
        key_cols=["doc_id"],
    ).count() == 0


def test_similarity_ops_on_empty(spark, empty_emb):
    q = empty_emb
    assert SIM.cosine_topk(empty_emb, q).count() == 0
    assert SIM.cosine_lsh_topk(empty_emb, q, n_tables=2).count() == 0
    assert DD.embedding_near_dups(empty_emb).count() == 0
    assert SIM.ivf_topk(empty_emb, empty_emb).count() == 0
