import pytest
from pyspark.sql import functions as F

from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators import quality as Q


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam"),          # one 2-gram dominates
            (2, "a varied sentence with mostly unique words here"),
            (3, "x"),                                       # 1 token, no 2-grams
            (4, "ab cd ab cd ef gh"),                        # "ab cd" twice
        ],
        "doc_id int, text string",
    ).cache()


def test_repetition_stats_values(spark, docs):
    rows = {r.id: r for r in Q.repetition_stats(docs, n=2).collect()}
    assert rows[1].top_ngram == "spam spam" and rows[1].top_ngram_n == 5
    assert rows[1].distinct_frac == pytest.approx(1 / 6, abs=1e-6)
    assert rows[1].top_ngram_char_frac > 0.2
    assert rows[2].distinct_frac == 1.0 and rows[2].top_ngram_n == 1
    assert rows[3].top_ngram == "" and rows[3].top_ngram_n == 0
    assert rows[3].top_ngram_char_frac == 0.0
    assert rows[4].top_ngram == "ab cd" and rows[4].top_ngram_n == 2


def test_repetition_tie_break_lexicographic(spark):
    df = spark.createDataFrame(
        [(1, "b a b a c d c d")], "doc_id int, text string"
    )
    r = Q.repetition_stats(df, n=2).collect()[0]
    # "a b", "b a", "c d", "d c" counts: a b=2? tokens: b a b a c d c d
    # 2-grams: "b a","a b","b a","a c","c d","d c","c d" -> "b a"=2,"c d"=2
    assert r.top_ngram == "b a" and r.top_ngram_n == 2  # lexicographic min of the tied


def test_filter_by_repetition(spark, docs):
    kept = Q.filter_by_repetition(
        docs, n=2, max_top_ngram_char_frac=0.3, min_distinct_frac=0.3
    )
    ids = {r.doc_id for r in kept.collect()}
    assert 1 not in ids          # spam doc dropped on both rules
    assert 2 in ids
    # determinism under repartitioning
    again = Q.filter_by_repetition(
        docs.repartition(7), n=2, max_top_ngram_char_frac=0.3, min_distinct_frac=0.3
    )
    assert {r.doc_id for r in again.collect()} == ids


def test_unigram_logprob_values_and_ordering(spark):
    import math

    corpus = spark.createDataFrame(
        [
            (1, "the cat sat"),
            (2, "the the the"),          # all high-frequency tokens
            (3, "zq xv qj"),             # rare tokens
        ],
        "doc_id int, text string",
    )
    out = {r.id: r for r in Q.unigram_logprob(corpus, vocab_size=2, alpha=0.5).collect()}
    # corpus tf: the=4, cat/sat/zq/xv/qj=1 each; total=9; vocab = top-2
    # by (tf desc, tok asc) = {the:4, cat:1}; V=2, denom = 9 + 0.5*3
    denom = 9 + 0.5 * 3
    lp_the = math.log(4.5 / denom)
    lp_cat = math.log(1.5 / denom)
    lp_oov = math.log(0.5 / denom)
    assert out[2].mean_logp == round(lp_the, 6)
    assert out[1].mean_logp == round((lp_the + lp_cat + lp_oov) / 3, 6)
    assert out[3].mean_logp == round(lp_oov, 6)
    # frequent-token doc scores highest, gibberish lowest
    assert out[2].mean_logp > out[1].mean_logp > out[3].mean_logp
    assert out[1].n_tokens == 3
