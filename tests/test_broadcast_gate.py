"""Runtime gate on the dedup chain's batch-side broadcasts
(VERDICT r14 item 3): the batch ≪ corpus contract is enforced, not
assumed — past the size bound every F.broadcast in the incremental
dedup operators degrades to an unhinted (planner-chosen shuffle) join,
and results are identical either way."""

import pytest
from pyspark.sql import functions as F

from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.functions.partitioning import (
    BROADCAST_BATCH_MAX_BYTES_CONF,
    batch_fits_broadcast,
)
from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators import (
    dedup as DD,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and dreams about chasing mice all day"
)


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    other = (
        "completely different text about spark dataframes shuffling "
        "partitions across executors with adaptive query execution plans"
    )
    # parquet-backed (not createDataFrame): a LogicalRDD without
    # propagated stats estimates Long.MaxValue, which is exactly the
    # fail-closed case — the gate's normal inputs (parquet scans,
    # streaming micro-batch frames) carry real size estimates
    p = str(tmp_path_factory.mktemp("bgate") / "corpus")
    spark.createDataFrame(
        [(1, BASE), (2, other)], "doc_id long, text string"
    ).write.parquet(p)
    return spark.read.parquet(p)


@pytest.fixture(scope="module")
def new_docs(spark, tmp_path_factory):
    near = BASE.replace("warm", "cold") + " tonight"
    fresh = (
        "a totally novel document mentioning satellites weather balloons "
        "and migratory birds crossing the continent in spring"
    )
    p = str(tmp_path_factory.mktemp("bgate") / "new_docs")
    spark.createDataFrame(
        [(10, BASE), (11, near), (12, fresh)], "doc_id long, text string"
    ).write.parquet(p)
    return spark.read.parquet(p)


def test_gate_passes_small_frame_and_fails_tiny_bound(spark, new_docs):
    assert batch_fits_broadcast(new_docs) is True
    assert batch_fits_broadcast(new_docs, max_bytes=1) is False


def test_gate_reads_session_conf(spark, new_docs):
    spark.conf.set(BROADCAST_BATCH_MAX_BYTES_CONF, "1")
    try:
        assert batch_fits_broadcast(new_docs) is False
    finally:
        spark.conf.unset(BROADCAST_BATCH_MAX_BYTES_CONF)
    assert batch_fits_broadcast(new_docs) is True


def _no_auto_broadcast(spark):
    """Context: disable planner auto-broadcast so the fallback path's
    plan really exercises shuffle joins (tiny test frames would
    otherwise be auto-broadcast below the 10 MB threshold)."""
    import contextlib

    @contextlib.contextmanager
    def ctx():
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            yield
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    return ctx()


def test_pairs_between_fallback_matches_broadcast_path(spark, new_docs, corpus):
    # cache_candidates=False: the CacheManager matches canonicalized
    # plans across calls, so the broadcast run's cached candidate frame
    # (with BroadcastHashJoins baked into its cached physical plan)
    # would be substituted into the fallback run's tree and defeat the
    # plan-shape assertion below
    kw = dict(bands=8, n_hashes=16, verify_threshold=0.3, cache_candidates=False)
    want = sorted(
        map(tuple, DD.minhash_lsh_pairs_between(
            new_docs, corpus, broadcast_batch=True, **kw
        ).select("new_id", "corpus_id").collect())
    )
    assert want  # fixture sanity: the near-dups are found
    with _no_auto_broadcast(spark):
        got_df = DD.minhash_lsh_pairs_between(
            new_docs, corpus, broadcast_batch=False, **kw
        )
        plan = got_df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        got = sorted(
            map(tuple, got_df.select("new_id", "corpus_id").collect())
        )
    assert got == want


def test_dedup_against_corpus_fallback_matches(spark, new_docs, corpus):
    kw = dict(bands=8, n_hashes=16, verify_threshold=0.3)
    want = sorted(
        r.doc_id
        for r in DD.dedup_against_corpus(
            new_docs, corpus, broadcast_batch=True, **kw
        ).collect()
    )
    with _no_auto_broadcast(spark):
        got = sorted(
            r.doc_id
            for r in DD.dedup_against_corpus(
                new_docs, corpus, broadcast_batch=False, **kw
            ).collect()
        )
    assert got == want


def test_greedy_state_drops_fallback_matches(spark, new_docs, corpus):
    state = DD.dedup_state_rows(
        corpus.withColumn("doc_id", F.col("doc_id")), bands=8, n_hashes=16
    ).withColumn("batch", F.lit(0)).unionByName(
        DD.dedup_state_rows(new_docs, bands=8, n_hashes=16).withColumn(
            "batch", F.lit(1)
        )
    ).cache()
    want = sorted(
        r.id
        for r in DD.greedy_state_dedup_drops(
            state, 1, verify_threshold=0.3, broadcast_batch=True
        ).collect()
    )
    assert want  # doc 10 (dup of 1) must drop
    with _no_auto_broadcast(spark):
        got = sorted(
            r.id
            for r in DD.greedy_state_dedup_drops(
                state, 1, verify_threshold=0.3, broadcast_batch=False
            ).collect()
        )
    assert got == want
