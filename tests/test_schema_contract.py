"""Schema contract over the driver-generated testdata.

Round-2 lesson: the driver regenerated /root/testdata with events.ts as
TIMESTAMP(MICROS) where it had been TIMESTAMP(NANOS), and the loader's
hard-coded assumption silently killed 12 queries, the bench, and the
test suite in the round's hard signals. ``shape_events`` is now
schema-adaptive (tests/test_events_loader.py), and THIS file pins every
remaining physical-type assumption the query registry makes — so a
future regeneration fails HERE, loudly and attributably, instead of
deep inside some query's analysis error.

If one of these asserts fires: the fix belongs in sources/tables.py
(adapt the loader like shape_events) or in the specific queries whose
assumption changed — not in this file.
"""

from pyspark.sql import types as T

from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.sources.tables import (
    TPCH_TABLES,
    load_table,
)

SF = "/root/testdata/sf0.001"

INTEGRALS = (T.LongType, T.IntegerType, T.ShortType)
TIMESTAMPS = (T.TimestampType, T.TimestampNTZType)


def _types(spark, name):
    return {f.name: f.dataType for f in load_table(spark, SF, name).schema.fields}


def test_all_tables_load(spark):
    for t in TPCH_TABLES:
        assert load_table(spark, SF, t).limit(1).count() >= 0


def test_events_contract(spark):
    t = _types(spark, "events")
    # the loader's normalized shape, whatever the physical ts type was
    assert isinstance(t["ts_ns"], T.LongType)
    assert isinstance(t["ts"], TIMESTAMPS)
    assert isinstance(t["event_id"], INTEGRALS)
    assert isinstance(t["user_id"], INTEGRALS)
    assert isinstance(t["event_type"], T.StringType)
    assert isinstance(t["value"], (T.DoubleType, T.FloatType))
    assert isinstance(t["props"], T.StringType)  # JSON text (di3)


def test_documents_contract(spark):
    t = _types(spark, "documents")
    assert isinstance(t["doc_id"], INTEGRALS)
    for c in ("text", "lang", "source"):
        assert isinstance(t[c], T.StringType)
    assert isinstance(t["n_chars"], INTEGRALS)


def test_embeddings_contract(spark):
    t = _types(spark, "embeddings")
    assert isinstance(t["vec_id"], INTEGRALS)
    assert isinstance(t["label"], INTEGRALS)
    emb = t["embedding"]
    assert isinstance(emb, T.ArrayType)
    # similarity ops cast elements to double explicitly; float or
    # double storage both satisfy the contract
    assert isinstance(emb.elementType, (T.FloatType, T.DoubleType))


def test_tpch_fact_contract(spark):
    li = _types(spark, "lineitem")
    assert isinstance(li["l_shipdate"], TIMESTAMPS)  # queries cast to date
    for c in ("l_quantity", "l_extendedprice", "l_discount", "l_tax"):
        assert isinstance(li[c], (T.DoubleType, T.FloatType))
    o = _types(spark, "orders")
    assert isinstance(o["o_orderdate"], TIMESTAMPS)
    assert isinstance(o["o_custkey"], INTEGRALS)


def test_load_table_memoizes_reader_per_session(spark):
    """The r14 reader memo: within one session, load_table returns the
    SAME immutable DataFrame object for the same (sf_dir, table) — the
    directory listing + footer schema read happen once, not per call
    (guide §6 file-listing reuse). Different tables and different
    sf_dirs stay distinct entries, and nothing is persisted: the memo
    holds a lazy plan, so is_cached must stay False."""
    a = load_table(spark, SF, "region")
    b = load_table(spark, SF, "region")
    assert a is b
    assert load_table(spark, SF, "nation") is not a
    other = "/root/testdata/sf0.01"
    import os

    if os.path.isdir(other):
        assert load_table(spark, other, "region") is not a
    assert not a.is_cached  # plan memo, never data caching
