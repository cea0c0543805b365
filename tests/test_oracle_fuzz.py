"""Cross-engine fuzz: the DuckDB-oracle gate on RANDOMIZED corpora.

The driver's correctness sweep runs each oracle against the one fixed
testdata set; a query could in principle agree there by coincidence.
These tests regenerate small random `documents` tables (seeded), write
them to parquet, and assert the Spark plan and the registered DuckDB
oracle still agree row-for-row — the same compare the sweep does, over
fresh data shapes (duplicate clusters, empty docs, unicode, skewed
vocab).
"""

import pytest

pd = pytest.importorskip("pandas")
import duckdb  # noqa: E402
import numpy as np  # noqa: E402

from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.plans import (  # noqa: E402
    ORACLES,
    QUERIES,
)

# documents-only queries that read nothing else
DOC_QUERIES = [
    "dd1_exact_dedup",
    "dd2_ngram_jaccard",
    "dd5_simhash",
    "dd14_containment",
    "tx17_tfidf_keywords",
    "tx2_vocab_topk",
    "dd16_winnowing",
    "tx20_dup_span_audit",
    # r12 births — documents-only, full cross-engine replay
    "tx21_token_budget_mix",
    "tx22_ngram_novelty",
    "dd17_minhash_calibration",
    "sp16_leakage_safe_split",
    "tx23_tokenizer_fertility",
]

VOCAB = (
    "the quick brown fox lazy dog spark shuffle partition executor "
    "corpus token shingle dedup quality lang mixture pack chunk "
    "café naïve 東京 data model train eval"
).split()


def _random_docs(seed: int, n: int):
    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n):
        kind = rng.rand()
        if kind < 0.15 and rows:
            # exact duplicate of an earlier doc
            rows.append((i, rows[rng.randint(len(rows))][1]))
        elif kind < 0.25:
            rows.append((i, ""))  # empty doc
        else:
            ln = rng.randint(3, 40)
            toks = rng.choice(VOCAB, size=ln, p=None)
            rows.append((i, " ".join(toks)))
    return rows


def _normalize(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


@pytest.mark.parametrize("seed", [11, 23])
@pytest.mark.slow
def test_doc_oracles_agree_on_random_corpora(spark, tmp_path, seed):
    from pyspark.sql import functions as F

    rows = _random_docs(seed, 40)
    sdf = (
        spark.createDataFrame(rows, "doc_id long, text string")
        .withColumn("lang", F.lit("en"))
        # a skewed 3-value source column so tx21's per-source budget
        # allocation sees uneven strata
        .withColumn(
            "source",
            F.concat(F.lit("s"), (F.pmod(F.col("doc_id") * 7, F.lit(10)) < 6).cast("int") + (F.pmod(F.col("doc_id") * 7, F.lit(10)) < 9).cast("int")),
        )
    )
    sf_dir = str(tmp_path / f"sf_fuzz_{seed}")
    import os

    os.makedirs(sf_dir, exist_ok=True)
    sdf.write.mode("overwrite").parquet(os.path.join(sf_dir, "documents.parquet"))

    con = duckdb.connect()
    # Spark writes a parquet DIRECTORY; DuckDB needs the file glob
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet/*.parquet')"
    )
    for name in DOC_QUERIES:
        spark_pdf = QUERIES[name](spark, sf_dir).toPandas()
        duck_pdf = con.execute(ORACLES[name]).df()
        a, b = _normalize(spark_pdf), _normalize(duck_pdf)
        assert sorted(a.columns) == sorted(b.columns), name
        assert len(a) == len(b), f"{name}: {len(a)} vs {len(b)}"
        if len(a):
            pd.testing.assert_frame_equal(a, b, check_dtype=False, atol=1e-9)


EVENT_QUERIES = [
    "a9_value_counts",
    "ev1_hourly_rollup",
    "a16_distinct_users",
    # late-r11 event analytics — all pure functions of the events
    # table, so the random-stream replay is a full cross-engine check
    "ev25_asof_nearest",
    "ev26_ohlc_downsample",
    "ev27_decay_engagement",
    "ev28_locf_ttl",
    "ev29_ab_ttest",
    "ev30_funnel_window",
    "dq5_profile_drift",
    "dq6_key_skew_report",  # r12 — events-only hot-key report
    "dq7_join_cardinality",  # r12 — events-only self-join pricing
    "dq8_value_histogram",  # r12 — events-only equi-width histogram
]


@pytest.mark.parametrize("seed", [7])
@pytest.mark.slow
def test_event_oracles_agree_on_random_streams(spark, tmp_path, seed):
    """Random events tables (micros timestamps — the exact layout that
    broke round 2) through the shaped loader AND the DuckDB oracle."""
    import datetime
    import os

    rng = np.random.RandomState(seed)
    base = datetime.datetime(2024, 1, 1)
    rows = []
    for i in range(300):
        rows.append(
            (
                i,
                base + datetime.timedelta(seconds=int(rng.randint(0, 86400 * 7))),
                int(rng.randint(1, 20)),
                str(rng.choice(["view", "click", "purchase"])),
                float(np.round(rng.rand() * 100, 2)),
                '{"k": %d}' % rng.randint(0, 5),
            )
        )
    sdf = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    )
    sf_dir = str(tmp_path / f"ev_fuzz_{seed}")
    os.makedirs(sf_dir, exist_ok=True)
    sdf.write.mode("overwrite").parquet(os.path.join(sf_dir, "events.parquet"))

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet/*.parquet')"
    )
    for name in EVENT_QUERIES:
        spark_pdf = QUERIES[name](spark, sf_dir).toPandas()
        duck_pdf = con.execute(ORACLES[name]).df()
        a, b = _normalize(spark_pdf), _normalize(duck_pdf)
        assert sorted(a.columns) == sorted(b.columns), name
        assert len(a) == len(b), f"{name}: {len(a)} vs {len(b)}"
        if len(a):
            pd.testing.assert_frame_equal(a, b, check_dtype=False, atol=1e-9)


# the full metric stack (dedup -> split -> popularity rec -> MAP/nDCG/
# MRR/HitRate) reads only lineitem + orders — randomizing those
# exercises the ENTIRE evaluation lineage against the SQL replay
METRIC_QUERIES = [
    # splits: det-hash membership must replay exactly in SQL on ANY
    # co-rating structure (ties in ts, duplicate pairs, tiny users)
    "sp1_random_global",
    "sp2_random_user",
    "sp3_temporal_global",
    "sp7_kfold_user",
    "sp8_validation_subsplit",
    "p5_dedup_ratings",
    "a2_o1_user_rating_lists",
    # recommenders + metrics: full train -> top-5 -> metric lineage
    "rec_popularity_top5",
    "rec_itemknn_top5",
    "e2_map_at_5",
    "e3_ndcg_at_5",
    "e4_mrr_at_5",
    "e5_hitrate_at_5",
    "e6_kfold_map_popularity",
    # late-r11 graph/CV analytics over the same randomized co-rating
    # structure: orientation, fixed-point RA weights, and the
    # purged-embargo rank arithmetic must replay on ANY tie pattern
    "g14_triangles",
    "g15_ra_link_prediction",
    "sp15_purged_embargo",
]


@pytest.mark.parametrize("seed", [13])
@pytest.mark.slow
def test_metric_oracles_agree_on_random_ratings(spark, tmp_path, seed):
    """Random (lineitem, orders) interaction tables through the full
    evaluation pipeline AND its DuckDB replay. The ratings lineage
    dedups by keep-last (ts, rating), splits by det-hash, trains the
    popularity recommender, and averages per-user metrics — agreement
    on arbitrary co-rating structure is much stronger evidence than
    the one fixed testdata set (ties, single-item users, duplicate
    (user, item) pairs with conflicting ratings are all generated
    here on purpose)."""
    import datetime
    import os

    rng = np.random.RandomState(seed)
    n_orders, n_li = 120, 600
    base = datetime.date(1995, 1, 1)
    orders = [
        (
            i,
            int(rng.randint(1, 25)),  # few users -> dense co-rating
            base + datetime.timedelta(days=int(rng.randint(0, 2000))),
        )
        for i in range(1, n_orders + 1)
    ]
    lineitem = [
        (
            int(rng.randint(1, n_orders + 1)),
            int(rng.randint(1, 40)),  # small catalog -> ties + dups
            float(rng.randint(1, 51)),
        )
        for _ in range(n_li)
    ]
    odf = spark.createDataFrame(
        orders, "o_orderkey long, o_custkey long, o_orderdate date"
    )
    ldf = spark.createDataFrame(
        lineitem, "l_orderkey long, l_partkey long, l_quantity double"
    )
    sf_dir = str(tmp_path / f"metric_fuzz_{seed}")
    os.makedirs(sf_dir, exist_ok=True)
    odf.write.mode("overwrite").parquet(os.path.join(sf_dir, "orders.parquet"))
    ldf.write.mode("overwrite").parquet(os.path.join(sf_dir, "lineitem.parquet"))

    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet/*.parquet')"
        )
    for name in METRIC_QUERIES:
        spark_pdf = QUERIES[name](spark, sf_dir).toPandas()
        duck_pdf = con.execute(ORACLES[name]).df()
        a, b = _normalize(spark_pdf), _normalize(duck_pdf)
        assert sorted(a.columns) == sorted(b.columns), name
        assert len(a) == len(b), f"{name}: {len(a)} vs {len(b)}"
        if len(a):
            pd.testing.assert_frame_equal(a, b, check_dtype=False, atol=1e-9)
