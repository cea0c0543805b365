import pytest
from pyspark.sql import functions as F

from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.functions import text as TX
from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.sources.typed_csv import (
    TypedHeaderError,
    parse_typed_header,
    read_typed_csv,
    write_typed_csv,
)


def test_tokens_and_count(spark):
    df = spark.createDataFrame([("Hello, World! 42 ",)], "text string")
    row = df.select(
        TX.tokens(F.col("text")).alias("t"), TX.token_count(F.col("text")).alias("n")
    ).collect()[0]
    assert row.t == ["hello", "world", "42"]
    assert row.n == 3


def test_lang_id(spark):
    df = spark.createDataFrame(
        [
            ("the cat and the dog of a house",),
            ("el perro y la casa de que si",),
            ("der hund und die katze ist gut",),
            ("zzz qqq xxx",),
        ],
        "text string",
    )
    out = [r[0] for r in df.select(TX.lang_id(F.col("text"))).collect()]
    assert out == ["en", "es", "de", "und"]


def test_quality_score_bounds(spark):
    df = spark.createDataFrame([("word " * 100,), ("!!!",)], "text string")
    vals = [r[0] for r in df.select(TX.quality_score(F.col("text"))).collect()]
    assert all(0.0 <= v <= 1.0 for v in vals)
    assert vals[0] > vals[1]


def test_fingerprint_order_sensitive(spark):
    df = spark.createDataFrame(
        [("alpha beta gamma",), ("gamma beta alpha",), ("alpha beta gamma",)], "text string"
    )
    vals = [r[0] for r in df.select(TX.doc_fingerprint(F.col("text"))).collect()]
    assert vals[0] == vals[2]
    assert vals[0] != vals[1]


def test_word_ngrams_short_doc(spark):
    df = spark.createDataFrame([("one two",), ("",)], "text string")
    vals = [r[0] for r in df.select(TX.word_ngrams(F.col("text"), 3)).collect()]
    assert vals == [[], []]


def test_typed_header_parse():
    assert parse_typed_header("item_id::string") == ("item_id", "string")
    assert parse_typed_header("tags::string_list") == ("tags", "string_list")
    with pytest.raises(TypedHeaderError):
        parse_typed_header("plain_column")
    with pytest.raises(TypedHeaderError):
        parse_typed_header("x::integer")


def test_typed_csv_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [("i1", 4.5, ["a", "b"]), ("i2", None, ["c"])],
        "item_id string, rating double, tags array<string>",
    )
    path = str(tmp_path / "typed")
    write_typed_csv(df, path)
    back = read_typed_csv(spark, path)
    assert set(back.columns) == {"item_id", "rating", "tags"}
    rows = {r.item_id: r for r in back.collect()}
    assert rows["i1"].rating == 4.5
    assert rows["i1"].tags == ["a", "b"]
    assert rows["i2"].rating is None


def test_typed_csv_legacy_backslash_dialect(spark, tmp_path):
    """ADVICE r13: pre-r13 write_typed_csv emitted Spark's default
    backslash escaping; the RFC 4180 default reader would misparse an
    embedded quote in such a file. escape='\\\\' reads the legacy
    dialect back correctly."""
    p = tmp_path / "legacy.csv"
    # Spark legacy dialect: quote escaped as \" inside a quoted field
    p.write_text('id::string,t::string\na,"say \\"hi\\" now"\n')
    legacy = read_typed_csv(spark, str(p), escape="\\")
    assert legacy.collect()[0].t == 'say "hi" now'
    # the RFC 4180 default reads doubled quotes (current writer)
    q = tmp_path / "rfc.csv"
    q.write_text('id::string,t::string\na,"say ""hi"" now"\n')
    assert read_typed_csv(spark, str(q)).collect()[0].t == 'say "hi" now'


def test_typed_csv_number_coercion(spark, tmp_path):
    p = tmp_path / "weird.csv"
    p.write_text("id::string,score::number\na,1.5\nb,not_a_number\n")
    df = read_typed_csv(spark, str(p))
    rows = {r.id: r.score for r in df.collect()}
    assert rows["a"] == 1.5
    assert rows["b"] is None  # coerced like pd.to_numeric(errors=...)


def test_scrub_pii_redacts_and_counts(spark):
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.functions import text as TX

    df = spark.createDataFrame(
        [(1, "mail a.user+tag@sub.example.org or visit https://ex.com/p?q=1 "
             "from 192.168.0.1 thanks"),
         (2, "nothing sensitive here")],
        "id int, t string",
    )
    n_e, n_u, n_i = TX.count_pii(F.col("t"))
    out = df.select(
        "id", TX.scrub_pii(F.col("t")).alias("clean"),
        n_e.alias("e"), n_u.alias("u"), n_i.alias("i"),
    ).orderBy("id").collect()
    assert out[0].e == 1 and out[0].u == 1 and out[0].i == 1
    clean = out[0].clean
    assert "<EMAIL>" in clean and "<URL>" in clean and "<IP>" in clean
    assert "@" not in clean and "192.168" not in clean
    assert out[1].clean == "nothing sensitive here"
    assert (out[1].e, out[1].u, out[1].i) == (0, 0, 0)


def test_pipeline_cli_end_to_end(spark, tmp_path):
    """scripts/pipeline.py composes dedup -> decontaminate -> scrub ->
    repetition filter -> sample -> chunk behind flags."""
    import importlib.util

    import os

    spec = importlib.util.spec_from_file_location(
        "pipeline_cli",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "scripts", "pipeline.py"),
    )
    cli = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cli)

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    in_dir = str(tmp_path / "docs_in")
    bench_dir = str(tmp_path / "bench")
    out_dir = str(tmp_path / "out")
    docs.filter(F.col("doc_id") % 20 != 3).write.parquet(in_dir)
    docs.filter(F.col("doc_id") % 20 == 3).write.parquet(bench_dir)

    args = cli.build_parser().parse_args([
        "-i", in_dir, "-o", out_dir,
        "--exact-dedup", "--benchmark", bench_dir, "--min-overlap", "2",
        "--scrub", "--sample", "en=0.6,und=1.0", "--chunk", "32", "--stride", "24",
    ])
    stats = cli.run(args, spark=spark)
    # monotone non-increasing pipeline (sf0.001 has no exact dups,
    # so dedup may be a no-op; sampling at 0.6 must strictly drop)
    assert stats["input"] >= stats["exact_dedup"] >= stats["decontaminate"]
    assert stats["sample"] < stats["decontaminate"]
    assert stats["chunks"] >= stats["sample"]          # >=1 chunk per doc
    assert stats["output_rows"] == stats["chunks"]
    out = spark.read.parquet(out_dir)
    assert set(out.columns) == {"id", "chunk_idx", "n_tokens", "chunk_text"}


def test_pipeline_cli_quota_and_shards(spark, tmp_path):
    """--quota caps each lang stratum at its N best docs; --shards
    writes a shard-partitioned layout with per-shard positions."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "pipeline_cli2",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "scripts", "pipeline.py"),
    )
    cli = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cli)

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    docs.select("doc_id", "text").write.parquet(in_dir)

    args = cli.build_parser().parse_args(
        ["-i", in_dir, "-o", out_dir, "--quota", "10", "--shards", "4"]
    )
    stats = cli.run(args, spark=spark)
    assert stats["quota"] <= stats["input"]
    assert stats["shards"] == 4 and stats["output_rows"] == stats["quota"]
    out = spark.read.parquet(out_dir)
    assert {"shard", "pos"} <= set(out.columns)
    assert out.select("shard").distinct().count() <= 4
    # per-lang cap of 10 held
    assert out.count() == stats["quota"]
    assert os.path.isdir(os.path.join(out_dir, "shard=0"))
    # positions are 1..n within each shard
    per = out.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n"), F.max("pos").alias("mx"), F.min("pos").alias("mn")
    ).collect()
    for r in per:
        assert (r.mn, r.mx) == (1, r.n)


def test_approx_percentile_close_to_exact(spark):
    """tx8's scale path: approx_percentile (t-digest, one pass, no
    per-group sort) stays within a few percent of the exact
    interpolated percentile on the documents fixture — the swap-in
    documented in tx8_corpus_profile."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    d = docs.select(TX.token_count(F.col("text")).alias("tc"))
    row = d.agg(
        F.expr("percentile(tc, array(0.5D, 0.9D, 0.99D))").alias("exact"),
        F.expr("approx_percentile(tc, array(0.5D, 0.9D, 0.99D), 10000)").alias("approx"),
    ).first()
    for e, a in zip(row.exact, row.approx):
        assert abs(a - e) <= max(0.05 * e, 2.0), (e, a)


def test_bpe_merges_match_classic_example(spark):
    """The Sennrich fixture (low/lower/newest/widest): merges must be
    (e,s) -> (es,t) -> (l,o) with counts 9, 9, 7 (tie e,s < s,t)."""
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators import bpe as BPE

    docs = spark.createDataFrame(
        [(1, " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3))],
        "doc_id long, text string",
    )
    got = [
        (r.step, r.left_sym, r.right_sym, r.merged, r.pair_count)
        for r in BPE.learn_bpe_merges(docs, n_merges=3).orderBy("step").collect()
    ]
    assert got == [
        (1, "e", "s", "es", 9),
        (2, "es", "t", "est", 9),
        (3, "l", "o", "lo", 7),
    ]


def test_bpe_segment_words_applies_merges_in_order(spark):
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators import bpe as BPE

    docs = spark.createDataFrame(
        [(1, "newest newest widest aaa")], "doc_id long, text string"
    )
    pieces = {
        r.word: list(r.pieces)
        for r in BPE.segment_words(docs, [("e", "s"), ("es", "t")]).collect()
    }
    assert pieces["newest"] == ["n", "e", "w", "est"]
    assert pieces["widest"] == ["w", "i", "d", "est"]
    # greedy non-overlapping: "aaa" under merge (a,a) -> [aa, a]
    seg = {
        r.word: list(r.pieces)
        for r in BPE.segment_words(docs, [("a", "a")]).collect()
    }
    assert seg["aaa"] == ["aa", "a"]


def test_register_views_sql_surface(spark):
    """`register_views` + `spark.sql` is the SQL-first entry point; it
    must go through the same shaped loaders as the DataFrame surface
    (events gets ts_ns + normalized ts) and agree with the DataFrame
    plans on real queries."""
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.sources import register_views
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.plans.driver_queries import (
        q6_forecast_revenue,
    )

    sf = "/root/testdata/sf0.001"
    register_views(spark, sf)
    # events view carries the shaped schema, not the raw file schema
    cols = spark.sql("SELECT * FROM events LIMIT 0").columns
    assert "ts_ns" in cols and cols[-1] == "ts"
    got = spark.sql(
        """
        SELECT CAST(sum(floor(l_extendedprice * 100) * floor(l_discount * 100))
                    AS DOUBLE) / 10000 AS revenue
        FROM lineitem
        WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
          AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
          AND l_discount >= 0.03 AND l_discount <= 0.07 AND l_quantity < 24
        """
    ).collect()[0].revenue
    want = q6_forecast_revenue(spark, sf).collect()[0].revenue
    assert got == want


def test_typed_header_schema_maps_reference_types():
    """typed_header_schema is the programmatic schema hook for the
    reference's `name::type` header convention (string / number /
    list) — callers that build a typed frame without reading a file
    use it directly."""
    from pyspark.sql import types as T

    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.sources.typed_csv import (
        typed_header_schema,
    )

    schema = typed_header_schema(["item_id::string", "score::number", "tags::string_list"])
    assert [f.name for f in schema.fields] == ["item_id", "score", "tags"]
    assert isinstance(schema["item_id"].dataType, T.StringType)
    assert isinstance(schema["score"].dataType, T.DoubleType)
    assert isinstance(schema["tags"].dataType, T.ArrayType)


def test_bpe_topv_matches_distributed_loop(spark):
    """learn_bpe_merges_topv (O(1) Spark jobs, in-driver loop over the
    bounded top-V vocab) must produce EXACTLY the merges of the
    per-merge distributed loop when max_vocab covers the vocabulary —
    including overlapping-pair counts and the greedy non-rescanning
    rewrite ('aaaa' -> two 'aa', not three)."""
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators import bpe as BPE

    docs = spark.createDataFrame(
        [
            ("d1", "low low low lower lower newest newest newest"),
            ("d2", "widest widest newest aaaa aaaa banana"),
        ],
        "doc_id string, text string",
    )
    dist = [tuple(r) for r in BPE.learn_bpe_merges(docs, n_merges=6).collect()]
    topv = [tuple(r) for r in BPE.learn_bpe_merges_topv(docs, n_merges=6).collect()]
    assert topv == dist
    assert len(topv) == 6


def test_bpe_batched_m1_equals_sequential(spark):
    """learn_bpe_merges_batched at batch_m=1 IS the per-merge loop:
    one accepted pair per distributed count, same (count desc, pair
    asc) tie-break — the fallback contract (VERDICT r11 item 4)."""
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators import bpe as BPE

    docs = spark.createDataFrame(
        [
            ("d1", "low low low lower lower newest newest newest"),
            ("d2", "widest widest newest aaaa aaaa banana"),
        ],
        "doc_id string, text string",
    )
    seq = [tuple(r) for r in BPE.learn_bpe_merges(docs, n_merges=6).collect()]
    one = [
        tuple(r)
        for r in BPE.learn_bpe_merges_batched(docs, n_merges=6, batch_m=1).collect()
    ]
    assert one == seq and len(one) == 6


def test_bpe_batched_equals_sequential_when_conflict_free(spark):
    """On a corpus whose top merges are symbol-DISJOINT and whose
    merged symbols spawn no competitive new pairs (2-char words merge
    to a single symbol), batched(m) reproduces sequential BPE exactly
    — disjoint pairs commute and their counts are invariant under
    each other's rewrites."""
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators import bpe as BPE

    docs = spark.createDataFrame(
        [("d1", " ".join(["ab"] * 10 + ["cd"] * 9 + ["ef"] * 8 + ["gh"] * 7))],
        "doc_id string, text string",
    )
    seq = [tuple(r) for r in BPE.learn_bpe_merges(docs, n_merges=4).collect()]
    bat = [
        tuple(r)
        for r in BPE.learn_bpe_merges_batched(docs, n_merges=4, batch_m=4).collect()
    ]
    assert bat == seq
    assert [(r[1], r[2], r[4]) for r in bat] == [
        ("a", "b", 10), ("c", "d", 9), ("e", "f", 8), ("g", "h", 7)
    ]


def test_bpe_batched_documented_divergence(spark):
    """THE divergence batching admits (documented in the docstring):
    sequential re-counts after every merge, so a pair involving a
    just-merged symbol can outrank the round's remaining candidates.
    'abc'x10 + 'de'x9: sequential merges (a,b) then the NEW pair
    (ab,c) (count 10 > 9); batched(2) accepts (a,b) and — (b,c)
    conflicting on b — (d,e) in the same round, never seeing (ab,c)."""
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators import bpe as BPE

    docs = spark.createDataFrame(
        [("d1", " ".join(["abc"] * 10 + ["de"] * 9))],
        "doc_id string, text string",
    )
    seq = [
        (r.left_sym, r.right_sym)
        for r in BPE.learn_bpe_merges(docs, n_merges=2).orderBy("step").collect()
    ]
    bat = [
        (r.left_sym, r.right_sym)
        for r in BPE.learn_bpe_merges_batched(docs, n_merges=2, batch_m=2)
        .orderBy("step")
        .collect()
    ]
    assert seq == [("a", "b"), ("ab", "c")]
    assert bat == [("a", "b"), ("d", "e")]


def test_bpe_batched_adaptive_restores_sequential(spark):
    """VERDICT r13 item 4: adaptive=True turns the documented
    divergence case EXACT — accepting (a,b) sets the exactness bound
    B_max to 10 (the (b,c) count touching b, exactly the pair whose
    residual/new form sequential would rank next), so (d,e)=9 cannot
    be committed; the round collapses to one accept and the learner
    finishes with the bounded-exact sequential continuation. The merge
    list (steps, pairs, counts) equals learn_bpe_merges' bit for bit.
    Default False keeps the divergent r13 behavior (previous test)."""
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators import bpe as BPE

    docs = spark.createDataFrame(
        [("d1", " ".join(["abc"] * 10 + ["de"] * 9))],
        "doc_id string, text string",
    )
    seq = [
        (r.step, r.left_sym, r.right_sym, r.merged, r.pair_count)
        for r in BPE.learn_bpe_merges(docs, n_merges=3).orderBy("step").collect()
    ]
    mit = [
        (r.step, r.left_sym, r.right_sym, r.merged, r.pair_count)
        for r in BPE.learn_bpe_merges_batched(
            docs, n_merges=3, batch_m=2, adaptive=True
        )
        .orderBy("step")
        .collect()
    ]
    assert mit == seq
    assert [(m[1], m[2]) for m in seq[:2]] == [("a", "b"), ("ab", "c")]


def test_bpe_batched_adaptive_keeps_independent_rounds_batched(spark):
    """The guard must NOT collapse genuinely independent merges: with
    disjoint symbol clusters nothing touches (a,b) except itself, so
    B_max stays at the window floor (0 here — the window holds the
    whole pair space) and the batch of 2 commits in ONE distributed
    round, still equal to sequential."""
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators import bpe as BPE

    docs = spark.createDataFrame(
        [("d1", " ".join(["ab"] * 40 + ["de"] * 9))],
        "doc_id string, text string",
    )
    seq = [
        (r.left_sym, r.right_sym, r.pair_count)
        for r in BPE.learn_bpe_merges(docs, n_merges=2).orderBy("step").collect()
    ]
    mit = [
        (r.left_sym, r.right_sym, r.pair_count)
        for r in BPE.learn_bpe_merges_batched(
            docs, n_merges=2, batch_m=2, adaptive=True
        )
        .orderBy("step")
        .collect()
    ]
    assert mit == seq == [("a", "b", 40), ("d", "e", 9)]


def test_bpe_batched_adaptive_self_pair_stays_sequential_prefix(spark):
    """Self-pair soundness (r14 review): merging (a,a) over a character
    run creates pairs — (aa,aa) from a,a,a,a — whose counts derive from
    the accept ITSELF, so the bound may not exclude the accept's own
    count when left == right. Before the fix, corpus "aaaa"x10+"de"x9
    committed [(a,a,30),(d,e,9)] in one round while sequential's merge
    2 is (aa,aa,10) — a non-prefix batch under adaptive=True's
    documented guarantee. With the accept's own count in B_max the
    round collapses at the self-pair and the continuation finishes
    exactly."""
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators import bpe as BPE

    docs = spark.createDataFrame(
        [("d1", " ".join(["aaaa"] * 10 + ["de"] * 9))],
        "doc_id string, text string",
    )
    seq = [
        (r.step, r.left_sym, r.right_sym, r.merged, r.pair_count)
        for r in BPE.learn_bpe_merges(docs, n_merges=3).orderBy("step").collect()
    ]
    assert [(m[1], m[2], m[4]) for m in seq] == [
        ("a", "a", 30),
        ("aa", "aa", 10),
        ("d", "e", 9),
    ]
    stats: dict = {}
    mit = [
        (r.step, r.left_sym, r.right_sym, r.merged, r.pair_count)
        for r in BPE.learn_bpe_merges_batched(
            docs, n_merges=3, batch_m=2, adaptive=True, stats=stats
        )
        .orderBy("step")
        .collect()
    ]
    assert mit == seq
    # the self-pair closed round 1 to a single accept -> continuation
    assert stats == {"count_rounds": 1, "head_merges": 0, "switched": True}


def test_bpe_batched_stats_counts_measured_rounds(spark):
    """The stats hook reports MEASURED distributed count-rounds (the
    probe's round economics must not be a ceil(merges/batch_m) formula
    — the adaptive guard can close rounds short). Two independent
    clusters, batch_m=2: one count round commits both merges, no
    switch."""
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators import bpe as BPE

    docs = spark.createDataFrame(
        [("d1", " ".join(["ab"] * 40 + ["de"] * 9))],
        "doc_id string, text string",
    )
    stats: dict = {}
    got = BPE.learn_bpe_merges_batched(
        docs, n_merges=2, batch_m=2, adaptive=True, stats=stats
    )
    assert got.count() == 2
    assert stats == {"count_rounds": 1, "head_merges": 2, "switched": False}


def test_bpe_batched_conflict_window_closes_round_early(spark):
    """When every further candidate conflicts with an accepted pair,
    the round closes with what it has and the NEXT round's fresh count
    picks up the rest — shorter rounds, never wrong merges. 'aaaa'
    corpus: round 1 accepts only (a,a) (all other candidates contain
    a), round 2 merges (aa,aa)."""
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators import bpe as BPE

    docs = spark.createDataFrame(
        [("d1", " ".join(["aaaa"] * 5))], "doc_id string, text string"
    )
    got = [
        (r.step, r.left_sym, r.right_sym)
        for r in BPE.learn_bpe_merges_batched(docs, n_merges=2, batch_m=4)
        .orderBy("step")
        .collect()
    ]
    assert got == [(1, "a", "a"), (2, "aa", "aa")]
    seq = [
        (r.step, r.left_sym, r.right_sym)
        for r in BPE.learn_bpe_merges(docs, n_merges=2).orderBy("step").collect()
    ]
    assert got == seq  # conflict-gating happens to preserve sequential here


def test_bpe_topv_truncation_bounds_vocab(spark):
    """max_vocab keeps only the top words by (cnt desc, word asc) —
    merges then reflect the truncated vocabulary only."""
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators import bpe as BPE

    docs = spark.createDataFrame(
        [("d1", "zz zz zz qx")], "doc_id string, text string"
    )
    got = [
        (r.left_sym, r.right_sym)
        for r in BPE.learn_bpe_merges_topv(docs, n_merges=1, max_vocab=1).collect()
    ]
    assert got == [("z", "z")]  # 'qx' fell outside the top-1 vocab


def test_download_registry():
    """S10 fetcher table (scripts/download_datasets.py): every dataset
    the reference's shell scripts fetch is present with a well-formed
    URL; the two reference-pinned md5s are carried over verbatim.
    (Offline test — the network path itself fails fast by design.)"""
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from scripts.download_datasets import DATASETS

    assert set(DATASETS) == {"ml-100k", "ml-1m", "lastfm", "book-crossing", "steam"}
    for name, (fname, url, md5, _) in DATASETS.items():
        assert url.startswith(("http://", "https://")), name
        if md5 is not None:
            assert len(md5) == 32 and all(c in "0123456789abcdef" for c in md5)
    assert DATASETS["ml-100k"][2] == "0e33842e24a9c977be4e0107933c0723"
    assert DATASETS["ml-1m"][2] == "c4d9eecfca2ab87c1945afe126590906"


def test_bpe_tokenize_pieces_reconstruct_and_rank(spark):
    """tx18's contract: pieces of every segmented word concatenate
    back to the word, and the piece-frequency report ranks merged
    symbols once their merges apply."""
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators import bpe as BPE
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [("the best test", ), ("test the rest", ), ("the the the", )],
        "text string",
    )
    merges = [
        (r.left_sym, r.right_sym)
        for r in BPE.learn_bpe_merges_topv(docs, n_merges=2).orderBy("step").collect()
    ]
    seg = BPE.segment_words(docs, merges)
    for r in seg.collect():
        assert "".join(r.pieces) == r.word
    px = seg.select("word", "cnt", F.explode("pieces").alias("piece"))
    agg = {
        r.piece: (r.n_words, r.total_cnt)
        for r in px.groupBy("piece")
        .agg(
            F.count_distinct("word").alias("n_words"),
            F.sum("cnt").alias("total_cnt"),
        )
        .collect()
    }
    # first learned merge is ('t','h') over this corpus ('th' in the x5,
    # then 'the' after merge 2) — the merged piece must appear in the
    # report and single letters consumed by it must not be overcounted
    assert any(len(p) > 1 for p in agg)
    merged_syms = {a + b for a, b in merges}
    assert merged_syms & set(agg)


def test_bpe_segment_words_scale_parity_small(spark):
    """segment_words_scale must reproduce segment_words EXACTLY —
    per-word pieces, including greedy-non-overlap and merge-order
    semantics — on learned merges AND on crafted edge lists (repeats,
    chained merges, absent pairs)."""
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators import bpe as BPE

    docs = spark.createDataFrame(
        [(1, "newest newest widest aaa aaaa abab low lower")],
        "doc_id long, text string",
    )
    for merges in (
        [("e", "s"), ("es", "t")],
        [("a", "a")],
        [("a", "a"), ("aa", "a")],                 # chained onto merged sym
        [("b", "c"), ("a", "b")],                  # later rank, earlier pair
        [("a", "b"), ("ab", "ab"), ("a", "b")],    # duplicate pair ranks
        [("z", "q")],                              # absent everywhere
    ):
        want = {
            r.word: list(r.pieces)
            for r in BPE.segment_words(docs, merges).collect()
        }
        got = {
            r.word: list(r.pieces)
            for r in BPE.segment_words_scale(docs, merges).collect()
        }
        assert got == want, merges


def test_bpe_segment_words_scale_plan_constant_in_merge_count(spark):
    """The scale encoder's REASON TO EXIST (VERDICT r09 item 1): the
    physical plan must not grow with the merge budget. At 1000 merges
    the chained-replace path would be a 1000-deep expression tree; the
    mapInPandas plan string must be the same size as at 2 merges, and
    the 1000-merge application must still execute correctly."""
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators import bpe as BPE

    docs = spark.createDataFrame(
        [(1, "newest newest widest aaa")], "doc_id long, text string"
    )
    big = [("e", "s"), ("es", "t")] + [
        (f"x{i}", f"y{i}") for i in range(998)  # 998 never-firing merges
    ]
    small_plan = BPE.segment_words_scale(docs, big[:2])._jdf.queryExecution().executedPlan().toString()
    big_plan = BPE.segment_words_scale(docs, big)._jdf.queryExecution().executedPlan().toString()
    assert len(big_plan) <= len(small_plan) + 50  # merge list not in the plan
    assert "ArrowEvalPython" in big_plan or "MapInPandas" in big_plan or "mapInPandas" in big_plan.lower()
    pieces = {
        r.word: list(r.pieces)
        for r in BPE.segment_words_scale(docs, big).collect()
    }
    assert pieces["newest"] == ["n", "e", "w", "est"]
    assert pieces["aaa"] == ["a", "a", "a"]


def test_bpe_batched_budget_divergence_golden(spark):
    """VERDICT r12 item 3: the batched learner's divergence vs EXACT
    sequential BPE, measured at a real budget (128 merges, batch_m=8)
    on the sf0.001 corpus reshaped to 500 ~300-char pseudo-words (the
    synthetic 31-word vocab exhausts in a few dozen merges otherwise;
    the operators are unchanged). The sequential reference is topv
    with max_vocab covering the FULL vocabulary — pinned identical to
    learn_bpe_merges by test_bpe_topv_full_vocab_equals_sequential.

    Pins the measured divergence PROFILE: merge ORDER diverges early
    (a batch commits the round's top-8 before sequential's re-count
    can promote a just-merged symbol's new pair — prefix agreement
    1/128) while the learned vocabulary is nearly unchanged
    (vocab-set Jaccard 0.9248 — the metric the downstream segmenter
    cares about). Values are exact: both learners are deterministic
    on a fixed corpus. The sf0.1 wall/round numbers live in
    SCALING.md's bpe_batched rows (scripts/bpe_budget_probe.py)."""
    from pyspark.sql import functions as F

    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators import bpe as BPE
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.sources.tables import load_table

    docs = (
        load_table(spark, "/root/testdata/sf0.001", "documents")
        .select(F.translate(F.col("text"), " ", "").alias("text"))
        .persist()
    )
    n_vocab = docs.distinct().count()
    assert n_vocab == 500
    seq = [
        (r.left_sym, r.right_sym)
        for r in BPE.learn_bpe_merges_topv(
            docs, n_merges=128, max_vocab=n_vocab + 1
        ).orderBy("step").collect()
    ]
    bat = [
        (r.left_sym, r.right_sym)
        for r in BPE.learn_bpe_merges_batched(
            docs, n_merges=128, batch_m=8
        ).orderBy("step").collect()
    ]
    docs.unpersist()
    assert len(seq) == len(bat) == 128
    prefix = next((i for i in range(128) if seq[i] != bat[i]), 128)
    step_agree = sum(1 for i in range(128) if seq[i] == bat[i]) / 128
    sv, bv = {a + b for a, b in seq}, {a + b for a, b in bat}
    jac = len(sv & bv) / len(sv | bv)
    assert prefix == 1
    assert round(step_agree, 4) == 0.1094
    assert round(jac, 4) == 0.9248
