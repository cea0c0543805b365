import pytest
from pyspark.sql import functions as F

from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators import integration as DI
from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.sources import raw_csv as RC


def test_title_normalize_and_year(spark):
    df = spark.createDataFrame(
        [
            ("Matrix, The (1999)",),
            ("Amelie (Fabuleux destin d'Amelie Poulain, Le) (2001)",),
            ("Toy Story (1995)",),
            ("No Year Here",),
        ],
        "t string",
    )
    out = df.select(
        DI.normalize_title("t").alias("title"), DI.extract_year("t").alias("year")
    ).collect()
    assert (out[0].title, out[0].year) == ("The Matrix", 1999)
    assert out[1].year == 2001  # alt-language parens stripped
    assert "(" not in out[1].title
    assert (out[2].title, out[2].year) == ("Toy Story", 1995)
    assert (out[3].title, out[3].year) == ("No Year Here", None)


def test_match_pattern(spark):
    df = spark.createDataFrame([("G.I. Jane!",)], "n string")
    assert df.select(DI.match_pattern("n").alias("p")).collect()[0].p == "^GI.*Jane$"


def test_flatten_json_attrs(spark):
    df = spark.createDataFrame(
        [('{"WiFi": "True", "Parking": "False", "Cards": "True"}',), (None,)],
        "attrs string",
    )
    out = df.select(DI.flatten_json_attrs("attrs").alias("a")).collect()
    assert out[0].a == ["Cards", "WiFi"]
    assert out[1].a is None


def test_link_entities_fuzzy_top1(spark):
    items = spark.createDataFrame(
        [(1, "cold widget"), (2, "warm bolt"), (3, "missing thing")],
        "item_id bigint, name string",
    )
    labels = spark.createDataFrame(
        [
            ("cold widget", "dbr:Cold_widget"),
            ("cold alt widget", "dbr:alt"),
            ("warm shiny bolt", "dbr:Warm_variant"),
        ],
        "label string, uri string",
    )
    out = {r.item_id: r.URI for r in DI.link_entities(items, labels).collect()}
    assert out[1] == "dbr:Cold_widget"  # exact beats variant (levenshtein)
    assert out[2] == "dbr:Warm_variant"  # pattern-matched variant wins
    assert out[3] is None  # unmatched -> null URI


def test_enrich_group_concat(spark):
    mapped = spark.createDataFrame([(1, "u1"), (2, "u2")], "item_id bigint, URI string")
    props = spark.createDataFrame(
        [("u1", "a", "x"), ("u1", "b", "x"), ("u1", "a", "y")],
        "URI string, subject string, director string",
    )
    row = {
        r.item_id: r
        for r in DI.enrich_group_concat(mapped, props, ["subject", "director"]).collect()
    }
    assert row[1].subject == "a::b" and row[1].director == "x::y"
    assert row[2].subject is None


def test_coverage_stats(spark):
    df = spark.createDataFrame(
        [(1, "x"), (2, None), (3, "y"), (4, None)], "a bigint, b string"
    )
    r = DI.coverage_stats(df, ["a", "b"]).collect()[0]
    assert (r.a, r.b) == (100.0, 50.0)


def test_read_csv_multichar_sep(spark, tmp_path):
    p = tmp_path / "ml1m.dat"
    p.write_text("1::10::5::978300760\n2::20::3::978302109\n")
    df = RC.read_csv_multichar_sep(
        spark, str(p), "::", ["user_id", "item_id", "rating", "timestamp"]
    )
    rows = sorted(df.collect(), key=lambda r: r.user_id)
    assert rows[0].user_id == "1" and rows[0].rating == "5"
    assert rows[1].item_id == "20"


def test_read_csv_injected_headers_pipe(spark, tmp_path):
    p = tmp_path / "u.item"
    p.write_text("1|Toy Story (1995)|genre\n2|Jumanji (1995)|genre\n")
    df = RC.read_csv(
        spark, str(p), sep="|", header=False, column_names=["id", "title", "g"]
    )
    assert df.count() == 2 and "title" in df.columns


def test_remote_fanout_with_failures(spark):
    ids = spark.createDataFrame([(str(i),) for i in range(6)], "item_id string")

    def fetch(key):
        if int(key) % 3 == 0:
            raise RuntimeError("endpoint timeout")
        return {"uri": f"dbr:{key}", "label": f"L{key}"}

    out = {
        r.item_id: (r.uri, r.label)
        for r in RC.remote_fanout(ids, fetch, ["uri", "label"], partitions=3).collect()
    }
    assert len(out) == 6
    assert out["1"] == ("dbr:1", "L1")
    assert out["3"] == (None, None)  # failed row -> nulls, task survives


def test_read_ndjson(spark, tmp_path):
    p = tmp_path / "yelp.json"
    p.write_text('{"business_id": "b1", "stars": 4.5}\n{"business_id": "b2", "stars": 3.0}\n')
    df = RC.read_ndjson(spark, str(p))
    assert df.count() == 2 and set(df.columns) == {"business_id", "stars"}


def test_read_ndjson_quarantines_corrupt_lines(spark, tmp_path):
    p = tmp_path / "dump.json"
    p.write_text(
        '{"id": 1, "name": "ok"}\n'
        "{this is not json}\n"
        '{"id": 2, "name": "fine"}\n'
        '{"id": 3, "name": "trunc...\n'
    )
    df = RC.read_ndjson(
        spark, str(p), schema="id long, name string", corrupt_col="_bad"
    )
    rows = df.collect()
    assert len(rows) == 4  # no line kills the read
    good = [r for r in rows if r._bad is None]
    bad = [r for r in rows if r._bad is not None]
    assert {r.id for r in good} == {1, 2}
    assert len(bad) == 2 and all(r.id is None for r in bad)
    # the raw line is preserved for the dead-letter sink
    assert any("not json" in r._bad for r in bad)


def test_read_ndjson_requires_schema_for_capture(spark, tmp_path):
    p = tmp_path / "d.json"
    p.write_text('{"a": 1}\n')
    with pytest.raises(ValueError):
        RC.read_ndjson(spark, str(p), corrupt_col="_bad")


# ---------------------------------------------------------------- WRatio (J7)


def test_wratio_components_classic_titles():
    """Scorer family on the exact failure shapes of plain levenshtein:
    reordered articles, parenthesized years, subtitle punctuation."""
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.functions import fuzzy as FZ

    # token-set treats reordered tokens as identical
    assert FZ.token_set_ratio("Shining, The (1980)", "The Shining") == 100
    # token-sort likewise for pure reorder
    assert FZ.token_sort_ratio("insects and angels", "angels and insects") == 100
    # partial: short vs long containing it
    assert FZ.partial_ratio("the shining", "the shining extended cut") == 100
    assert FZ.wratio("Shining, The (1980)", "The Shining") >= 86
    assert FZ.wratio("abcd", "zzzz") < 30


def test_wratio_extract_one_golden_fixture():
    """Golden: the chosen candidate per title on a fixture of
    reordered/parenthesized titles — cases where plain levenshtein
    picks a DIFFERENT (wrong) candidate, proving the scorers diverge
    exactly where the reference's extractOne semantics matter."""
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.functions import fuzzy as FZ

    def lev(a, b):
        m, n = len(a), len(b)
        prev = list(range(n + 1))
        for i in range(1, m + 1):
            cur = [i] + [0] * n
            for j in range(1, n + 1):
                cur[j] = min(
                    prev[j] + 1,
                    cur[j - 1] + 1,
                    prev[j - 1] + (a[i - 1] != b[j - 1]),
                )
            prev = cur
        return prev[n]

    cases = [
        # (query, candidates, expected WRatio winner)
        (
            "Shining, The (1980)",
            ["Shining Through", "The Shining", "Shine"],
            "The Shining",
        ),
        (
            "Postino, Il (1994)",
            ["Il Postino: The Postman", "Post Office", "Postman Pat"],
            "Il Postino: The Postman",
        ),
        (
            "Dr. Strangelove or: How I Learned to Stop Worrying and Love the Bomb (1964)",
            ["Dr. Strangelove", "Dr. Dolittle", "Strange Days"],
            "Dr. Strangelove",
        ),
    ]
    for query, cands, want in cases:
        got, score = FZ.extract_one(query, cands)
        assert got == want, (query, got, score)
        # and at least one case must diverge from levenshtein-best
    q, cands, want = cases[0]
    lev_best = min(cands, key=lambda c: (lev(q.lower(), c.lower()), len(c), c))
    assert lev_best != want  # levenshtein would have picked the decoy


def test_wratio_properties_hypothesis():
    """Property pins for the WRatio family over arbitrary text: range
    [0, 100], identity = 100, symmetry of the token-set/sort scorers,
    full_process idempotence, and wratio symmetry (the published
    algorithm is symmetric in its inputs — the length ratio and every
    constituent scorer are order-free)."""
    from hypothesis import given, settings, strategies as st

    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.functions import fuzzy as FZ

    texts = st.text(
        alphabet=st.characters(blacklist_categories=("Cs",)), max_size=40
    )

    @settings(max_examples=200, deadline=None)
    @given(texts, texts)
    def _props(a, b):
        w = FZ.wratio(a, b)
        assert 0 <= w <= 100
        assert w == FZ.wratio(b, a)  # symmetry
        assert 0 <= FZ.token_sort_ratio(a, b) <= 100
        assert FZ.token_set_ratio(a, b) == FZ.token_set_ratio(b, a)
        pa = FZ.full_process(a)
        assert FZ.full_process(pa) == pa  # idempotent preprocessor
        if FZ.full_process(a):
            assert FZ.wratio(a, a) == 100  # identity

    _props()


def test_wratio_rapidfuzz_parity_on_goldens():
    """When rapidfuzz is importable, its fast path (WRatio with
    default_process — ADVICE r04) must agree with the pure-Python
    fallback on the golden title fixtures: same chosen candidate, and
    scores within the ±1 int-rounding envelope."""
    import pytest

    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.functions import fuzzy as FZ

    if not FZ._HAVE_RAPIDFUZZ:
        pytest.skip("rapidfuzz not installed in this env")

    pairs = [
        ("Shining, The (1980)", "The Shining"),
        ("Shining, The (1980)", "Shining Through"),
        ("Postino, Il (1994)", "Il Postino: The Postman"),
        (
            "Dr. Strangelove or: How I Learned to Stop Worrying and Love the Bomb (1964)",
            "Dr. Strangelove",
        ),
        ("insects and angels", "angels and insects"),
        ("abcd", "zzzz"),
    ]
    try:
        FZ._HAVE_RAPIDFUZZ = False
        pure = [FZ.wratio(a, b) for a, b in pairs]
    finally:
        FZ._HAVE_RAPIDFUZZ = True
    fast = [FZ.wratio(a, b) for a, b in pairs]
    for (a, b), p, f in zip(pairs, pure, fast):
        assert abs(p - f) <= 1, (a, b, p, f)


def test_link_entities_wratio_scorer_end_to_end(spark):
    """The pandas_udf path through link_entities: scorer='wratio'
    engages, keeps the map.csv shape, and picks the token-set-best
    candidate among pattern-matched labels."""
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators.integration import link_entities

    items = spark.createDataFrame(
        [("1", "the shining"), ("2", "toy story"), ("3", "zzz unmatched")],
        "item_id string, name string",
    )
    labels = spark.createDataFrame(
        [
            ("The Shining", "uri:shining"),
            ("The Extremely Dark Shining", "uri:decoy"),
            ("Toy Story", "uri:toystory"),
        ],
        "label string, uri string",
    )
    out = {
        r.item_id: r.URI
        for r in link_entities(items, labels, scorer="wratio").collect()
    }
    assert out == {"1": "uri:shining", "2": "uri:toystory", "3": None}


def test_link_entities_scorers_deterministic(spark):
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators.integration import link_entities

    items = spark.createDataFrame([("1", "the king")], "item_id string, name string")
    labels = spark.createDataFrame(
        [("The King", "uri:b"), ("The King", "uri:a")], "label string, uri string"
    )
    for scorer in ("levenshtein", "wratio"):
        got = link_entities(items, labels, scorer=scorer).collect()
        assert got[0].URI == "uri:a"  # tie -> lexicographic URI
