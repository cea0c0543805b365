"""Real-data pins beyond ml-100k (VERDICT r12 item 7).

The reference commits the REAL DBpedia entity-link artifacts
(``datasets/*/processed/map.csv``) for five datasets and, for
ml-100k, the full enrichment table. These tests run the repo's OWN
readers over those committed files and pin the derivable
data-integration statistics against the reference's published
numbers:

* ``data_integration/metadata.md:66-73`` (ml-100k per-property entity
  counts) — all eight match the committed enriched.csv EXACTLY;
* ``data_integration/metadata.md:79`` (ml-1m ``item_id: 3347``) —
  matches the committed map.csv's matched-row count;
* ``README.md:53-55`` (#items column: 1681 / 3883 / 17632) — matches
  each map.csv's total row count. The README's #items-matched column
  (1462 / 3356 / 11815) predates the committed crawl: the committed
  files carry 1457 / 3347 / 10608 matches, and metadata.md agrees
  with the FILES (1457, 3347), so the files are pinned as truth and
  the README discrepancy is documented here rather than pinned.

book-crossing and steam ship plain (untyped) headers with
overwhelmingly empty URIs — pinned as reader-dialect coverage.
"""

import os

import pytest
from pyspark.sql import functions as F

REF = "/root/reference/datasets"

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{REF}/ml-1m/processed/map.csv"),
    reason="reference committed datasets not present",
)


def _map_stats(spark, path: str, typed: bool) -> tuple[int, int]:
    """(total items, matched items) through the repo's own readers."""
    if typed:
        from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.sources.typed_csv import read_typed_csv

        df = read_typed_csv(spark, path)
    else:
        from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.sources.raw_csv import read_csv

        df = read_csv(spark, path)
    matched = F.col("URI").isNotNull() & (F.col("URI") != "")
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(matched.cast("long")).alias("m"),
    ).collect()[0]
    return int(row.n), int(row.m)


def test_ml1m_map_match_counts(spark):
    total, matched = _map_stats(spark, f"{REF}/ml-1m/processed/map.csv", typed=True)
    assert total == 3883   # README.md:54 #items
    assert matched == 3347  # metadata.md:79 'item_id: 3347 (100.00%)'


def test_ml100k_map_match_counts(spark):
    total, matched = _map_stats(spark, f"{REF}/ml-100k/processed/map.csv", typed=True)
    assert total == 1681   # README.md:53 #items
    assert matched == 1457  # metadata.md:71 'subject: 1457 (100.00%)'


def test_lastfm_map_match_counts(spark):
    total, matched = _map_stats(spark, f"{REF}/lastfm/processed/map.csv", typed=True)
    assert total == 17632  # README.md:55 #items
    # committed-crawl truth; README's 11815 is an earlier crawl (see
    # module docstring) — pin the artifact, document the delta
    assert matched == 10608


@pytest.mark.parametrize(
    "name,total,matched",
    [("book-crossing", 271379, 31), ("steam", 48988, 10)],
)
def test_plain_header_maps_read(spark, name, total, matched):
    got = _map_stats(spark, f"{REF}/{name}/processed/map.csv", typed=False)
    assert got == (total, matched)


def test_ml100k_enrichment_property_coverage(spark):
    """All eight published per-property entity counts
    (metadata.md:66-73) reproduced from the committed enriched.csv by
    the typed reader: string columns count non-empty, string_list
    columns count rows whose split array carries a non-empty element
    (an empty cell splits to [''] — not a property occurrence)."""
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.sources.typed_csv import read_typed_csv

    df = read_typed_csv(spark, f"{REF}/ml-100k/processed/enriched.csv")
    want = {
        "abstract": 1453,
        "producer": 1120,
        "distributor": 1277,
        "writer": 1212,
        "cinematography": 1060,
        "subject": 1457,
        "starring": 1367,
        "director": 1358,
    }
    aggs = []
    for name, dt in df.dtypes:
        if name == "item_id":
            aggs.append(F.count(F.lit(1)).alias("_total"))
        elif dt.startswith("array"):
            present = F.exists(F.col(name), lambda x: x != "")
            aggs.append(F.sum(present.cast("long")).alias(name))
        else:
            present = F.col(name).isNotNull() & (F.col(name) != "")
            aggs.append(F.sum(present.cast("long")).alias(name))
    row = df.agg(*aggs).collect()[0].asDict()
    assert row.pop("_total") == 1457  # the matched-entity universe
    assert {k: int(v) for k, v in row.items()} == want
    # and the percentages the reference publishes next to each count
    assert round(100 * want["abstract"] / 1457, 2) == 99.73
    assert round(100 * want["cinematography"] / 1457, 2) == 72.75
