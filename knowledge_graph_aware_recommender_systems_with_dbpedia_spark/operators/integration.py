"""Data-integration transforms — SURVEY §2.2 P7-P10, §2.3 J7, §2.6 U1.

The reference converts each raw dataset into the standardized schema
and entity-links items to DBpedia (``data_integration/datasets/*``).
Everything here is JVM-side column expressions or joins — no Python
row loops; the only Python on the hot path is nowhere.

Entity linking is **offline-first** (SURVEY §7 phase 8): instead of a
live SPARQL call per item (movielens.py:107-131), candidates come from
a labels/redirects dump DataFrame — direct-label matches unioned with
redirect matches (U1, the SPARQL ``UNION`` of movielens.py:31-46) —
and the per-item winner is the fuzzy-closest candidate (J7,
``process.extractOne`` at movielens.py:126-131) expressed as a scored
row_number over a broadcast-able join at 100 TB scale — codegen
levenshtein by default, or the reference's actual WRatio semantics
(``functions/fuzzy.py``) via an Arrow-batched pandas_udf.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# P9 punctuation set: string.punctuation, the reference's translation
# table (dataset.py:35)
_PUNCT = r"""!"#$%&'()*+,-./:;<=>?@[\]^_`{|}~"""


def extract_year(title) -> "F.Column":
    """P8 (movielens.py:100-105): regex ``\\((\\d{4})\\)`` -> int."""
    return F.regexp_extract(title, r"\((\d{4})\)", 1).try_cast("int")


def normalize_title(title) -> "F.Column":
    """P7 (movielens.py:81-98): strip the ``(yyyy)`` year and any
    alternative-language parentheticals, then reorder trailing
    articles: ``"X, The" -> "The X"``.

    Pure regexp/concat expressions — runs inside codegen.
    """
    base = F.trim(F.regexp_replace(title, r"\s*\([^)]*\)", ""))
    article = F.regexp_extract(base, r",\s*(The|A|An|La|Le|Les|Il|El)$", 1)
    stem = F.regexp_replace(base, r",\s*(The|A|An|La|Le|Les|Il|El)$", "")
    return F.when(article != "", F.concat(article, F.lit(" "), stem)).otherwise(base)


def match_pattern(name) -> "F.Column":
    """P9 (movielens.py:140-150): strip punctuation, spaces -> ``.*``,
    anchor with ^ $ — the regex sent to SPARQL ``FILTER regex`` or run
    against an offline labels dump via ``rlike``."""
    cleaned = F.trim(F.translate(name, _PUNCT, ""))
    return F.concat(F.lit("^"), F.regexp_replace(cleaned, r"\s+", ".*"), F.lit("$"))


def flatten_json_attrs(attrs) -> "F.Column":
    """P10 (yelp.py:82-93): JSON dict of flags -> sorted list of keys
    whose value is 'True'. ``from_json`` to a map + ``map_filter`` —
    JVM-side, no UDF."""
    m = F.from_json(attrs, "map<string,string>")
    return F.array_sort(F.map_keys(F.map_filter(m, lambda k, v: v == "True")))


def split_list_col(col, sep: str = ",") -> "F.Column":
    """P10's comma-split lists (categories/elite/friends,
    yelp.py:109-113)."""
    return F.transform(F.split(col, sep), lambda x: F.trim(x))


def candidate_labels(
    items: DataFrame,
    labels: DataFrame,
    name_col: str = "name",
    label_col: str = "label",
    uri_col: str = "uri",
) -> DataFrame:
    """U1: per-item candidate URIs from an offline labels dump.

    ``labels`` holds (label, uri) for direct labels AND redirect
    labels (the two SPARQL UNION branches); a candidate matches when
    the item's P9 pattern matches its label. The labels table is the
    small side — broadcast."""
    pat = match_pattern(F.lower(F.col(name_col)))
    return (
        items.withColumn("_pat", pat)
        .join(F.broadcast(labels), F.regexp_like(F.lower(F.col(label_col)), F.col("_pat")))
        .drop("_pat")
    )


def wratio_udf():
    """Arrow-batched (name, label) -> WRatio score in [0, 100]
    (functions/fuzzy.py) — the pandas_udf seam for the scorer Spark
    expressions can't express (SequenceMatcher block recursion)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from ..functions.fuzzy import wratio

    def _score(name, label):
        return pd.Series(
            [wratio(n, l) for n, l in zip(name, label)], dtype="int32"
        )

    # explicit annotations (evaluated, not stringified by the module's
    # `from __future__ import annotations`) so Spark's type-hint
    # inference sees a scalar Series->Series pandas UDF
    _score.__annotations__ = {
        "name": pd.Series,
        "label": pd.Series,
        "return": pd.Series,
    }
    return pandas_udf(_score, "int")


def link_entities(
    items: DataFrame,
    labels: DataFrame,
    item_col: str = "item_id",
    name_col: str = "name",
    label_col: str = "label",
    uri_col: str = "uri",
    scorer: str = "levenshtein",
) -> DataFrame:
    """J7: fuzzy disambiguation — keep the best-scoring candidate per
    item (ties: shortest label, then lexicographic URI).

    ``scorer='levenshtein'`` (default): pure-codegen edit distance —
    fastest, fully SQL-oracle-checkable (the di2 hash oracle).
    ``scorer='wratio'``: the reference's actual extractOne semantics
    (thefuzz WRatio, movielens.py:126-131) via an Arrow-batched
    pandas_udf — picks the right candidate where levenshtein fails on
    reordered/parenthesized titles ("Shining, The (1980)" vs
    "The Shining"); golden-tested on such fixtures. Unlike the
    reference's extractOne (first-max in nondeterministic SPARQL
    response order) both paths are deterministic.

    Returns (item_id, name, URI nullable) — the reference's map.csv
    shape (dataset.py:225-244): unmatched items keep a null URI.
    """
    cands = candidate_labels(items, labels, name_col, label_col, uri_col)
    if scorer == "wratio":
        score = wratio_udf()(F.col(name_col), F.col(label_col))
        order = [F.desc("_score")]
        cands = cands.withColumn("_score", score)
    elif scorer == "levenshtein":
        dist = F.levenshtein(F.lower(F.col(name_col)), F.lower(F.col(label_col)))
        order = [dist]
    else:
        raise ValueError(f"unknown scorer: {scorer!r}")
    w = Window.partitionBy(item_col).orderBy(
        *order, F.length(label_col), F.col(uri_col)
    )
    best = (
        cands.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(item_col, F.col(uri_col).alias("URI"))
    )
    return items.select(item_col, name_col).join(best, item_col, "left")


def enrich_group_concat(
    mapped: DataFrame,
    properties: DataFrame,
    prop_cols: list[str],
    uri_col: str = "URI",
) -> DataFrame:
    """A1: offline equivalent of SPARQL ``GROUP_CONCAT(DISTINCT ?x;
    SEPARATOR='::')`` (movielens.py:57-79) — one ``::``-joined string
    column per property."""
    aggs = [
        F.concat_ws("::", F.array_sort(F.collect_set(c))).alias(c) for c in prop_cols
    ]
    props = properties.groupBy(uri_col).agg(*aggs)
    return mapped.join(props, uri_col, "left")


def coverage_stats(df: DataFrame, cols: list[str]) -> DataFrame:
    """A5 (dataset.py:236-241, 264-270): per-column null/coverage
    percentages."""
    n = F.count(F.lit(1))
    aggs = [
        F.round(
            100.0 * F.count(F.when(F.col(c).isNotNull(), 1)) / n, 2
        ).alias(c)
        for c in cols
    ]
    return df.agg(*aggs)
