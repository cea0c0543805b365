"""Raw dataset scans — S1/S2/S4/S5 of SURVEY §2.1.

The reference reads each recommender dataset's native files with
per-dataset pandas quirks (``movielens.py:218-233`` pipe-sep latin-1
with injected headers, ``movielens.py:321-328`` ``"::"``-sep python
engine, ``book-crossing.py:48-54`` ``;``-sep CP1252 with escapechar,
``lastfm.py:108`` tab-sep, ``yelp.py:71-156`` NDJSON). Spark-first:

 * one-char separators/encodings/escapes map straight onto
   ``spark.read.csv`` options;
 * multi-char separators (``"::"``) aren't supported by Spark's CSV
   scan — ``spark.read.text`` + one JVM-side ``split`` is the
   idiomatic translation (no Python row loop);
 * NDJSON is Spark's native json-lines source;
 * the SPARQL endpoint fan-out (S4 + its hand-rolled thread pool S5)
   becomes ``mapInPandas`` over a repartitioned id set — Spark task
   parallelism replaces ``queue.Queue`` + ``Worker`` threads
   (``dataset.py:109-136``, ``worker.py:4-31``); per-row failures are
   caught and surfaced as null rows like ``worker.py:29-31``.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


# Spark 4 whitelists charset names; normalize the aliases the raw
# datasets use and fall back to the legacy-charsets conf for the rest
_CHARSET_ALIASES = {"latin-1": "ISO-8859-1", "latin1": "ISO-8859-1",
                    "cp1252": "windows-1252"}
_SPARK4_CHARSETS = {"iso-8859-1", "us-ascii", "utf-16", "utf-16be",
                    "utf-16le", "utf-32", "utf-8"}


def _normalize_encoding(spark: SparkSession, encoding: str) -> str:
    enc = _CHARSET_ALIASES.get(encoding.lower(), encoding)
    if enc.lower() not in _SPARK4_CHARSETS:
        spark.conf.set("spark.sql.legacy.javaCharsets", "true")
    return enc


def read_csv(
    spark: SparkSession,
    path: str,
    sep: str = ",",
    encoding: str = "UTF-8",
    header: bool = True,
    column_names: list[str] | None = None,
    escape: str | None = None,
) -> DataFrame:
    """S1 for single-char separators: pipe/tab/semicolon variants with
    injected header names and non-UTF8 encodings."""
    reader = (
        spark.read.option("sep", sep)
        .option("encoding", _normalize_encoding(spark, encoding))
        .option("header", str(header).lower())
    )
    if escape is not None:
        reader = reader.option("escape", escape)
    df = reader.csv(path)
    if column_names is not None:
        df = df.toDF(*column_names)
    return df


def read_csv_multichar_sep(
    spark: SparkSession,
    path: str,
    sep: str,
    column_names: list[str],
    encoding: str = "UTF-8",
) -> DataFrame:
    """S1 for multi-char separators like MovieLens-1M's ``"::"``
    (movielens.py:321-328). ``read.text`` + ``split`` keeps the decode
    inside whole-stage codegen; regex metacharacters in ``sep`` are
    quoted."""
    import re

    quoted = re.escape(sep)
    lines = spark.read.text(path)
    if encoding.upper() not in ("UTF-8", "UTF8"):
        lines = (
            spark.read.format("text")
            .option("encoding", _normalize_encoding(spark, encoding))
            .load(path)
        )
    parts = F.split(F.col("value"), quoted)
    return lines.select(
        *[parts.getItem(i).alias(name) for i, name in enumerate(column_names)]
    )


def read_ndjson(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
    corrupt_col: str | None = None,
) -> DataFrame:
    """S2: Yelp-style JSON-lines dumps (yelp.py:71-156).

    Real crawl/API dumps carry malformed lines; Spark's PERMISSIVE
    mode (the default) nulls the fields of a bad record instead of
    failing the job — at 100 TB one broken line must never kill a
    multi-hour read. Pass ``corrupt_col`` to also CAPTURE the raw bad
    line in that column for quarantine (requires ``schema``, since
    schema inference drops the corrupt-record column); downstream can
    then `filter(col(corrupt_col).isNotNull())` into a dead-letter
    sink. NOTE: Spark raises AnalysisException when a query references
    ONLY the corrupt-record column of a raw JSON read — `.cache()` the
    returned DataFrame (or select at least one data column alongside)
    before filtering solely on ``corrupt_col``. Pass an explicit ``schema`` in production regardless —
    inference costs a full extra pass over the data.
    """
    reader = spark.read.option("mode", "PERMISSIVE")
    if corrupt_col is not None:
        if schema is None:
            raise ValueError("corrupt_col capture requires an explicit schema")
        reader = reader.option("columnNameOfCorruptRecord", corrupt_col)
        schema = f"{schema}, {corrupt_col} string"
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def remote_fanout(
    ids: DataFrame,
    fetch: Callable[[str], dict],
    result_fields: list[str],
    id_col: str = "item_id",
    partitions: int = 8,
) -> DataFrame:
    """S4/S5: per-id remote lookup distributed over executors.

    ``fetch(id) -> {field: value}`` runs inside ``mapInPandas``; a
    failing row yields nulls instead of failing the task (the
    reference logs-and-skips, worker.py:29-31). The live-DBpedia
    version passes a ``fetch`` that posts to the SPARQL endpoint; the
    offline-first design (SURVEY §7 phase 8) prefers a labels-dump
    join (operators/integration.py) and keeps this as the fallback.

    ``partitions`` is the concurrency knob — the reference's "-w N"
    worker-thread count (``data_integration.py:24``).
    """
    import pandas as pd

    schema = ", ".join([f"{id_col} string"] + [f"{f} string" for f in result_fields])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {id_col: [], **{f: [] for f in result_fields}}
            for key in pdf[id_col]:
                try:
                    res = fetch(key) or {}
                except Exception:
                    res = {}
                out[id_col].append(str(key))
                for f_ in result_fields:
                    v = res.get(f_)
                    out[f_].append(None if v is None else str(v))
            yield pd.DataFrame(out)

    return (
        ids.select(F.col(id_col).cast("string").alias(id_col))
        .repartition(partitions)
        .mapInPandas(run, schema)
    )
