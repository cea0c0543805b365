"""Parquet table loaders for the driver-generated test data.

Tables (TESTDATA.md): region nation customer supplier part orders
lineitem events documents embeddings — one parquet file per table under
``/root/testdata/sf{0.001,0.01,0.1}/``.

Parquet scans get predicate pushdown + column pruning from Catalyst for
free; loaders deliberately do NOT cache DATA — callers decide
persistence. What IS reused (per session) is the analyzed reader
DataFrame: ``spark.read.parquet`` re-lists the directory and re-reads
the footer schema on every call (~0.1 s even warm — bare-path reads
don't go through the catalog's FileStatusCache), and registry queries
call ``load_table`` 1-6x per construction, 3x per bench repeat. The
memo returns the same immutable plan object instead; execution still
scans parquet every time (nothing is persisted), exactly like reading
a catalog table whose file listing is cached (guide §6). Keyed weakly
by session so a stopped session's entries die with it; the testdata
paths are immutable for a session's lifetime, which is what makes the
listing reuse sound.
"""

from __future__ import annotations

import os
import weakref

from pyspark.sql import DataFrame, SparkSession

_READER_MEMO: "weakref.WeakKeyDictionary[SparkSession, dict[str, DataFrame]]" = (
    weakref.WeakKeyDictionary()
)

TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def shape_events(df: DataFrame) -> DataFrame:
    """Normalize an events DataFrame to the canonical shape every
    consumer expects: ``ts_ns`` (bigint, nanoseconds since epoch) in
    place of the raw ``ts`` column, plus a microsecond-precision
    TimestampType ``ts`` appended last.

    Schema-adaptive: the driver testdata has shipped ``events.ts`` as
    parquet TIMESTAMP(NANOS) (arrives as LongType under the
    ``nanosAsLong`` legacy conf) and as TIMESTAMP(MICROS)
    (arrives as TIMESTAMP_NTZ, or TIMESTAMP when inference is off).
    Branch on the ACTUAL read type — never on a session conf, which a
    pre-built driver session may ignore.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType, TimestampType

    t = df.schema["ts"].dataType
    if isinstance(t, LongType):  # raw nanos
        ns = F.col("ts")
    elif isinstance(t, TimestampNTZType):
        # naive micros == stored micros; timestampdiff between two NTZ
        # values is pure field arithmetic — session-timezone-independent
        # (unlike cast-to-timestamp / to_utc_timestamp, which shift by
        # the session zone). Matches DuckDB's epoch_ns(ts) exactly.
        ns = (
            F.expr(
                "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
            )
            * 1000
        )
    elif isinstance(t, TimestampType):
        ns = F.unix_micros(F.col("ts")) * 1000
    else:
        raise TypeError(f"unexpected events.ts type: {t}")
    shaped = df.withColumn("ts_ns", ns.cast("bigint")).withColumn(
        "ts", F.timestamp_micros(F.expr("ts_ns div 1000"))
    )
    # ts_ns takes ts's original position, ts goes last (the historical
    # column order — query output schemas depend on it)
    return shaped.select(
        *[("ts_ns" if c == "ts" else c) for c in df.columns], "ts"
    )


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    per_session = _READER_MEMO.setdefault(spark, {})
    got = per_session.get(path)
    if got is None:
        got = spark.read.parquet(path)
        if name == "events":
            got = shape_events(got)
        # benign insert race under concurrent drain threads: both
        # compute the same immutable plan, last write wins
        per_session[path] = got
    return got


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TPCH_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so ``spark.sql`` can be used."""
    for t in TPCH_TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
