"""Typed-CSV codec for the reference's ``name::type`` header convention.

The reference's interchange format (S3 in SURVEY §2.1; see
``/root/reference/framework/dataloader/graph/graph.py:193-215``) embeds
the column type in the header: ``col_name::data_type`` with
``data_type in {string, string_list, number}``. ``string_list`` cells
are ``"::"``-joined multi-values; ``number`` is numeric-cast.

Spark-first re-expression: parse the header once on the driver, build a
select list of casts/splits, and let the CSV scan stream through them —
no per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_TYPES = ("string", "string_list", "number")
LIST_SEP = "::"


class TypedHeaderError(ValueError):
    """Unparsable ``name::type`` header — mirrors the reference's abort
    on bad headers (graph.py:207-212)."""


def parse_typed_header(raw_name: str) -> tuple[str, str]:
    parts = raw_name.rsplit(LIST_SEP, 1)
    if len(parts) != 2 or parts[1] not in _TYPES:
        raise TypedHeaderError(
            f"column {raw_name!r} does not match 'name::type' with "
            f"type in {_TYPES}"
        )
    return parts[0], parts[1]


def typed_header_schema(raw_names: list[str]) -> T.StructType:
    """Map a typed header to the post-decode Spark schema."""
    fields = []
    for raw in raw_names:
        name, typ = parse_typed_header(raw)
        if typ == "string":
            dt: T.DataType = T.StringType()
        elif typ == "number":
            dt = T.DoubleType()
        else:
            dt = T.ArrayType(T.StringType())
        fields.append(T.StructField(name, dt, True))
    return T.StructType(fields)


def read_typed_csv(
    spark: SparkSession,
    path: str,
    sep: str = ",",
    multiline: bool = True,
    escape: str = '"',
) -> DataFrame:
    """Read a reference-style typed CSV into a properly-typed DataFrame.

    All columns are read as strings, then cast/split according to the
    header suffix — the casts run JVM-side inside whole-stage codegen.

    ``multiline`` (r13, surfaced by the real-data pins): the
    reference's pandas reader parses quoted fields with embedded
    newlines as ONE record; Spark's default line-split scan breaks
    them (the committed ml-100k enriched.csv has 3 multi-line
    abstracts — 1460 rows instead of 1457 without this). True matches
    reference semantics. Scale note: multiLine mode reads each FILE
    unsplit by one task, so at cluster scale the format should arrive
    as many files (it does — this is the reference's per-dataset
    interchange format, not the 100 TB fact path, which is parquet).
    Pass False to restore splittable line-mode scans for known
    newline-free files.

    Dialect note (r13 break, disclosed): the reader parses RFC 4180
    doubled-quote escaping (``escape='"'`` — pandas/reference parity;
    the real-data pins depend on it). Files written by the PRE-r13
    ``write_typed_csv`` used Spark's default backslash escaping, so a
    pre-r13 file containing embedded quotes would be misparsed here.
    All in-repo fixtures were regenerated at the switch; externally
    written legacy files can pass ``escape='\\\\'`` to get the old
    dialect back.
    """
    raw = spark.read.csv(
        path, header=True, sep=sep, inferSchema=False, multiLine=multiline,
        escape=escape,
    )
    cols = []
    for raw_name in raw.columns:
        name, typ = parse_typed_header(raw_name)
        c = F.col(f"`{raw_name}`")
        if typ == "number":
            # try_cast: unparsable numbers -> null (ANSI-safe), matching
            # pandas to_numeric(errors='coerce') tolerance
            cols.append(c.try_cast("double").alias(name))
        elif typ == "string_list":
            cols.append(F.split(c, LIST_SEP).alias(name))
        else:
            cols.append(c.alias(name))
    return raw.select(cols)


def write_typed_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write a DataFrame back out with ``name::type`` headers.

    Arrays are ``"::"``-joined; numerics keep their string form.
    """
    cols = []
    for field in df.schema.fields:
        if isinstance(field.dataType, T.ArrayType):
            cols.append(
                F.array_join(F.col(field.name), LIST_SEP).alias(
                    f"{field.name}{LIST_SEP}string_list"
                )
            )
        elif isinstance(field.dataType, T.NumericType):
            cols.append(F.col(field.name).cast("string").alias(f"{field.name}{LIST_SEP}number"))
        else:
            cols.append(F.col(field.name).cast("string").alias(f"{field.name}{LIST_SEP}string"))
    # escape='"' = RFC 4180 doubled-quote escaping, matching what the
    # reader (and the reference's pandas round-trip) parses
    df.select(cols).write.mode(mode).csv(path, header=True, escape='"')
