#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at sf0.01, then compares row count, column names, and an
order-insensitive value comparison (sorted columns, sorted rows).

Usage: python3 scripts/check_correctness.py [name_substring ...]
       python3 scripts/check_correctness.py --exclude rec_ st_

Positional substrings INCLUDE-filter the registry; ``--exclude``
substrings drop matches (applied after includes). The sf0.1 ritual
sweep runs ``--exclude rec_node2vec rec_kge rec_als`` — the stochastic
trainers cost ~20 min EACH at that scale and their band twins are
scale-scoped to the sf0.01 calibration range anyway.
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_CPUS", "16")

import duckdb
import pandas as pd

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def duck_conn():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    # Sort BEFORE stringifying — the driver's canonicalization order.
    # Array/map-valued columns therefore crash here exactly like they
    # crash the driver gate (unhashable/unsortable list cells), instead
    # of being masked by an early astype(str). VERDICT r04 item 3.
    df = df[sorted(df.columns)].copy()
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        problems.append(f"columns: spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}")
        return problems
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"rowcount: spark={len(spark_pdf)} duck={len(duck_pdf)}")
    a, b = normalize(spark_pdf), normalize(duck_pdf)
    if len(a) == len(b):
        for c in a.columns:
            if pd.api.types.is_float_dtype(a[c]) and pd.api.types.is_float_dtype(b[c]):
                eq = (a[c].fillna(-9e99) == b[c].fillna(-9e99)) | (
                    (a[c] - b[c]).abs() < 1e-12
                )
            else:
                try:
                    eq = a[c].fillna("<null>").eq(b[c].fillna("<null>"))
                except Exception:
                    eq = a[c].astype(str).eq(b[c].astype(str))
            nbad = int((~eq).sum())
            if nbad:
                idx = (~eq).idxmax()
                problems.append(
                    f"col {c}: {nbad} mismatched values; first at row {idx}: "
                    f"spark={a[c][idx]!r} duck={b[c][idx]!r}"
                )
    return problems


def main() -> int:
    import __spark_entry__ as entrymod
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.session import get_spark

    argv = sys.argv[1:]
    excludes: list[str] = []
    if "--exclude" in argv:
        i = argv.index("--exclude")
        filters, excludes = argv[:i], argv[i + 1 :]
    else:
        filters = argv
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    if filters:
        qs = {k: v for k, v in qs.items() if any(f in k for f in filters)}
    if excludes:
        qs = {k: v for k, v in qs.items() if not any(e in k for e in excludes)}

    spark = get_spark("correctness")
    con = duck_conn()
    n_pass = n_fail = 0
    failures = {}
    for name, fn in qs.items():
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            complex_cols = [
                f.name
                for f in sdf.schema.fields
                if f.dataType.typeName() in ("array", "map", "struct")
            ]
            if complex_cols:
                # The driver's canonicalizer sorts rows before hashing and
                # crashes on list/dict cells — array/map/struct outputs are
                # banned from the registry (VERDICT r04 item 1). Render as
                # a joined fixed-format string instead (a2_o1's pattern).
                raise TypeError(
                    f"registry query returns complex-typed columns "
                    f"{complex_cols} — flatten to scalar strings"
                )
            spdf = sdf.toPandas()
        except Exception:
            n_fail += 1
            failures[name] = "SPARK ERROR:\n" + traceback.format_exc(limit=4)
            print(f"FAIL  {name:28s} spark error")
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"SKIP  {name:28s} rows={len(spdf)} (no oracle)")
            continue
        try:
            dpdf = con.sql(sql).df()
        except Exception:
            n_fail += 1
            failures[name] = "DUCKDB ERROR:\n" + traceback.format_exc(limit=2)
            print(f"FAIL  {name:28s} duckdb error")
            continue
        problems = compare(name, spdf, dpdf)
        dt = time.time() - t0
        if problems:
            n_fail += 1
            failures[name] = "\n".join(problems)
            print(f"FAIL  {name:28s} rows={len(spdf)}/{len(dpdf)} ({dt:.1f}s)")
        else:
            n_pass += 1
            print(f"pass  {name:28s} rows={len(spdf)} ({dt:.1f}s)")
    print(f"\n{n_pass} passed, {n_fail} failed")
    for name, msg in failures.items():
        print(f"\n=== {name} ===\n{msg[:2000]}")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
