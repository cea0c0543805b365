#!/usr/bin/env python3
"""Isolate-bench a subset of registry queries with bench.py's exact
methodology (df.count() timed end-to-end per repeat, per-query median)
so numbers are comparable battery-to-battery, without paying for the
other ~145 queries while iterating on one operator (guide §1).

Usage:
    python3 scripts/minibench.py q1_pricing_summary ss8 [...]
        substrings match like check_correctness.py
    SPARK_GRAFT_BENCH_REPEATS=5 ... more repeats
    MINIBENCH_PLAN_DIR=plans/r14 MINIBENCH_PLAN_SUFFIX=_before ...
        additionally dump each query's explain("formatted") to
        <dir>/<name><suffix>.txt
"""

from __future__ import annotations

import contextlib
import io
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from bench import HEADLINE

    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.plans import QUERIES
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.session import get_spark

    subs = sys.argv[1:]
    names = [n for n in HEADLINE if any(s in n for s in subs)] if subs else HEADLINE
    if not names:
        raise SystemExit(f"no HEADLINE query matches {subs}")

    spark = get_spark("minibench")
    spark.range(1000).count()
    spark.read.parquet(os.path.join(SF_DIR, "region.parquet")).count()

    plan_dir = os.environ.get("MINIBENCH_PLAN_DIR")
    plan_suffix = os.environ.get("MINIBENCH_PLAN_SUFFIX", "")
    repeats = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3")))
    times: dict[str, float] = {}
    for name in names:
        fn = QUERIES[name]
        spark.sparkContext.setJobDescription(f"minibench:{name}")
        runs: list[float] = []
        n = -1
        for i in range(repeats):
            t0 = time.time()
            df = fn(spark, SF_DIR)
            prev, n = n, df.count()
            runs.append(time.time() - t0)
            assert i == 0 or n == prev, f"{name}: nondeterministic rows {prev}->{n}"
        spark.sparkContext.setJobDescription(None)
        times[name] = round(statistics.median(runs), 3)
        detail = "/".join(f"{r:.2f}" for r in runs)
        print(f"{name}: median {times[name]}s of [{detail}] rows={n}", flush=True)
        if plan_dir and not name.startswith("st"):
            os.makedirs(plan_dir, exist_ok=True)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                fn(spark, SF_DIR).explain("formatted")
            with open(os.path.join(plan_dir, f"{name}{plan_suffix}.txt"), "w") as fh:
                fh.write(buf.getvalue())
    print(f"TOTAL {round(sum(times.values()), 3)}s over {len(times)} queries")
    spark.stop()


if __name__ == "__main__":
    main()
