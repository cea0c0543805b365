#!/usr/bin/env python3
"""Regenerate the PLANS.md audit counters from live explain() output.

Prints one markdown row per query: BroadcastHashJoin count,
SortMergeJoin count, shuffle exchanges, single-partition exchanges,
scans with non-empty PushedFilters — the numbers the committed
PLANS.md table cites. Pass name substrings to restrict.

Usage: python3 scripts/plan_audit.py [name_substring ...]
"""

from __future__ import annotations

import contextlib
import io
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

SF = "/root/testdata/sf0.001"
SKIP_PREFIXES = ("st",)  # streaming drains execute on call
SKIP = {"rec_kge_transe_top5", "rec_node2vec_top5", "rec_als_top5"}


def audit(plan: str) -> tuple[int, int, int, int, int]:
    blocks = [b for b in plan.split("\n\n") if re.match(r"\(\d+\) ", b)]

    def head(b):
        return b.split("\n")[0]

    bhj = sum(1 for b in blocks if "BroadcastHashJoin" in head(b))
    smj = sum(1 for b in blocks if "SortMergeJoin" in head(b))
    ex = sum(1 for b in blocks if head(b).split(") ", 1)[1].startswith("Exchange"))
    onep = sum(1 for b in blocks if "SinglePartition" in b)
    pf = len(re.findall(r"PushedFilters: \[(?!\])", plan))
    return bhj, smj, ex, onep, pf


def main() -> None:
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.plans import QUERIES
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.session import get_spark

    subs = sys.argv[1:]
    spark = get_spark("plan_audit")
    print("| query | BHJ | SMJ | EX | 1P | PF |")
    print("|---|---|---|---|---|---|")
    for name, fn in sorted(QUERIES.items()):
        if name.startswith(SKIP_PREFIXES) or name in SKIP:
            continue
        if subs and not any(s in name for s in subs):
            continue
        try:
            df = fn(spark, SF)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            bhj, smj, ex, onep, pf = audit(buf.getvalue())
            print(f"| {name} | {bhj} | {smj} | {ex} | {onep} | {pf} |")
        except Exception as exc:  # noqa: BLE001
            print(f"| {name} | ERR: {str(exc).splitlines()[0][:60]} |")
    spark.stop()


if __name__ == "__main__":
    main()
