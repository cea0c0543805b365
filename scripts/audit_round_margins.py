#!/usr/bin/env python3
"""Rounding-boundary margin audit for transcendental-derived columns.

The tx14 defect class (VERDICT r05/r06): a hash-compared column of the
form ``round(f(x), k)`` where ``f`` involves a libm transcendental
(``ln``/``pow``/``log2``) is only engine-stable if no pre-round value
sits within libm's error of a rounding boundary (an odd multiple of
0.5*10^-k).  ``ln``/``pow`` are NOT correctly rounded, so the driver
box's libm and this box's libm can differ by a few ULPs — enough to
flip the rounded value exactly at a boundary.

tx14 itself was fixed by removing the transcendental (priority-sampling
key w/u — division is correctly rounded).  The queries that KEEP a
transcendental (TRANSCENDENTAL_ALLOWLIST in plans/driver_queries.py)
are justified by THIS audit: for each, the output-level ``round(X, k)``
wrappers are replaced by ``(X) * 10^k`` (the rounds in these queries
are output-only — asserted below — so this does not change the
computation), the probe runs on DuckDB at the driver's gate scale
(sf0.01), and every emitted value y must satisfy

    margin(y) = |frac(y) - 0.5|  >  max(1e-9, |y| * 1e-12)

i.e. the distance to the nearest boundary exceeds ~100x a generous
64-ULP libm error bound.  A violation means that query would be one
libm ULP away from a driver hash flip and must lose its
transcendental (the tx14 treatment), not stay allowlisted.

Output: one JSON line per query + a summary; exit 1 on any violation.
Run:  python3 scripts/audit_round_margins.py
"""

from __future__ import annotations

import json
import math
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)

# query -> expected number of round( sites (all output-only, verified
# by inspection; the assert catches drift if someone adds an inner
# semantic round, which this strip would silently alter).
AUDITED = {
    "tx6_unigram_logprob": 1,
    "tx9_mixture_weights": 1,
    "tx15_bigram_logprob": 1,
    "tx16_zipf_slope": 2,
    "tx17_tfidf_keywords": 1,
    "dd8_neardup_lsh": 1,
}


def strip_rounds(sql: str) -> str:
    """Replace every ``round(X, k)`` with ``((X) * 10^k)`` (balanced-
    paren aware), so emitted values carry their boundary distance:
    after scaling, rounding boundaries sit at half-integers."""
    out = sql
    while True:
        m = re.search(r"\bround\s*\(", out, re.I)
        if not m:
            return out
        start = m.end()  # just past the open paren
        depth, i = 1, start
        while depth:
            if out[i] == "(":
                depth += 1
            elif out[i] == ")":
                depth -= 1
            i += 1
        inner = out[start : i - 1]
        # split on the LAST top-level comma: expr , k
        depth, cut = 0, None
        for j, ch in enumerate(inner):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif ch == "," and depth == 0:
                cut = j
        assert cut is not None, f"round() without precision arg: {inner[:80]}"
        expr, k = inner[:cut], int(inner[cut + 1 :])
        out = out[: m.start()] + f"(({expr}) * 1e{k})" + out[i:]


def main() -> int:
    from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.plans import ORACLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    any_bad = False
    for name, n_rounds in AUDITED.items():
        sql = ORACLES[name]
        found = len(re.findall(r"\bround\s*\(", sql, re.I))
        assert found == n_rounds, (
            f"{name}: {found} round( sites, audit expects {n_rounds} "
            "(output-only) — re-verify before trusting this strip"
        )
        df = con.execute(strip_rounds(sql)).df()
        worst = {"margin": math.inf, "col": None, "value": None}
        n_vals = 0
        for c in df.columns:
            s = df[c]
            if not str(s.dtype).startswith("float"):
                continue
            for y in s.dropna():
                n_vals += 1
                frac = y - math.floor(y)
                margin = abs(frac - 0.5)
                if margin < worst["margin"]:
                    worst = {"margin": margin, "col": c, "value": y}
        thresh = max(1e-9, abs(worst["value"] or 0.0) * 1e-12)
        ok = worst["margin"] > thresh
        any_bad |= not ok
        print(
            json.dumps(
                {
                    "query": name,
                    "n_float_values": n_vals,
                    "min_margin": worst["margin"],
                    "at_col": worst["col"],
                    "threshold": thresh,
                    "ok": ok,
                }
            )
        )
    print(json.dumps({"summary": "FAIL" if any_bad else "PASS", "sf_dir": SF_DIR}))
    return 1 if any_bad else 0


if __name__ == "__main__":
    sys.exit(main())
