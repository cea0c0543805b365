"""Pinned transcendental tables — engine-exact by construction.

VERDICT r06 item 2 (the tx14 class): libm transcendentals (``ln``,
``log2``, ``pow``...) are NOT correctly-rounded IEEE-754 ops, so two
engines (JVM intrinsics vs DuckDB's libm vs the driver box's libm) can
disagree by a ULP.  When such a value lands on a ``round(x, 6)``
boundary in a hash-compared column, the registry row flips red on one
box and stays green on another (tx14, red in r05+r06).

For transcendentals over a SMALL KNOWN INTEGER DOMAIN there is a
stronger fix than auditing margins: pin the function to a literal
table.  Python's ``repr`` emits the shortest decimal string that
round-trips to the exact double; both Java's ``Double.parseDouble``
and DuckDB's ``strtod`` are correctly-rounding decimal→binary
converters, so the SAME literal text parses to the SAME bits in both
engines.  The CASE expression below therefore makes ``log2(n)`` for
n in [2, PINNED_LOG2_MAX] bit-identical everywhere, independent of any
libm.  (``sqrt``, ``+``, ``-``, ``*``, ``/`` need no pinning — IEEE
754 requires them correctly rounded.)

Used by the nDCG discount ``1/log2(pos+1)`` (positions 2..k+1, k<=32
covers every registry/experiment call) — reference metric at
``framework/evaluator/metrics/ndcg.py``.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

# log2 over the integer domain [2, 33]: covers rank/position discounts
# for every k <= 32 used anywhere in the repo (registry uses k=5).
PINNED_LOG2_MAX = 33
_LOG2_TABLE: dict[int, float] = {n: math.log2(n) for n in range(2, PINNED_LOG2_MAX + 1)}


def log2_int_pinned(col: Column) -> Column:
    """``log2(col)`` for integer-valued ``col``, bit-exact across engines.

    Args in [2, PINNED_LOG2_MAX] hit the pinned literal table; anything
    else falls back to ``F.log2`` (callers with hash-compared outputs
    must keep their domain inside the table — the nDCG helpers do, by
    construction of ``rank <= k <= 32``).
    """
    expr: Column = F.log2(col)
    for n, v in _LOG2_TABLE.items():
        expr = F.when(col == n, F.lit(v)).otherwise(expr)
    return expr


def log2_int_pinned_sql(expr: str) -> str:
    """DuckDB/ANSI text twin of :func:`log2_int_pinned` — identical
    literal table (same ``repr`` strings), identical fallback.

    Literals go through ``CAST('<repr>' AS DOUBLE)``: a BARE decimal
    literal in DuckDB is typed DECIMAL first and converted to DOUBLE
    second — a double-rounding that flips the last bit for some
    17-digit reprs (log2(15) caught by tests/test_pinned.py). The
    string→double parse is correctly rounded, matching
    ``Double.parseDouble`` bit for bit."""
    whens = " ".join(
        f"WHEN {n} THEN CAST('{v!r}' AS DOUBLE)" for n, v in _LOG2_TABLE.items()
    )
    return f"(CASE CAST({expr} AS BIGINT) {whens} ELSE log2({expr}) END)"
