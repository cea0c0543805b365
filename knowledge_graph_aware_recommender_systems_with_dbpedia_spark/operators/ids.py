"""P6 dense-id assignment — scale-safe (no single-partition window).

The reference synthesizes contiguous 0-based integer ids twice: node
relabeling for embedding trainers (framework/dataloader/graph/
graph.py:168-179) and the `df.index`-after-dedup dense keys of the
Douban adapter (data_integration/datasets/douban-movie.py:35-70). Both
are "rank every row of a dimension table in a total order".

The naive Spark spelling — ``row_number().over(Window.orderBy(...))``
with no partition — funnels the whole column through ONE task: fine on
a 2k-row fixture, the slowest task of the job once the dimension is
10^8 rows (users/items at 100 TB). :func:`dense_ids` instead reuses the
two-pass range-bucketed rank (``splits._global_rank``): rows are
range-bucketed on a *sample* of the primary key, ranked per bucket, and
offset by broadcast bucket counts. Sampling quality affects only bucket
BALANCE — never the ids — because any range partition of the primary
key preserves the total order. The only remaining single-partition
window is over the n_buckets-row count table (bounded, ~32 rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sampled_boundaries(
    df: DataFrame, col: str, n_buckets: int = 32, seed: int = 42
) -> list:
    """Range-bucket boundaries from a bounded sample of ``col``
    (one small driver action; ``[]`` for tiny inputs = single bucket)."""
    sample = sorted(
        r[0]
        for r in df.select(col)
        .filter(F.col(col).isNotNull())
        .sample(False, 0.1, seed=seed)
        .limit(n_buckets * 8)
        .collect()
    )
    step = max(1, len(sample) // n_buckets)
    return sample[step::step][: n_buckets - 1]


def dense_ids(
    df: DataFrame,
    order_cols: list[str],
    id_name: str,
    n_buckets: int = 32,
) -> DataFrame:
    """Append exact 0-based dense ids in ``order_cols`` order.

    Identical values to ``row_number().over(Window.orderBy(*order_cols))
    - 1`` — verified hash-identical by the p6/j3 oracles — but computed
    with the two-pass bucketed rank so no task ever sees more than
    ~1/n_buckets of the rows. Rows must be unique under ``order_cols``
    if the caller needs a bijective id (callers dedup first).
    """
    from .splits import _global_rank

    boundaries = sampled_boundaries(df, order_cols[0], n_buckets)
    ranked = _global_rank(
        df,
        [F.col(c) for c in order_cols],
        descending=False,
        boundaries=boundaries,
    )
    return ranked.withColumn(id_name, F.col("_rn") - 1).drop("_rn", "_n")
