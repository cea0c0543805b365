"""Distributed random walks over an edge-list DataFrame — G6/G7.

The reference generates walks with the numba ``walker`` lib /
vendored ``RandomWalker``/``BiasedRandomWalker``
(``framework/recommender/utils/walker.py:12-185``, called from
``framework/recommender/models/deep_walk_based/model.py:100-106``).
Spark-first re-expression: a walk is a *state DataFrame*
``(walk_id, prev, cur, path)`` advanced ``walk_len - 1`` times by
joining against a cached adjacency-list DataFrame — no driver loop
over nodes, no Python in the hot path (all sampling is JVM-side
higher-order array functions on deterministic hashes).

Determinism: every sampling decision is a pure function of
(walk key, step) via md5 — identical across retries, partitionings
and cluster sizes (same rationale as functions/hashing.py; Spark's
``rand()`` is partition-sensitive and would break walk reproducibility
under speculative execution).

Quirk preserved (documented, SURVEY §7 risk register): the reference
*accepts* node2vec p/q but its ``fit()`` calls the external library's
first-order ``random_walks`` — p/q are unused there
(``deep_walk_based/model.py:100-106``). Our ``p=q=1.0`` default is
therefore the parity path; ``p``/``q`` != 1 enables the true
second-order bias the reference's vendored ``BiasedRandomWalker``
(``utils/walker.py:103-185``) implements but never runs.

Scale notes: adjacency is built once, cached, and partitioned on the
join key; each step shuffles only the (small) walk-state table, never
the adjacency. Lineage is truncated every few steps with
``localCheckpoint`` so long walks don't build thousand-node plans.
High-degree hubs cost O(degree) per step in the weight lambda — for
100 TB graphs cap neighbor lists (``max_degree``) like GraphSAGE
samplers do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .graph import relabel_nodes  # noqa: F401  (re-exported for callers)

_CHECKPOINT_EVERY = 4


def _unit(*cols) -> "F.Column":
    """Deterministic uniform [0,1) from string columns (md5-based)."""
    h = F.conv(F.substring(F.md5(F.concat_ws("\x1f", *cols)), 1, 15), 16, 10).cast(
        "bigint"
    )
    return F.pmod(h, F.lit(1_000_000)) / F.lit(1_000_000.0)


def adjacency(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Undirected adjacency lists: (node, nbrs array<string>).

    ``sort_array`` makes the neighbor order — and therefore every
    sampled walk — independent of shuffle order.
    """
    bidir = edges.select(F.col(src).alias("node"), F.col(dst).alias("nbr")).unionAll(
        edges.select(F.col(dst).alias("node"), F.col(src).alias("nbr"))
    )
    return (
        bidir.distinct()
        .groupBy("node")
        .agg(F.sort_array(F.collect_list("nbr")).alias("nbrs"))
    )


def random_walks(
    edges: DataFrame,
    n_walks: int = 10,
    walk_len: int = 10,
    p: float = 1.0,
    q: float = 1.0,
    seed: int = 42,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """``n_walks`` walks of ``walk_len`` nodes from every node.

    Returns (walk_id, walk array<string>). First-order (uniform) when
    p == q == 1 — one adjacency join per step; second-order node2vec
    bias otherwise — same join count, the previous step's neighbor
    list rides along in the state so no extra lookup is needed.
    """
    adj = adjacency(edges, src, dst).cache()

    walk_idx = F.explode(F.sequence(F.lit(0), F.lit(n_walks - 1))).alias("widx")
    state = adj.select(F.col("node"), walk_idx).select(
        F.concat_ws("#", "node", "widx", F.lit(seed)).alias("walk_id"),
        F.lit(None).cast("string").alias("prev"),
        F.lit(None).cast("array<string>").alias("prev_nbrs"),
        F.col("node").alias("cur"),
        F.array("node").alias("path"),
    )

    biased = not (p == 1.0 and q == 1.0)
    for step in range(1, walk_len):
        st = state.join(adj, state.cur == adj.node, "inner").drop("node")
        r = _unit(F.col("walk_id"), F.lit(step))
        if not biased:
            # uniform: O(1) pick by index
            idx = (F.floor(r * F.size("nbrs")) + 1).cast("int")
            nxt = F.element_at("nbrs", idx)
        else:
            # node2vec transition weights w.r.t. prev (utils/walker.py:
            # 140-160 semantics): 1/p return, 1 if nbr adjacent to
            # prev, 1/q outward. The weight array and the sampling
            # target are materialized as real columns BEFORE the
            # cumulative pick — inlining them into the aggregate lambda
            # would re-evaluate the whole-array expressions per element
            # (O(len^2), see functions/hashing.py rationale).
            wts = F.transform(
                "nbrs",
                lambda n: F.when(F.col("prev").isNull(), F.lit(1.0))
                .when(n == F.col("prev"), F.lit(1.0 / p))
                .when(F.array_contains(F.coalesce("prev_nbrs", F.array()), n), F.lit(1.0))
                .otherwise(F.lit(1.0 / q)),
            )
            st = st.withColumn("_wts", wts)
            st = st.withColumn(
                "_target",
                r * F.aggregate("_wts", F.lit(0.0), lambda a, x: a + x),
            )
            pairs = F.zip_with(
                "nbrs", "_wts", lambda n, w: F.struct(n.alias("n"), w.alias("w"))
            )
            picked = F.aggregate(
                pairs,
                F.struct(
                    F.lit(0.0).alias("cum"), F.lit(None).cast("string").alias("sel")
                ),
                lambda acc, x: F.struct(
                    (acc.cum + x.w).alias("cum"),
                    F.when(
                        acc.sel.isNull() & (acc.cum + x.w >= F.col("_target")), x.n
                    ).otherwise(acc.sel).alias("sel"),
                ),
            )
            # float-edge fallback: if cum never reached target, take last
            nxt = F.coalesce(picked.sel, F.element_at("nbrs", -1))
        state = st.select(
            "walk_id",
            F.col("cur").alias("prev"),
            F.col("nbrs").alias("prev_nbrs"),
            nxt.alias("cur"),
            F.concat("path", F.array(nxt)).alias("path"),
        )
        if step % _CHECKPOINT_EVERY == 0 and step < walk_len - 1:
            state = state.localCheckpoint(eager=False)

    return state.select("walk_id", F.col("path").alias("walk"))
