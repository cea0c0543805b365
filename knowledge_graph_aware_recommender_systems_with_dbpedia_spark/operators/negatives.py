"""Per-user negative sampling for recommender / contrastive training.

Greenfield scale extension (no reference counterpart, but the direct
training-data complement of the reference's positive-only ratings
pipeline: every pairwise/BPR-style trainer consumes (user, pos, neg)
triples). The naive spelling — ``users x catalog`` cross join, anti-join
the positives, sample k — is O(|U| * |I|) and dead at 100 TB.

:func:`sample_negatives` instead proposes a CONSTANT number of
candidates per user (``n_proposals``), so total work is O(|U| *
n_proposals + |I|):

 * the item catalog gets contiguous dense ids once (the two-pass
   bucketed rank of operators/ids.py — no single-partition window);
 * each (user, slot) pair maps to a candidate id via the engine-
   portable det_hash — embarrassingly parallel, reproducible under
   retries, and replayable in the DuckDB oracle;
 * candidates resolve to item ids through ONE equi-join against the
   dense-id table (broadcast while the catalog fits, shuffle join
   beyond), positives drop via left_anti, and the final keep-k window
   is bounded per user by n_proposals — never catalog-sized.

With n_proposals a few multiples of k and positives sparse relative to
the catalog, every user ends up with k negatives with overwhelming
probability; under-filled users (pathologically dense raters) surface
with fewer rows rather than silently resampling — callers can re-run
those few with a larger n_proposals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import hashing as H
from .ids import dense_ids


def sample_negatives(
    ratings: DataFrame,
    k: int = 5,
    n_proposals: int = 12,
    seed: int = 11,
    broadcast_items_max: int = 10_000_000,
) -> DataFrame:
    """k deterministic unrated items per user from the rated catalog.

    Returns ``(user_id, item_id, slot)`` — ``slot`` is the proposal
    index that produced the negative (stable tie-break + audit trail).

    The catalog count lands as a literal (one bounded driver scalar,
    same value the old 1-row crossJoin attached — that spelling ran the
    dense-id lineage once extra under the agg), and the slot->item
    resolve broadcasts the dense-id table while the catalog is at most
    ``broadcast_items_max`` rows (~16 B/row core payload): the widest
    frame of the query (|U| * n_proposals proposals) is then never
    shuffled on item_idx. Past the threshold it falls back to the
    shuffle join — the catalog, not the user base, decides.
    """
    pos = ratings.select("user_id", "item_id").distinct()
    idx = dense_ids(pos.select("item_id").distinct(), ["item_id"], "item_idx")
    n_items = idx.count()
    users = pos.select("user_id").distinct()
    props = users.select(
        "user_id",
        F.explode(F.array(*[F.lit(i) for i in range(n_proposals)])).alias("slot"),
    ).select(
        "user_id",
        F.col("slot").cast("bigint").alias("slot"),
        F.pmod(
            H.det_hash(F.col("user_id"), F.col("slot"), seed=seed),
            F.lit(n_items).cast("bigint"),
        ).alias("item_idx"),
    )
    cat = F.broadcast(idx) if n_items <= broadcast_items_max else idx
    cands = props.join(cat, "item_idx").select("user_id", "item_id", "slot")
    neg = cands.join(pos, ["user_id", "item_id"], "left_anti")
    first_slot = neg.groupBy("user_id", "item_id").agg(F.min("slot").alias("slot"))
    w = Window.partitionBy("user_id").orderBy("slot", "item_id")
    return (
        first_slot.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def training_triples(
    ratings: DataFrame,
    k: int = 3,
    n_proposals: int = 12,
    seed: int = 11,
    pos_seed: int = 13,
) -> DataFrame:
    """(user, pos_item, neg_item) triples — the pairwise/BPR trainer
    input: each sampled negative pairs with a det-hash-picked positive
    of the same user.

    The positive pick indexes the user's positives by their per-user
    item-order rank (a user-partitioned window — bounded by the user's
    degree, never corpus-wide) with ``det_hash(user, slot, pos_seed)
    mod degree``, so the pairing is reproducible under retries and
    replayable in SQL. Every join/window keys on user_id — one shuffle
    key end to end.
    """
    pos = ratings.select("user_id", "item_id").distinct()
    wp = Window.partitionBy("user_id").orderBy("item_id")
    pos_idx = pos.withColumn("_pidx", F.row_number().over(wp) - 1).select(
        "user_id", F.col("item_id").alias("pos_item"), "_pidx"
    )
    deg = pos.groupBy("user_id").agg(F.count(F.lit(1)).alias("_deg"))
    neg = sample_negatives(ratings, k=k, n_proposals=n_proposals, seed=seed).select(
        "user_id", F.col("item_id").alias("neg_item"), "slot"
    )
    picked = neg.join(deg, "user_id").withColumn(
        "_pidx",
        F.pmod(
            H.det_hash(F.col("user_id"), F.col("slot"), seed=pos_seed),
            F.col("_deg"),
        ),
    )
    return picked.join(pos_idx, ["user_id", "_pidx"]).select(
        "user_id", "pos_item", "neg_item", "slot"
    )
