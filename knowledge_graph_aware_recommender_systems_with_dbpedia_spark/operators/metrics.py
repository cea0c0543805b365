"""Ranking metrics MAP@k and graded nDCG@k as DataFrame aggregations.

Reference semantics reproduced exactly
(``framework/evaluator/metrics/map.py:13-33``, ``ndcg.py:11-48``,
``metric.py:19-36``):

 * relevant(u) = test items with rating >= relevance_threshold; users
   with zero relevant items are EXCLUDED from the mean;
 * MAP@k: AP = sum over the first k recs of hits/position (first
   occurrence of an item only), divided by ``min(|relevant|, k)``;
 * nDCG@k: GRADED relevance (the raw test rating; 0 for non-test
   recs), DCG = sum rel_i/log2(i+1), IDCG from the user's top-k test
   ratings sorted desc, ndcg = 0 when IDCG = 0. (MLlib's
   RankingEvaluator ndcg is binary — deliberately not used.)
 * users with relevant items but no recommendations score 0 (the
   reference would KeyError; scoring 0 is the distributed-safe
   superset, documented deviation).

Everything is joins + windows — fully parallel, no driver iteration.
Inputs are long-format DataFrames:
    test:  (user_id, item_id, rating)
    recs:  (user_id, item_id, rank)  with rank starting at 1
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import pinned as PIN


def _relevant(test: DataFrame, relevance_threshold: float) -> DataFrame:
    return test.filter(F.col("rating") >= F.lit(relevance_threshold)).select(
        "user_id", "item_id", "rating"
    )


def map_at_k(
    test: DataFrame,
    recs: DataFrame,
    k: int,
    relevance_threshold: float = 0.0,
) -> DataFrame:
    """Mean Average Precision at k. Returns a 1-row DataFrame (value)."""
    per_user = apk_per_user(test, recs, k, relevance_threshold)
    return per_user.agg(F.avg("apk").alias("value"))


def apk_per_user(
    test: DataFrame, recs: DataFrame, k: int, relevance_threshold: float = 0.0
) -> DataFrame:
    rel = _relevant(test, relevance_threshold)
    rel_counts = rel.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_rel"))

    r = recs.filter(F.col("rank") <= k)
    # first-occurrence-only dedup clause (map.py:30 `rec not in recommendations[:i]`)
    w_dup = Window.partitionBy("user_id", "item_id").orderBy("rank")
    r = r.withColumn("_occ", F.row_number().over(w_dup))

    hit = (
        r.join(rel.select("user_id", "item_id").withColumn("_hit", F.lit(1)),
               ["user_id", "item_id"], "left")
        .withColumn("hit", ((F.col("_hit") == 1) & (F.col("_occ") == 1)).cast("int"))
    )
    w_rank = (
        Window.partitionBy("user_id")
        .orderBy("rank")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    scored = hit.withColumn("cum_hits", F.sum("hit").over(w_rank)).withColumn(
        "contrib",
        F.when(F.col("hit") == 1, F.col("cum_hits").cast("double") / F.col("rank")).otherwise(
            F.lit(0.0)
        ),
    )
    ap = scored.groupBy("user_id").agg(F.sum("contrib").alias("ap_num"))
    return (
        rel_counts.join(ap, "user_id", "left")
        .select(
            "user_id",
            (
                F.coalesce(F.col("ap_num"), F.lit(0.0))
                / F.least(F.col("n_rel"), F.lit(k)).cast("double")
            ).alias("apk"),
        )
    )


def ndcg_at_k(
    test: DataFrame,
    recs: DataFrame,
    k: int,
    relevance_threshold: float = 0.0,
) -> DataFrame:
    """Graded nDCG at k. Returns a 1-row DataFrame (value)."""
    per_user = ndcg_per_user(test, recs, k, relevance_threshold)
    return per_user.agg(F.avg("ndcg").alias("value"))


def ndcg_per_user(
    test: DataFrame, recs: DataFrame, k: int, relevance_threshold: float = 0.0
) -> DataFrame:
    rel = _relevant(test, relevance_threshold)

    # IDCG: per-user top-k test ratings desc (ties broken by item for
    # determinism; tie order does not change the sum)
    w_rel = Window.partitionBy("user_id").orderBy(F.desc("rating"), "item_id")
    idcg = (
        rel.withColumn("_pos", F.row_number().over(w_rel))
        .filter(F.col("_pos") <= k)
        .groupBy("user_id")
        .agg(
            F.sum(F.col("rating") / PIN.log2_int_pinned(F.col("_pos") + 1)).alias(
                "idcg"
            )
        )
    )

    r = recs.filter(F.col("rank") <= k)
    dcg = (
        r.join(rel, ["user_id", "item_id"], "left")
        .withColumn("rel", F.coalesce(F.col("rating"), F.lit(0.0)))
        .groupBy("user_id")
        .agg(F.sum(F.col("rel") / PIN.log2_int_pinned(F.col("rank") + 1)).alias("dcg"))
    )
    return idcg.join(dcg, "user_id", "left").select(
        "user_id",
        F.when(
            F.col("idcg") > 0, F.coalesce(F.col("dcg"), F.lit(0.0)) / F.col("idcg")
        )
        .otherwise(F.lit(0.0))
        .alias("ndcg"),
    )


def evaluate(
    test: DataFrame,
    recs: DataFrame,
    metrics: dict[str, dict] | None = None,
) -> DataFrame:
    """Run a metric suite -> tidy (metric, value) DataFrame.

    ``metrics`` maps name -> kwargs, e.g. {"MAP@5": {"metric": "map",
    "k": 5}, "nDCG@5": {"metric": "ndcg", "k": 5}} (registry pattern of
    the reference's metric2class.py).
    """
    metrics = metrics or {
        "MAP@5": {"metric": "map", "k": 5},
        "nDCG@5": {"metric": "ndcg", "k": 5},
    }
    out = None
    for name, spec in metrics.items():
        fn = map_at_k if spec["metric"] == "map" else ndcg_at_k
        kw = {kk: vv for kk, vv in spec.items() if kk != "metric"}
        one = fn(test, recs, **kw).select(F.lit(name).alias("metric"), "value")
        out = one if out is None else out.unionByName(one)
    return out


def mrr_at_k(
    test: DataFrame,
    recs: DataFrame,
    k: int,
    relevance_threshold: float = 0.0,
) -> DataFrame:
    """Mean Reciprocal Rank at k (greenfield addition — the reference
    ships MAP/nDCG only; same conventions: users with zero relevant
    test items are excluded from the mean, users with relevant items
    but no hit score 0). Returns a 1-row DataFrame (value)."""
    per_user = first_hit_rank_per_user(test, recs, k, relevance_threshold)
    rr = per_user.withColumn(
        "rr",
        F.when(F.col("first_hit").isNull(), F.lit(0.0)).otherwise(
            F.lit(1.0) / F.col("first_hit")
        ),
    )
    return rr.agg(F.avg("rr").alias("value"))


def hit_rate_at_k(
    test: DataFrame,
    recs: DataFrame,
    k: int,
    relevance_threshold: float = 0.0,
) -> DataFrame:
    """Fraction of evaluated users with >= 1 relevant item in their
    top-k (same user-exclusion conventions as the other metrics)."""
    per_user = first_hit_rank_per_user(test, recs, k, relevance_threshold)
    hr = per_user.withColumn(
        "hr", F.when(F.col("first_hit").isNull(), F.lit(0.0)).otherwise(F.lit(1.0))
    )
    return hr.agg(F.avg("hr").alias("value"))


def auc_at_k(
    test: DataFrame,
    recs: DataFrame,
    k: int,
    relevance_threshold: float = 0.0,
) -> DataFrame:
    """In-list AUC at k (greenfield addition): within each user's
    top-k slate, the probability that a relevant item is ranked above
    a non-relevant one — the Mann-Whitney rank-sum form, so the whole
    computation is INTEGER arithmetic until one exact final division:

        pairs_won = npos*n - sum(rank of positives) - npos*(npos-1)/2
        auc       = pairs_won / (npos * nneg)

    Users whose slate holds no positive or no negative have undefined
    AUC and are excluded from the mean (standard convention). One
    equi-join + one hash aggregate per user — map-side combinable, no
    window. Returns a 1-row DataFrame (value)."""
    rel = _relevant(test, relevance_threshold)
    r = recs.filter(F.col("rank") <= k)
    hit = r.join(
        rel.select("user_id", "item_id").withColumn("_hit", F.lit(1)),
        ["user_id", "item_id"],
        "left",
    ).select(
        "user_id",
        "rank",
        F.coalesce(F.col("_hit"), F.lit(0)).alias("hit"),
    )
    agg = hit.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("hit").alias("npos"),
        F.sum(F.when(F.col("hit") == 1, F.col("rank")).otherwise(0)).alias("sr"),
    )
    # npos*(npos-1) is a product of consecutive ints (even), and all
    # terms stay far below 2^53 — the double arithmetic is exact
    pairs_won = (
        F.col("npos") * F.col("n")
        - F.col("sr")
        - F.col("npos") * (F.col("npos") - 1) / 2
    ).cast("double")
    per_user = agg.filter(
        (F.col("npos") > 0) & (F.col("n") - F.col("npos") > 0)
    ).select(
        "user_id",
        (pairs_won / (F.col("npos") * (F.col("n") - F.col("npos"))).cast("double")).alias(
            "auc"
        ),
    )
    return per_user.agg(F.avg("auc").alias("value"))


def first_hit_rank_per_user(
    test: DataFrame, recs: DataFrame, k: int, relevance_threshold: float = 0.0
) -> DataFrame:
    """(user_id, first_hit) — rank of the first relevant rec within
    top-k (null = no hit), one row per user WITH relevant test items.
    Shared per-user stage of MRR/HitRate: an inner equi-join of the
    truncated recs against the relevant set, then a min() hash
    aggregate — map-side combinable, no window."""
    rel = _relevant(test, relevance_threshold)
    users = rel.select("user_id").distinct()
    hits = (
        recs.filter(F.col("rank") <= k)
        .join(rel.select("user_id", "item_id"), ["user_id", "item_id"])
        .groupBy("user_id")
        .agg(F.min("rank").alias("first_hit"))
    )
    return users.join(hits, "user_id", "left")
