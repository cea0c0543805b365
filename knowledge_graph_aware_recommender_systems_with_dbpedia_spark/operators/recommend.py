"""Recommenders: popularity baseline + embedding cosine top-k scoring.

The scoring path reproduces the reference's over-fetch + anti-join +
truncate pattern exactly (``deep_walk_based/model.py:62-86``):

 1. over-fetch ``n = min(max_user_degree + k, n_items)`` candidates
    per user (guarantees >= k remain after excluding rated items);
 2. anti-join the user's already-rated items (J6);
 3. keep the first k by score (O4).

Scale: the popularity candidate set is tiny (top-n global items) and
broadcast; the cosine path normalizes once, and the exact variant is a
blocked crossJoin kept for parity/small-dims — the scale path is
MLlib ``BucketedRandomProjectionLSH`` (see similarity.py) or an IVF
prefilter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str | list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join (single or composite key): the hot keys
    of ``big`` are spread over ``n_salts`` shuffle partitions by a
    deterministic row salt; ``small`` is replicated once per salt value.

    AQE's skew-join split handles moderate skew automatically; this is
    the explicit tool for pathological keys (one user with 10^8
    interactions, one stop-phrase LSH bucket) or stages where AQE can't
    re-plan (e.g. stream-static joins). Deterministic: the salt is a
    hash of the row's other columns, not rand().
    """
    keys = [key] if isinstance(key, str) else list(key)
    salt = F.pmod(
        F.hash(*[F.col(c) for c in big.columns]), F.lit(n_salts)
    ).alias("_salt")
    b = big.select("*", salt)
    s = small.join(
        F.broadcast(
            small.sparkSession.range(n_salts).select(F.col("id").cast("int").alias("_salt"))
        ),
        F.lit(True),
    )
    return b.join(s, keys + ["_salt"], how).drop("_salt")


def bucket_skew_ratio(df: DataFrame, keys: list[str]) -> float:
    """max bucket size / mean bucket size — the pre-flight skew probe
    behind ``salt="auto"`` in the LSH joins. One tiny aggregate job
    (shuffles one count per distinct key)."""
    stats = (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.max("c").alias("mx"), F.avg("c").alias("mean"))
        .collect()[0]
    )
    if not stats["mean"]:
        return 1.0
    return float(stats["mx"]) / float(stats["mean"])


class Recommender:
    """Plugin contract shared by every recommender (reference
    ``framework/recommender/recommender.py:22-28`` and the documented
    add-a-recommender surface ``docs/source/contributing/
    add_recommender.md:9-16``): ``train``, ``get_recommendations(k)``,
    ``get_user_recommendation(user, k)``, and the ``all_recs`` flag
    (True = rank EVERY unseen item per user, no top-k truncation —
    ``deep_walk_based/model.py:71-78``)."""

    k: int = 5
    all_recs: bool = False

    def name(self) -> str:
        """The reference contract's ``name`` (recommender.py:11-31):
        registry key when constructed via MODELS (set by
        registries.make_model), else the class name."""
        return getattr(self, "_registry_name", type(self).__name__)

    def train(self, *args, **kwargs):
        raise NotImplementedError("override train() in your recommender")

    def get_recommendations(self, k: int | None = None) -> DataFrame:
        raise NotImplementedError("override get_recommendations()")

    def get_user_recommendation(self, user_id, k: int | None = None) -> DataFrame:
        """Recommendations for ONE user — by contract the per-user slice
        of :meth:`get_recommendations`. Expressed as a filter on the
        full plan: Catalyst pushes the user_id predicate below the
        ranking window (its partition key) and into the scoring join,
        so only that user's candidates are actually scored."""
        recs = self.get_recommendations(k)
        return recs.filter(F.col("user_id") == F.lit(user_id))


def max_user_degree(train: DataFrame, user_col="user_id") -> int:
    """A8: max #ratings of any user (over-fetch heuristic input)."""
    row = train.groupBy(user_col).count().agg(F.max("count").alias("m")).collect()[0]
    return int(row["m"] or 0)


def exclude_rated_and_truncate(
    scored: DataFrame,
    train: DataFrame,
    k: int,
    user_col: str = "user_id",
    item_col: str = "item_id",
    score_col: str = "score",
    all_recs: bool = False,
) -> DataFrame:
    """J6 + O4: drop train items, re-rank, keep top-k -> (user, item, rank).

    ``all_recs=True`` skips the truncation (every surviving candidate
    stays, ranked) — the reference's ``all_recs`` flag."""
    filtered = scored.join(
        train.select(user_col, item_col), [user_col, item_col], "left_anti"
    )
    w = Window.partitionBy(user_col).orderBy(F.desc(score_col), item_col)
    ranked = filtered.withColumn("rank", F.row_number().over(w))
    if not all_recs:
        ranked = ranked.filter(F.col("rank") <= k)
    return ranked.select(user_col, item_col, "rank")


class PopularityRecommender(Recommender):
    """Most-popular-unseen baseline (the zero-ML end-to-end slice of
    SURVEY §7 phase 2). Candidate set = global top-(max_degree + k)
    items by interaction count — broadcastable by construction.
    ``all_recs=True`` ranks every unseen item (the candidate array is
    then the whole item dim table — bounded, still broadcastable)."""

    def __init__(self, k: int = 5, all_recs: bool = False):
        self.k = k
        self.all_recs = all_recs
        self._train: DataFrame | None = None
        self._pop: DataFrame | None = None

    def train(self, train_ratings: DataFrame) -> "PopularityRecommender":
        # the train set is read 4x (popularity, max degree, user list,
        # anti-join) — persist it once instead of replaying the upstream
        # split lineage per read
        self._train = train_ratings.persist()
        self._pop = (
            train_ratings.groupBy("item_id")
            .agg(F.count(F.lit(1)).alias("pop"))
        )
        return self

    def get_recommendations(self, k: int | None = None) -> DataFrame:
        k = k or self.k
        assert self._train is not None and self._pop is not None
        n_fetch = max_user_degree(self._train) + k
        # over-fetch -> anti-join -> truncate, expressed as array ops:
        # the global candidate list (max_degree + k items, desc pop) is
        # ONE broadcast array row; per user the plan is
        # slice(array_except(candidates, rated), 1, k) — array_except
        # preserves the first array's order, so this is row-for-row the
        # crossJoin + window + left-anti plan without shuffling a
        # users x candidates table (at 100 TB: a map-side-only stage
        # after the per-user collect_set).
        pop_src = (
            self._pop
            if self.all_recs  # every item is a candidate
            else self._pop.orderBy(F.desc("pop"), "item_id").limit(n_fetch)
        )
        top_items = (
            pop_src
            # collect_list order is not guaranteed after limit —
            # re-sort inside the array to pin (pop desc, item asc)
            .agg(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct((-F.col("pop")).alias("np"), F.col("item_id").alias("i")))
                    ),
                    lambda s: s["i"],
                ).alias("cand")
            )
        )
        rated = self._train.groupBy("user_id").agg(
            F.collect_set("item_id").alias("rated")
        )
        unseen = F.array_except("cand", "rated")
        picked = rated.join(F.broadcast(top_items)).select(
            "user_id",
            (unseen if self.all_recs else F.slice(unseen, 1, k)).alias("recs"),
        )
        return picked.select(
            "user_id", F.posexplode("recs").alias("_p", "item_id")
        ).select("user_id", "item_id", (F.col("_p") + 1).alias("rank"))


def topk_by_cosine_lsh(
    user_vecs: DataFrame,
    item_vecs: DataFrame,
    k: int,
    train: DataFrame,
    n_planes: int = 6,
    over_fetch: int | None = None,
    n_tables: int = 1,
) -> DataFrame:
    """The 100 TB scoring path: sign-LSH bucketed candidate generation
    instead of the exact O(U x I) crossJoin (same over-fetch ->
    anti-join -> truncate contract as topk_by_cosine; approximate —
    recall is tuned by n_planes per table and OR-amplified by
    n_tables — see similarity.cosine_lsh_topk).

    User/item ids are prefix-tagged before the shared-id LSH join so a
    user and an item with the same raw id can never be confused.
    """
    from .similarity import cosine_lsh_topk

    n_fetch = (over_fetch or max_user_degree(train)) + k
    items = item_vecs.select(
        F.concat(F.lit("i:"), F.col("item_id").cast("string")).alias("vec_id"),
        F.col("vec").alias("embedding"),
    )
    users = user_vecs.select(
        F.concat(F.lit("u:"), F.col("user_id").cast("string")).alias("vec_id"),
        F.col("vec").alias("embedding"),
    )
    cand = cosine_lsh_topk(items, users, k=n_fetch, n_planes=n_planes, n_tables=n_tables)
    scored = cand.select(
        F.expr("substring(query_id, 3)").alias("user_id"),
        F.expr("substring(neighbor_id, 3)").alias("item_id"),
        F.col("cosine").alias("score"),
    )
    return exclude_rated_and_truncate(scored, train, k)


def topk_by_cosine_broadcast(
    user_vecs: DataFrame,
    item_vecs: DataFrame,
    k: int,
    train: DataFrame,
    all_recs: bool = False,
) -> DataFrame:
    """Exact cosine top-k with a BROADCAST item array — the zero-shuffle
    exact plan for bounded item catalogs (the dim-table assumption the
    popularity recommender already documents).

    Row-for-row identical to :func:`topk_by_cosine` (unit-tested): per
    user, every item is scored (same zip_with/aggregate dot, same
    bits), sorted by (score desc, item asc) INSIDE an array via the
    NATURAL struct sort on (-score, item) — comparator-lambda
    array_sort is interpreted per comparison and an order of magnitude
    slower — then rated items are removed with order-preserving
    ``array_except`` (== anti-join after over-fetch) and the first k
    kept. No scored-pairs table, no per-user shuffle, no sort-merge
    anti-join: the only shuffles feed the two tiny aggregates.

    Scope: wins when the item catalog is SMALL (≲ a few thousand —
    per-row cost is |items| inside higher-order functions, which don't
    whole-stage-codegen). Measured at sf0.1 (15k users x 20k items)
    the windowed :func:`topk_by_cosine` is faster; at popularity-size
    candidate arrays this shape is the fastest exact plan. Use
    windowed or LSH for unbounded catalogs.
    """
    def normed(df: DataFrame, idc: str) -> DataFrame:
        staged = df.select(
            idc,
            "vec",
            F.sqrt(F.aggregate("vec", F.lit(0.0), lambda a, x: a + x * x)).alias("_norm"),
        )
        return staged.select(
            idc,
            F.when(
                F.col("_norm") > 0,
                F.transform("vec", lambda x: x / F.col("_norm")),
            ).otherwise(F.col("vec")).alias("vec"),
        )

    items_arr = normed(item_vecs, "item_id").agg(
        F.collect_list(F.struct(F.col("item_id").alias("i"), F.col("vec").alias("iv"))).alias("items")
    )
    item_t = dict(train.dtypes)["item_id"]
    rated = train.groupBy("user_id").agg(F.collect_set("item_id").alias("rated"))
    u = normed(user_vecs, "user_id").join(rated, "user_id", "left").select(
        "user_id",
        "vec",
        F.coalesce("rated", F.array().cast(f"array<{item_t}>")).alias("rated"),
    )
    scored = u.join(F.broadcast(items_arr)).select(
        "user_id",
        "rated",
        # natural struct sort on (-score, item) == (score desc, item
        # asc): the codegen'd ordering, no interpreted comparator
        F.array_sort(
            F.transform(
                "items",
                lambda s: F.struct(
                    (
                        -F.aggregate(
                            F.zip_with(F.col("vec"), s["iv"], lambda a, b: a * b),
                            F.lit(0.0),
                            lambda acc, x: acc + x,
                        )
                    ).alias("ns"),
                    s["i"].alias("i"),
                ),
            )
        ).alias("cand"),
    )
    unseen = F.array_except(F.transform("cand", lambda s: s["i"]), "rated")
    picked = scored.select(
        "user_id",
        (unseen if all_recs else F.slice(unseen, 1, k)).alias("recs"),
    )
    return picked.select(
        "user_id", F.posexplode("recs").alias("_p", "item_id")
    ).select("user_id", "item_id", (F.col("_p") + 1).alias("rank"))


def topk_by_cosine(
    user_vecs: DataFrame,
    item_vecs: DataFrame,
    k: int,
    train: DataFrame | None = None,
    over_fetch: int | None = None,
    all_recs: bool = False,
) -> DataFrame:
    """O3/M6: exact cosine top-k of items per user, then J6/O4.

    ``user_vecs``: (user_id, vec array<float/double>), ``item_vecs``:
    (item_id, vec). Vectors are L2-normalized once; similarity is a
    zip_with dot product — JVM-side, no Python.

    Exact crossJoin is O(U x I) — parity/testing path. At scale swap in
    similarity.cosine_lsh_topk.
    """
    def normed(df: DataFrame, idc: str) -> DataFrame:
        # materialize the O(dim) norm in a projection BEFORE the
        # per-element division lambda — an aggregate referenced inside
        # a transform lambda re-evaluates per element (O(dim^2)/row;
        # same pitfall functions/text.ngrams_from_tokens documents)
        staged = df.select(
            idc,
            "vec",
            F.sqrt(F.aggregate("vec", F.lit(0.0), lambda a, x: a + x * x)).alias("_norm"),
        )
        return staged.select(
            idc,
            F.when(
                F.col("_norm") > 0,
                F.transform("vec", lambda x: x / F.col("_norm")),
            ).otherwise(F.col("vec")).alias("vec"),
        )

    u = normed(user_vecs, "user_id")
    it = normed(item_vecs, "item_id")
    sim = F.aggregate(
        F.zip_with(F.col("u.vec"), F.col("i.vec"), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = (
        u.alias("u")
        .crossJoin(it.alias("i"))
        .select(F.col("u.user_id"), F.col("i.item_id"), sim.alias("score"))
    )
    if train is not None:
        if all_recs:
            # every unseen item stays ranked — no over-fetch prefilter
            return exclude_rated_and_truncate(scored, train, k, all_recs=True)
        n_fetch = (over_fetch or max_user_degree(train)) + k
        w = Window.partitionBy("user_id").orderBy(F.desc("score"), "item_id")
        scored = scored.withColumn("_r", F.row_number().over(w)).filter(
            F.col("_r") <= n_fetch
        ).drop("_r")
        return exclude_rated_and_truncate(scored, train, k)
    w = Window.partitionBy("user_id").orderBy(F.desc("score"), "item_id")
    ranked = scored.withColumn("rank", F.row_number().over(w))
    if not all_recs:
        ranked = ranked.filter(F.col("rank") <= k)
    return ranked.select("user_id", "item_id", "rank")
