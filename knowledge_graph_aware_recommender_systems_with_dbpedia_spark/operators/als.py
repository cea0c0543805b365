"""ALS matrix-factorization recommender (MLlib-backed).

The distributed-by-construction model the reference's single-node
lineup (pykeen KGE + gensim walks; ``framework/recommender/
model2class.py``) has no counterpart for: Spark MLlib's ALS is blocked
alternating least squares — factor matrices live partitioned across
executors, each update solves per-block normal equations, and
``recommendForAllUsers`` does the scoring as a blocked cross product
with per-block top-k pruning (never a full user x item materialization).
That makes it the model to reach for at the 100 TB interaction scale
where every O(|U||I|) scorer dies.

Plugin contract: ``framework/recommender/recommender.py:11-31``
(train / get_recommendations / get_user_recommendation / all_recs),
same as every other model in ``plans/registries.py``.

Stochastic stance (SURVEY §6): ALS factor values depend on the
blocked solve order, so rec_als has no DuckDB oracle — the driver
records a rows-only check, and unit tests pin the contract + a
ranking-quality floor instead (same stance as node2vec / KGE).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .recommend import Recommender, exclude_rated_and_truncate, max_user_degree


class ALSRecommender(Recommender):
    """Explicit-feedback ALS with the over-fetch -> anti-join -> truncate
    recommendation path (J6/O4, shared with every other recommender).

    User/item ids must fit in int32 (MLlib ALS constraint). At scales
    where raw ids exceed that, run the P6 dense-id relabeling first —
    the ids are dense by construction after it.
    """

    def __init__(
        self,
        k: int = 5,
        rank: int = 16,
        max_iter: int = 5,
        reg: float = 0.1,
        seed: int = 42,
        implicit: bool = False,
        all_recs: bool = False,
    ):
        self.k = k
        self.rank = rank
        self.max_iter = max_iter
        self.reg = reg
        self.seed = seed
        self.implicit = implicit
        self.all_recs = all_recs
        self._train: DataFrame | None = None
        self._model = None
        self._user_map: DataFrame | None = None
        self._item_map: DataFrame | None = None

    @staticmethod
    def _dense_map(df: DataFrame, col: str) -> DataFrame:
        """Deterministic dense int ids for an id column — the P6
        relabeling applied to the user/item DIM tables via the two-pass
        bucketed rank (operators/ids.dense_ids), so a 10^8-row
        dimension never funnels through one window task."""
        from .ids import dense_ids

        return dense_ids(df.select(col).distinct(), [col], "_idx").select(
            F.col(col).alias(f"_{col}_orig"),
            F.col("_idx").cast("int").alias(f"_{col}_idx"),
        )

    def train(self, train_ratings: DataFrame) -> "ALSRecommender":
        from pyspark.ml.recommendation import ALS

        # read twice (fit, rated-exclusion) -> persist once
        self._train = train_ratings.select("user_id", "item_id", "rating").persist()
        numeric = {"tinyint", "smallint", "int", "bigint", "float", "double"}
        dtypes = dict(self._train.dtypes)
        self._user_map = self._item_map = None
        fit_df = self._train
        needs_remap = (
            dtypes["user_id"] not in numeric or dtypes["item_id"] not in numeric
        )
        wide = {"bigint", "float", "double"}
        if not needs_remap and (
            dtypes["user_id"] in wide or dtypes["item_id"] in wide
        ):
            # MLlib ALS requires ids within int32 range; numeric ids
            # beyond it would fail executor-side with an opaque error —
            # detect up front (one small agg over the persisted train)
            # and fall through to the same dense remap used for strings.
            # Only runs when the dtype can actually exceed int32 — an
            # int-or-narrower column provably can't (ADVICE r04), so the
            # common case skips the extra Spark job.
            int32_max = (1 << 31) - 1
            mx = self._train.agg(
                F.max(F.abs(F.col("user_id"))).alias("u"),
                F.max(F.abs(F.col("item_id"))).alias("i"),
            ).first()
            needs_remap = (mx.u or 0) > int32_max or (mx.i or 0) > int32_max
        if needs_remap:
            # YAML-surface datasets carry string ids — remap to dense
            # ints for MLlib, map back after scoring
            self._user_map = self._dense_map(self._train, "user_id").persist()
            self._item_map = self._dense_map(self._train, "item_id").persist()
            fit_df = (
                self._train.join(
                    self._user_map,
                    F.col("user_id") == F.col("_user_id_orig"),
                )
                .join(self._item_map, F.col("item_id") == F.col("_item_id_orig"))
                .select(
                    F.col("_user_id_idx").alias("user_id"),
                    F.col("_item_id_idx").alias("item_id"),
                    "rating",
                )
            )
        als = ALS(
            userCol="user_id",
            itemCol="item_id",
            ratingCol="rating",
            rank=self.rank,
            maxIter=self.max_iter,
            regParam=self.reg,
            seed=self.seed,
            implicitPrefs=self.implicit,
            coldStartStrategy="drop",
            nonnegative=False,
        )
        self._model = als.fit(fit_df)
        return self

    def _n_items(self) -> int:
        # itemFactors is the bounded item-dim table
        return self._model.itemFactors.count()

    def get_recommendations(self, k: int | None = None) -> DataFrame:
        k = k or self.k
        assert self._model is not None and self._train is not None
        if self.all_recs:
            n_fetch = self._n_items()
        else:
            # over-fetch so the anti-join can never starve a user:
            # a user's rated items can occupy at most max_degree slots
            n_fetch = max_user_degree(self._train) + k
        recs = self._model.recommendForAllUsers(n_fetch)
        scored = recs.select(
            "user_id", F.explode("recommendations").alias("r")
        ).select(
            "user_id",
            F.col("r.item_id").alias("item_id"),
            F.col("r.rating").cast("double").alias("score"),
        )
        if self._user_map is not None:
            # translate dense ints back to the caller's id space
            scored = (
                scored.join(
                    F.broadcast(self._user_map),
                    F.col("user_id") == F.col("_user_id_idx"),
                )
                .join(
                    F.broadcast(self._item_map),
                    F.col("item_id") == F.col("_item_id_idx"),
                )
                .select(
                    F.col("_user_id_orig").alias("user_id"),
                    F.col("_item_id_orig").alias("item_id"),
                    "score",
                )
            )
        return exclude_rated_and_truncate(
            scored, self._train, k, all_recs=self.all_recs
        )
