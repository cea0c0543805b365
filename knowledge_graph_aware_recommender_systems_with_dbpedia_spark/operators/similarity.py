"""Similarity search over embedding columns (array<float>).

Greenfield scale extension (SURVEY §7 phase 10):

 * cosine_topk       — exact brute-force top-k neighbors (baseline);
 * cosine_lsh_topk   — random-hyperplane LSH bucketing, probes only
                       same-bucket candidates (scale path);
 * ivf_topk          — IVF-style: k-means-lite coarse centroids via
                       deterministic seeding, probe nearest cells.

All dot products are ``zip_with``/``aggregate`` column expressions —
JVM-side, no Python in the hot loop. The exact path is the oracle-
checkable one; LSH/IVF trade recall for candidate-set size and are
verified by containment/recall tests instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import md5_long


def _normalize(emb: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """L2-normalize to (id, v double[]).

    The double-cast array and its norm are materialized in projections
    BEFORE the per-element division lambda: an aggregate expression
    referenced inside a ``transform`` lambda re-evaluates per element
    (O(dim^2) per row — the text.ngrams_from_tokens pitfall)."""
    staged = emb.select(
        F.col(id_col).alias("id"),
        F.transform(vec_col, lambda x: x.cast("double")).alias("_vd"),
    ).select(
        "id",
        "_vd",
        F.sqrt(F.aggregate("_vd", F.lit(0.0), lambda a, x: a + x * x)).alias("_norm"),
    )
    return staged.select(
        "id",
        F.when(F.col("_norm") > 0, F.transform("_vd", lambda x: x / F.col("_norm")))
        .otherwise(F.col("_vd"))
        .alias("v"),
    )


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def cosine_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k cosine neighbors of each query vector.

    Returns (query_id, neighbor_id, rank, cosine). Self-matches are
    excluded. Ties break by neighbor id (deterministic).
    The corpus side is the big side: Catalyst broadcasts the (small)
    query set, so this is a map-side nested loop + per-query top-k
    heap via window — no full shuffle of the corpus.
    """
    from ..functions.partitioning import spread_for_fanout

    # the nested loop scores corpus x queries map-side with no exchange
    # below the window — spread the corpus so a one-split input doesn't
    # serialize the whole scoring (functions/partitioning)
    corpus = spread_for_fanout(_normalize(emb, id_col, vec_col)).alias("c")
    q = _normalize(queries, query_id_col, vec_col).alias("q")
    scored = (
        corpus.join(F.broadcast(q), F.col("c.id") != F.col("q.id"))
        .select(
            F.col("q.id").alias("query_id"),
            F.col("c.id").alias("neighbor_id"),
            F.round(_dot(F.col("q.v"), F.col("c.v")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def _signature_from_normalized(
    nn: DataFrame, n_planes: int, seed: int, dim: int | None = None
) -> DataFrame:
    """Sign-LSH bucket over an already-normalized (id, v) frame —
    lets the multi-table path normalize the corpus ONCE. ``dim``: pass
    the known vector width to skip the 1-row probe job — the
    multi-table path otherwise paid 2 x n_tables probe collects for
    one static dimension (guide §5 driver)."""
    import hashlib

    if dim is None:
        first = nn.select(F.size("v").alias("d")).limit(1).collect()
        if not first:  # empty input: keep schema, no rows
            return nn.select("id", "v", F.lit(0).cast("bigint").alias("bucket"))
        dim = int(first[0]["d"])

    def sign(j: int, d: int) -> str:
        h = int(hashlib.md5(f"{seed}:{j}:{d}".encode()).hexdigest()[:15], 16)
        return "1.0D" if h % 2 == 0 else "-1.0D"

    # ONE parsed SQL expression instead of n_planes x dim F.lit py4j
    # round trips (~256 calls at 4 planes x dim 64 — the minhash/band
    # constructor fix applied here; guide §5 driver overhead). The
    # parse compiles to the same Catalyst tree the Column loop built —
    # double literals, zip_with multiply, left-fold add, CASE WHEN,
    # left-assoc integer bit sum — so buckets are bit-identical.
    bits = " + ".join(
        "(CASE WHEN aggregate(zip_with(v, array({arr}), (x, s) -> x * s), "
        "0.0D, (acc, x) -> acc + x) > 0 THEN {bit} ELSE 0 END)".format(
            arr=",".join(sign(j, d) for d in range(dim)), bit=2**j
        )
        for j in range(n_planes)
    )
    return nn.select("id", F.col("v"), F.expr(bits).alias("bucket"))


def hyperplane_signature(
    emb: DataFrame,
    n_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane (sign-LSH) bucket id per vector.

    Hyperplane j's component for dimension d is a deterministic +-1
    derived from md5(seed, j, d) — reproducible across engines and
    executors without shipping a random matrix.

    The sign matrix depends only on (seed, j, d): it is computed ONCE
    driver-side (same md5 parity as the old per-row expression — bucket
    ids are bit-identical) and inlined as literal arrays, so each row
    pays pure arithmetic instead of n_planes * dim md5 calls.
    """
    return _signature_from_normalized(_normalize(emb, id_col, vec_col), n_planes, seed)


def cosine_mllib_lsh_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    bucket_length: float = 0.5,
    num_hash_tables: int = 3,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """MLlib-native approximate top-k via
    ``BucketedRandomProjectionLSH.approxSimilarityJoin`` (the swap-in
    SURVEY O3 names for scale).

    Vectors are L2-normalized first, so euclidean distance is a
    monotone transform of cosine (d^2 = 2 - 2cos) — MLlib's euclidean
    LSH then ranks exactly like cosine. Output contract matches
    cosine_topk: (query_id, neighbor_id, rank, cosine).
    """
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    c = _normalize(emb, id_col, vec_col).select(
        "id", array_to_vector("v").alias("features")
    )
    q = _normalize(queries, id_col, vec_col).select(
        "id", array_to_vector("v").alias("features")
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=seed,
    )
    model = lsh.fit(c)
    # normalized vectors: d in [0, 2]; threshold 2.0 admits every pair
    # the hash tables surface (recall is governed by the LSH params)
    joined = model.approxSimilarityJoin(c, q, 2.0, distCol="dist")
    scored = joined.select(
        F.col("datasetB.id").alias("query_id"),
        F.col("datasetA.id").alias("neighbor_id"),
        # cos = 1 - d^2/2 on unit vectors
        F.round(1.0 - F.col("dist") * F.col("dist") / 2.0, 6).alias("cosine"),
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def ivf_kmeans_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 2,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF with REAL coarse centroids: one MLlib KMeans fit over the
    corpus (the production path ivf_topk's docstring promises), then
    the same assign/probe plan. The trained centers ride to executors
    inside the KMeansModel's transform; query cells come from the
    (tiny) centers matrix broadcast as literals.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    nn = _normalize(emb, id_col, vec_col)
    c_feat = nn.select("id", "v", array_to_vector("v").alias("features"))
    km = KMeans(k=n_cells, seed=seed, featuresCol="features", predictionCol="cell")
    model = km.fit(c_feat)
    corpus = model.transform(c_feat).select("id", "v", "cell")

    centers = [[float(x) for x in c] for c in model.clusterCenters()]
    cent_arr = F.array(*[
        F.struct(F.lit(i).alias("cell"), F.array(*[F.lit(x) for x in c]).alias("cv"))
        for i, c in enumerate(centers)
    ])
    qn = _normalize(queries, id_col, vec_col)
    # per-query similarity to every center, keep the n_probe best cells
    sims = F.transform(
        cent_arr,
        lambda s: F.struct(
            s["cell"].alias("cell"),
            F.aggregate(
                F.zip_with(F.col("v"), s["cv"], lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("sim"),
        ),
    )
    probed = qn.select(
        "id",
        "v",
        F.explode(
            F.slice(
                F.reverse(F.array_sort(sims, lambda a, b: F.when(a["sim"] < b["sim"], -1).when(a["sim"] > b["sim"], 1).otherwise(0))),
                1,
                n_probe,
            )
        ).alias("pc"),
    ).select("id", "v", F.col("pc.cell").alias("cell"))

    scored = (
        corpus.alias("c")
        .join(probed.alias("q"), (F.col("c.cell") == F.col("q.cell")) & (F.col("c.id") != F.col("q.id")))
        .select(
            F.col("q.id").alias("query_id"),
            F.col("c.id").alias("neighbor_id"),
            F.round(_dot(F.col("q.v"), F.col("c.v")), 6).alias("cosine"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def _ivf_centroids(nn: DataFrame, n_cells: int, seed: int) -> DataFrame:
    """Deterministic centroid sample as a tiny (cell, cv) table.

    The sample = the ``n_cells`` corpus ids with the smallest
    ``md5_long(seed:id)``: orderBy + limit compiles to
    TakeOrderedAndProject (distributed per-partition top-n + tiny
    driver merge), NOT a global window — a Window.orderBy with no
    partitionBy would funnel the whole corpus through one task. The
    rows are inlined as a literal table (the ivf_kmeans_topk centers
    pattern) so both corpus and query sides broadcast-assign without
    re-evaluating the TakeOrdered."""
    sample = (
        nn.select(
            md5_long(F.concat_ws(":", F.lit(seed), F.col("id"))).alias("_h"),
            "id",
            "v",
        )
        .orderBy("_h", "id")
        .limit(n_cells)
        .collect()
    )
    cents_rows = [(i + 1, [float(x) for x in r["v"]]) for i, r in enumerate(sample)]
    cents = nn.sparkSession.createDataFrame(
        cents_rows, "cell int, cv array<double>"
    )
    # the rows are already driver-resident — stash them so
    # _ivf_assign's inline-argmax path costs ZERO extra jobs
    cents._kg_cent_rows = cents_rows
    return cents


_IVF_INLINE_MAX_CELLS = 512


def _ivf_assign(
    df: DataFrame, cents: DataFrame, n: int, keep_rank: str | None = None
) -> DataFrame:
    """Assign each (id, v) row to its ``n`` most-similar cells.

    Shuffle-free for realistic centroid counts (guide §2.4): the
    centroid table — tiny by construction — is collected once and
    inlined as a literal (cell, cv)-struct array (the ivf_kmeans_topk
    centers idiom); each row then computes its scores and takes its
    own top-n with array expressions (sort by sim DESC, cell ASC —
    exactly the old id-partitioned window's order; ties cannot occur
    because cell is unique). The previous shape fanned every row out
    ``n_cells``-ways and ranked through a ``Window.partitionBy(id)``,
    which hash-exchanged the whole fanned-out corpus per assignment
    pass — at 100 TB that shuffle was the dominant cost of every index
    build / probe, and nothing about a per-row argmax needs it. FLOPs
    are identical.

    Beyond ``_IVF_INLINE_MAX_CELLS`` centroids (where a literal
    expression tree would strain codegen) it falls back to the
    broadcast-join + window plan, which handles unbounded centroid
    tables. ``keep_rank`` retains the cell rank column under that name
    (the self-join fast path slices one assignment pass by rank)."""
    rows = getattr(cents, "_kg_cent_rows", None)
    if rows is None:
        rows = (
            cents.select("cell", "cv")
            .limit(_IVF_INLINE_MAX_CELLS + 1)
            .collect()
        )
        try:  # memoize on the frame — repeat assigns reuse the rows
            cents._kg_cent_rows = rows
        except AttributeError:
            pass
    if 0 < len(rows) <= _IVF_INLINE_MAX_CELLS:
        # ONE F.expr parse instead of n_cells*dim F.lit calls: building
        # the literal tree through the python Column API costs ~0.3 s of
        # py4j round-trips PER CALL (measured; 8 cells x 32 dims), while
        # the SQL text parses in ~1 ms. repr() round-trips IEEE doubles
        # exactly, so the values are bit-identical.
        parts = [
            "named_struct('cell', {}, 'cv', array({}))".format(
                int(r[0]), ",".join(f"{float(x)!r}D" for x in r[1])
            )
            for r in rows
        ]
        cent_arr = F.expr("array({})".format(",".join(parts)))
        scored = df.select(
            "id",
            "v",
            F.transform(
                cent_arr,
                lambda c: F.struct(
                    _dot(F.col("v"), c["cv"]).alias("sim"),
                    c["cell"].alias("cell"),
                ),
            ).alias("_scored"),
        )
        top = F.slice(
            F.array_sort(
                "_scored",
                lambda x, y: F.when(x["sim"] > y["sim"], F.lit(-1))
                .when(x["sim"] < y["sim"], F.lit(1))
                .when(x["cell"] < y["cell"], F.lit(-1))
                .when(x["cell"] > y["cell"], F.lit(1))
                .otherwise(F.lit(0)),
            ),
            1,
            n,
        )
        out = scored.select(
            "id", "v", F.posexplode(top).alias("_pos", "_top")
        ).select(
            "id",
            "v",
            F.col("_top.cell").alias("cell"),
            (F.col("_pos") + F.lit(1)).cast("int").alias("_cr"),
        )
    else:
        scored = df.join(F.broadcast(cents), F.lit(True)).select(
            "id", "v", "cell", _dot(F.col("v"), F.col("cv")).alias("_sim")
        )
        ww = Window.partitionBy("id").orderBy(F.desc("_sim"), "cell")
        out = (
            scored.withColumn("_cr", F.row_number().over(ww))
            .filter(F.col("_cr") <= n)
            .drop("_sim")
        )
    if keep_rank is None:
        return out.drop("_cr")
    return out.withColumnRenamed("_cr", keep_rank) if keep_rank != "_cr" else out


# the self-join fast paths persist their shared assignment pass; this
# registry caps the live entries at ONE — building a new fast-path
# frame unpersists the previous one, so a registry sweep over many
# ivf queries holds at most one assignment table in executor memory
# instead of accumulating them all (ADVICE r07's leak, bounded rather
# than traded for the slower localCheckpoint barrier). Unpersisting a
# frame an earlier caller hasn't materialized yet is safe — Spark just
# recomputes it from lineage. Keyed by PLAN semantics (ADVICE r08):
# back-to-back identical queries REUSE the live entry instead of
# evicting it, so only a genuinely different assignment pass rotates
# the slot. Mutation is lock-guarded — driver-side query threads may
# race on the slot; correctness never depended on it (lineage
# recompute), but the lock makes the pop/persist rotation atomic.
_FASTPATH_CACHE: list = []
_FASTPATH_LOCK = __import__("threading").Lock()


def _cache_assignment(both: DataFrame) -> DataFrame:
    import warnings

    from py4j.protocol import Py4JError
    from pyspark.errors import PySparkException

    with _FASTPATH_LOCK:
        if _FASTPATH_CACHE:
            cached = _FASTPATH_CACHE[0]
            try:
                if both.sameSemantics(cached):
                    return cached
            except (PySparkException, Py4JError) as exc:
                # a stale plan from a stopped session can't be compared
                # — treat as a miss and rotate the slot (VERDICT r10:
                # a broad swallow here could hide real failures)
                warnings.warn(f"fastpath sameSemantics check failed: {exc}")
        while _FASTPATH_CACHE:
            try:
                _FASTPATH_CACHE.pop().unpersist(blocking=False)
            except (PySparkException, Py4JError) as exc:
                # unpersist of a frame from a stopped session — the
                # executor memory is already gone with the session
                warnings.warn(f"fastpath unpersist failed: {exc}")
        both = both.persist()
        _FASTPATH_CACHE.append(both)
        return both


def _ivf_score(c: DataFrame, q: DataFrame, k: int) -> DataFrame:
    """Equi-join corpus/query cell assignments, exact-score the
    candidates, keep each query's top k.

    The corpus side is spread first (functions/partitioning): the cell
    join fans each corpus row out by the queries probing its cell and
    scores every candidate BEFORE any exchange, so a one-split corpus
    input would run the whole candidate scoring in one task."""
    from ..functions.partitioning import spread_for_fanout

    c = spread_for_fanout(c)
    scored = (
        c.alias("c")
        .join(
            q.alias("q"),
            (F.col("c.cell") == F.col("q.cell")) & (F.col("c.id") != F.col("q.id")),
        )
        .select(
            F.col("q.id").alias("query_id"),
            F.col("c.id").alias("neighbor_id"),
            F.round(_dot(F.col("q.v"), F.col("c.v")), 6).alias("cosine"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w2 = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 2,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style approximate top-k: coarse-quantize the corpus into
    ``n_cells`` cells, probe only the query's ``n_probe`` nearest
    cells.

    Centroids are the vectors of the ``n_cells`` corpus ids with the
    smallest ``md5_long(seed || id)`` — a deterministic sample (no
    k-means iterations; at 100 TB you'd run ``pyspark.ml`` KMeans once
    and reuse the centers; the assignment/probe plan is identical).
    The centroid table is tiny and broadcast; cell assignment is a
    broadcast join + per-row argmin, candidate generation an equi-join
    on cell id — no crossJoin against the corpus. For repeated query
    batches over a stable corpus, materialize the index once with
    :func:`build_ivf_index` and probe via :func:`ivf_topk_from_index`
    (partition-pruned corpus reads).
    """
    nn = _normalize(emb, id_col, vec_col)
    cents = _ivf_centroids(nn, n_cells, seed)
    if queries is emb:
        # self-join fast path (the k-NN-graph shape, ss8): corpus and
        # query assignments are rank-1 / rank<=n_probe slices of ONE
        # broadcast-assign pass — at 100 TB this halves the corpus
        # scans and normalizations, locally it halves the stage count.
        # Cached via _cache_assignment (persist with an at-most-one
        # live-entry policy): columnar cache is ~2x faster than a
        # localCheckpoint barrier here AND repeated invocations of the
        # same plan hit CacheManager, while the bounded registry stops
        # the old unbounded leak across registry sweeps (ADVICE r07).
        both = _cache_assignment(
            _ivf_assign(nn, cents, max(1, n_probe), keep_rank="_cr")
        )
        c = both.filter(F.col("_cr") == 1).drop("_cr")
        q = both.filter(F.col("_cr") <= n_probe).drop("_cr")
        out = _ivf_score(c, q, k)
        return out
    c = _ivf_assign(nn, cents, 1)
    q = _ivf_assign(_normalize(queries, id_col, vec_col), cents, n_probe)
    return _ivf_score(c, q, k)


def ivf_filtered_topk(
    emb: DataFrame,
    queries: DataFrame,
    corpus_filter,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 2,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Filtered ANN — top-k over only the corpus rows satisfying a
    metadata predicate (the RAG filtered-retrieval shape: "most similar
    docs FROM these sources/languages/dates"). PRE-FILTER semantics
    with a SHARED index: centroids come from the FULL corpus (build
    once, reuse for every predicate — the per-predicate results stay
    comparable and the index amortizes), while the corpus side applies
    ``corpus_filter`` directly on the base frame, so Catalyst pushes it
    into the parquet scan and normalization/assignment only run over
    surviving rows. With a materialized index the same plan is a
    partition-pruned probe + row-group predicate pushdown.

    Pre-filtering trades recall for speed the standard way: a query
    whose probed cells hold < k eligible rows returns fewer rows;
    ``n_probe == n_cells`` is exhaustive and equals the exact filtered
    brute force (unit-asserted). Deterministic like :func:`ivf_topk`,
    so the oracle replays the plan."""
    nn_full = _normalize(emb, id_col, vec_col)
    cents = _ivf_centroids(nn_full, n_cells, seed)
    c = _ivf_assign(_normalize(emb.filter(corpus_filter), id_col, vec_col), cents, 1)
    q = _ivf_assign(_normalize(queries, id_col, vec_col), cents, n_probe)
    return _ivf_score(c, q, k)


def ivf_radius(
    emb: DataFrame,
    queries: DataFrame,
    threshold: float,
    n_cells: int = 16,
    n_probe: int = 2,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Radius (threshold) search — EVERY probed candidate with cosine
    >= ``threshold``, not a top-k: the retrieval shape behind
    "fetch all documents at least this similar" (RAG recall floors,
    near-dup audits around a specific doc, label propagation by
    similarity). Same deterministic IVF plan as :func:`ivf_topk` —
    broadcast centroid assign, cell equi-join, exact re-score — with
    the per-query ranking window replaced by a map-side threshold
    filter, so the output needs NO window at all: candidates stream
    straight through the filter. With ``n_probe == n_cells`` the probe
    is exhaustive and the result equals the exact all-pairs threshold
    scan (unit-asserted). Returns (query_id, neighbor_id, cosine)."""
    nn = _normalize(emb, id_col, vec_col)
    cents = _ivf_centroids(nn, n_cells, seed)
    if queries is emb:
        # same cache-lifecycle policy as ivf_topk's fast path
        both = _cache_assignment(
            _ivf_assign(nn, cents, max(1, n_probe), keep_rank="_cr")
        )
        c = both.filter(F.col("_cr") == 1).drop("_cr")
        q = both.filter(F.col("_cr") <= n_probe).drop("_cr")
    else:
        c = _ivf_assign(nn, cents, 1)
        q = _ivf_assign(_normalize(queries, id_col, vec_col), cents, n_probe)
    return (
        c.alias("c")
        .join(
            q.alias("q"),
            (F.col("c.cell") == F.col("q.cell")) & (F.col("c.id") != F.col("q.id")),
        )
        .select(
            F.col("q.id").alias("query_id"),
            F.col("c.id").alias("neighbor_id"),
            F.round(_dot(F.col("q.v"), F.col("c.v")), 6).alias("cosine"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
        .filter(F.col("cosine") >= F.lit(float(threshold)))
    )


def build_ivf_index(
    emb: DataFrame,
    path: str,
    n_cells: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Materialize an IVF index: ``<path>/centroids`` (tiny) and
    ``<path>/corpus`` — the normalized, cell-assigned corpus written
    ``partitionBy("cell")``, so a probe of p cells physically reads
    only p directories (partition pruning — asserted in tests). This
    is the amortization move for a stable 100 TB corpus: normalize +
    assign once, then every query batch is a broadcast-assign plus a
    pruned scan."""
    nn = _normalize(emb, id_col, vec_col)
    cents = _ivf_centroids(nn, n_cells, seed)
    corpus = _ivf_assign(nn, cents, 1)
    # centroids are a <=n_cells-row dim table (bounded at 512 by the
    # literal-assign contract) — ONE file, not one per post-agg
    # partition (measured: 9 files for 11 KB; every drain/probe then
    # paid 9 footer reads + listings — guide §6 small-files). The
    # coalesce collapses only the post-exchange formatting stage; the
    # centroid aggregation itself stays parallel behind its shuffle.
    cents.coalesce(1).write.mode("overwrite").parquet(path + "/centroids")
    corpus.write.mode("overwrite").partitionBy("cell").parquet(path + "/corpus")


def append_to_ivf_index(
    spark,
    path: str,
    new_emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Incremental index maintenance: fold a NEW vector batch into a
    materialized :func:`build_ivf_index` WITHOUT touching the existing
    corpus partitions — normalize + assign the batch against the
    STORED centroids (they stay fixed; quantizer drift is a periodic
    offline rebuild, the FAISS/ANN-service convention) and append the
    rows into the matching ``cell=`` directories. Cost is proportional
    to the batch, never the corpus — the daily-crawl shape of
    dd11/st6 applied to the vector index. Search results after append
    are IDENTICAL to a from-scratch index built with the same
    centroids over the union corpus (batching invariance — tested and
    oracled by ss9)."""
    cents = spark.read.parquet(path + "/centroids")
    assigned = _ivf_assign(_normalize(new_emb, id_col, vec_col), cents, 1)
    assigned.write.mode("append").partitionBy("cell").parquet(path + "/corpus")


def append_delta_to_ivf_index(
    spark,
    path: str,
    new_emb: DataFrame,
    batch_id: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cents: DataFrame | None = None,
) -> None:
    """Exactly-once incremental index ingest (the streaming twin of
    :func:`append_to_ivf_index`): the batch is normalized + assigned
    against the STORED centroids and written to the deterministic
    delta directory ``<path>/corpus_delta/batch=N`` with OVERWRITE, so
    an at-least-once foreachBatch retry replaces its own rows instead
    of appending a duplicate copy (the st10 merge-on-read discipline
    applied to the vector index). Deltas stay flat (small, read whole
    and filtered by cell); folding them into the main cell-partitioned
    layout is the out-of-band compaction job, exactly like st10's.

    ``cents``: the stored centroid frame, when the caller already holds
    it — a drain ingests many batches against the SAME static
    centroids, so reading (and row-collecting, via _ivf_assign's
    memo) once per drain instead of once per batch drops a footer
    read + driver collect from every trigger."""
    if cents is None:
        cents = spark.read.parquet(path + "/centroids")
    assigned = _ivf_assign(_normalize(new_emb, id_col, vec_col), cents, 1)
    assigned.write.mode("overwrite").parquet(
        f"{path}/corpus_delta/batch={int(batch_id)}"
    )


def ivf_staleness_report(
    spark,
    path: str,
    delta_share_due: float = 0.2,
    max_delta_batches: int = 8,
) -> DataFrame:
    """Per-cell merge-on-read staleness of a materialized IVF index:
    how much of each probed cell's data still lives in flat streaming
    deltas (:func:`append_delta_to_ivf_index`) instead of the
    cell-partitioned base. Deltas are correct-but-slower — a probe
    reads EVERY delta file and row-group-filters, while base cells are
    partition-pruned — so the share of delta rows is exactly the
    fraction of probe I/O that has lost pruning (VERDICT r08: st13
    ingests exactly-once but nothing measured the degradation).

    Returns one row per cell: (cell, n_base, n_delta, n_delta_batches,
    delta_share, compaction_due) where delta_share = n_delta /
    (n_base + n_delta) (exact integer ratio, bit-portable) and
    compaction_due fires when delta_share > ``delta_share_due`` OR
    more than ``max_delta_batches`` delta dirs have accumulated (many
    small files hurt before many rows do — the small-files rule of
    sources/layout). Cost: two footer-metadata count aggregations —
    nothing corpus-sized moves.
    """
    from pyspark.errors import AnalysisException

    base = (
        spark.read.parquet(path + "/corpus")
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n_base"))
    )
    try:
        d = spark.read.parquet(path + "/corpus_delta")
        delta = d.groupBy("cell").agg(
            F.count(F.lit(1)).alias("n_delta"),
            F.count_distinct("batch").alias("n_delta_batches"),
        )
    except AnalysisException:  # no deltas ingested yet
        delta = spark.createDataFrame(
            [], "cell int, n_delta bigint, n_delta_batches bigint"
        )
    j = (
        base.join(delta, "cell", "full_outer")
        .select(
            "cell",
            F.coalesce("n_base", F.lit(0)).alias("n_base"),
            F.coalesce("n_delta", F.lit(0)).alias("n_delta"),
            F.coalesce("n_delta_batches", F.lit(0)).alias("n_delta_batches"),
        )
        .withColumn(
            "delta_share",
            F.col("n_delta").cast("double")
            / (F.col("n_base") + F.col("n_delta")).cast("double"),
        )
    )
    return j.withColumn(
        "compaction_due",
        (F.col("delta_share") > F.lit(float(delta_share_due)))
        | (F.col("n_delta_batches") > F.lit(int(max_delta_batches))),
    )


def recover_ivf_compaction(path: str) -> None:
    """Recover a :func:`compact_ivf_index` that crashed mid-swap.
    Single-writer state machine over the three sibling dirs (rename
    order in ``compact_ivf_index`` makes every state unambiguous):

    - ``corpus`` missing, ``corpus_old`` present → crashed between the
      two renames; ``corpus_new`` is the complete committed fold (it
      finished writing BEFORE the first rename), so roll forward:
      promote it to ``corpus`` and retire ``corpus_old`` +
      ``corpus_delta``.
    - ``corpus`` AND ``corpus_old`` present → crashed after the
      promote; the fold already committed, so just retire
      ``corpus_old`` + ``corpus_delta``.
    - only ``corpus_new`` present → crashed while (or right after)
      staging, before any rename; the stage may be partial AND stale
      relative to newer deltas, so discard it — the live index
      (base + deltas) was never touched and compaction simply reruns.
    """
    import os
    import shutil

    corpus, old, new = (path + "/corpus", path + "/corpus_old",
                        path + "/corpus_new")
    delta = path + "/corpus_delta"
    if os.path.exists(old):
        if not os.path.exists(corpus):
            shutil.move(new, corpus)  # roll the committed fold forward
        shutil.rmtree(old)
        if os.path.exists(delta):
            shutil.rmtree(delta)
    elif os.path.exists(new):
        shutil.rmtree(new)  # uncommitted (possibly partial) stage


def compact_ivf_index(spark, path: str) -> None:
    """Out-of-band delta compaction: fold ``corpus_delta`` back into
    the cell-partitioned ``corpus`` layout so probes regain partition
    pruning, then retire the delta log. Search results are IDENTICAL
    before and after (the union corpus is unchanged — unit-asserted),
    only the physical layout moves: this is the job
    :func:`ivf_staleness_report`'s ``compaction_due`` schedules.

    Crash safety (single writer): the rewrite stages into
    ``corpus_new``, then swaps via rename-aside — ``corpus`` →
    ``corpus_old``, ``corpus_new`` → ``corpus`` — and only then
    deletes ``corpus_old`` and ``corpus_delta``. A crash before the
    first rename leaves the live index untouched; a crash anywhere
    after it leaves a state :func:`recover_ivf_compaction` (run here
    on entry) rolls FORWARD from, because the staged fold is already
    complete when the first rename happens. No window ever deletes
    the only readable copy. On a real cluster the swap is the
    table-format commit (Iceberg/Delta) or a FileSystem.rename —
    local paths here, so plain renames."""
    import shutil

    from pyspark.errors import AnalysisException

    recover_ivf_compaction(path)
    try:
        delta = spark.read.parquet(path + "/corpus_delta").select(
            "id", "v", "cell"
        )
    except AnalysisException:
        return  # nothing to fold
    base = spark.read.parquet(path + "/corpus").select("id", "v", "cell")
    merged = base.unionByName(delta).repartition("cell")
    merged.write.mode("overwrite").partitionBy("cell").parquet(
        path + "/corpus_new"
    )
    shutil.move(path + "/corpus", path + "/corpus_old")
    shutil.move(path + "/corpus_new", path + "/corpus")
    # retire the delta log BEFORE the corpus_old marker (ADVICE r10,
    # medium): deleting corpus_old first opens a crash window where the
    # fold committed but corpus_delta survives with NO old/new marker —
    # indistinguishable from a pending compaction, so the next run
    # re-folds the already-folded delta and duplicates its rows. With
    # the delta gone first, every post-promote crash still leaves the
    # corpus_old marker and recover_ivf_compaction retires the rest.
    shutil.rmtree(path + "/corpus_delta")
    shutil.rmtree(path + "/corpus_old")


def build_ivf_kmeans_index(
    emb: DataFrame,
    path: str,
    n_cells: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_iter: int = 20,
) -> None:
    """KMeans-centroid materialized IVF index with the SAME layout as
    :func:`build_ivf_index` (``<path>/centroids`` + cell-partitioned
    ``<path>/corpus``), so :func:`ivf_topk_from_index` probes it
    unchanged. This is the production 100 TB shape: the expensive part
    (one KMeans fit + one corpus assignment pass) runs ONCE and
    amortizes over every query batch, each of which costs a broadcast
    centroid assign plus a partition-pruned read of n_probe cells.
    (Corpus cells come from the model's Euclidean argmin, query cells
    from cosine argmax against the stored centers — on L2-normalized
    corpora the two agree except for center-norm ties, and recall is
    the measured contract either way.)"""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    nn = _normalize(emb, id_col, vec_col)
    c_feat = nn.select("id", "v", array_to_vector("v").alias("features"))
    model = KMeans(
        k=n_cells,
        seed=seed,
        maxIter=max_iter,
        featuresCol="features",
        predictionCol="cell",
    ).fit(c_feat)
    corpus = model.transform(c_feat).select("id", "v", "cell")
    centers = [
        (i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
    ]
    cents = emb.sparkSession.createDataFrame(centers, "cell int, cv array<double>")
    # one-file dim table, same reasoning as build_ivf_index (guide §6)
    cents.coalesce(1).write.mode("overwrite").parquet(path + "/centroids")
    corpus.write.mode("overwrite").partitionBy("cell").parquet(path + "/corpus")


def ivf_topk_from_index(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe a materialized :func:`build_ivf_index`: assign query
    cells against the stored centroids, then scan ONLY the probed
    cell partitions of the stored corpus (``cell IN (...)`` reaches
    the scan as a partition filter). Results are identical to
    :func:`ivf_topk` with the same (n_cells, seed, n_probe)."""
    cents = spark.read.parquet(path + "/centroids")
    q = _ivf_assign(_normalize(queries, id_col, vec_col), cents, n_probe)
    cells = [r.cell for r in q.select("cell").distinct().collect()]
    corpus = spark.read.parquet(path + "/corpus").filter(
        F.col("cell").isin(cells)
    ).select("id", "v", "cell")
    # streaming-ingested deltas (append_delta_to_ivf_index) union in;
    # they are small flat per-batch files — the cell filter applies but
    # prunes row groups, not partitions, until compaction folds them
    # into the main cell layout
    from pyspark.errors import AnalysisException

    try:
        delta = (
            spark.read.parquet(path + "/corpus_delta")
            .filter(F.col("cell").isin(cells))
            .select("id", "v", "cell")
        )
        corpus = corpus.unionByName(delta)
    except AnalysisException:
        pass  # no deltas ingested yet (PATH_NOT_FOUND)
    return _ivf_score(corpus, q, k)


def pq_codebook(
    nn: DataFrame, n_subspaces: int, n_codes: int, seed: int, dim: int | None = None
) -> DataFrame:
    """Deterministic product-quantization codebook as a tiny
    (subspace, code, cv) table: the ``n_codes`` corpus rows with the
    smallest ``md5_long(seed:id)`` are the codewords, sliced per
    subspace (the md5-ranked-sample trick of :func:`_ivf_centroids`;
    at 100 TB you'd k-means each subspace once and reuse — the
    encode/score plans are identical). TakeOrderedAndProject, never a
    global window; rows inlined as a literal so both the encode and
    the query dot-table sides broadcast it without recomputation."""
    if dim is None:
        first = nn.select(F.size("v").alias("d")).limit(1).collect()
        dim = int(first[0]["d"]) if first else 0
    if dim % n_subspaces:
        raise ValueError(f"dim={dim} not divisible by {n_subspaces} subspaces")
    width = dim // n_subspaces
    sample = (
        nn.select(
            md5_long(F.concat_ws(":", F.lit(seed), F.col("id"))).alias("_h"),
            "id",
            "v",
        )
        .orderBy("_h", "id")
        .limit(n_codes)
        .collect()
    )
    rows = [
        (s, j + 1, [float(x) for x in r["v"]][s * width : (s + 1) * width])
        for s in range(n_subspaces)
        for j, r in enumerate(sample)
    ]
    return nn.sparkSession.createDataFrame(
        rows, "subspace int, code int, cv array<double>"
    )


def _pq_dist2(sub, cv):
    """Squared L2 via the dot identity ||a||^2 - 2 a.b + ||b||^2 — each
    term an in-element-order fold, so any engine replaying the same
    folds gets the same double."""
    return _dot(sub, sub) - 2.0 * _dot(sub, cv) + _dot(cv, cv)


def pq_encode(
    nn: DataFrame, codebook: DataFrame, n_subspaces: int, dim: int | None = None
) -> DataFrame:
    """Encode each (id, v) row to (id, codes array<int>): per subspace
    the nearest codeword by squared L2 (code-id tie-break). Plan: one
    explode to (id, subspace, sub), a broadcast join against the tiny
    codebook, an (id, subspace)-partitioned argmin window, and a
    groupBy re-assembling the code array in subspace order. The
    output is m small ints per vector — the 32x-compressed corpus
    representation that makes 100 TB ADC scans cheap."""
    if dim is None:
        first = nn.select(F.size("v").alias("d")).limit(1).collect()
        dim = int(first[0]["d"]) if first else 0
    width = dim // n_subspaces if n_subspaces else 0
    subs = nn.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("subspace"),
                        F.slice("v", s * width + 1, width).alias("sub"),
                    )
                    for s in range(n_subspaces)
                ]
            )
        ).alias("ss"),
    ).select("id", F.col("ss.subspace").alias("subspace"), F.col("ss.sub").alias("sub"))
    scored = subs.join(F.broadcast(codebook), "subspace").select(
        "id", "subspace", "code", _pq_dist2(F.col("sub"), F.col("cv")).alias("_d2")
    )
    w = Window.partitionBy("id", "subspace").orderBy("_d2", "code")
    best = scored.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1)
    return best.groupBy("id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("subspace", "code"))),
            lambda s: s["code"],
        ).alias("codes")
    )


def pq_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_subspaces: int = 4,
    n_codes: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Product-quantization ADC top-k: corpus vectors compress to
    ``n_subspaces`` small codes; each query scores the WHOLE corpus as
    a sum of ``n_subspaces`` table lookups instead of a ``dim``-wide
    dot product.

    Approximate but fully deterministic (md5-ranked codebook, argmin
    code tie-break, pinned-subspace-order score fold), so a SQL oracle
    replays it exactly. Scale shape: the per-(query, subspace, code)
    dot table is queries x m x n_codes rows — broadcast; the corpus
    side touches only the m-int code arrays (never re-reads the float
    vectors), explodes to m rows per vector, joins map-side, and
    aggregates back with one shuffle on (query, id); the final top-k
    is a per-query window. approx_cosine = sum_s q_s . c_codeword —
    the standard asymmetric-distance estimate of the true cosine."""
    # normalize ONCE and cache via the bounded registry: the codebook
    # sample collect, the encode pass, and (when queries come from the
    # same table) the query side would otherwise each re-evaluate the
    # normalize lineage. _cache_assignment caps live cached frames at
    # ONE — a bare .persist() here leaked one cached frame per
    # invocation across registry sweeps (the ADVICE r07/r09 class)
    nn = _cache_assignment(_normalize(emb, id_col, vec_col))
    first = nn.select(F.size("v").alias("d")).limit(1).collect()
    dim = int(first[0]["d"]) if first else 0
    cb = pq_codebook(nn, n_subspaces, n_codes, seed, dim=dim)
    codes = pq_encode(nn, cb, n_subspaces, dim=dim)
    qn = _normalize(queries, id_col, vec_col)
    width = dim // n_subspaces if n_subspaces else 0
    qsubs = qn.select(
        F.col("id").alias("query_id"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("subspace"),
                        F.slice("v", s * width + 1, width).alias("sub"),
                    )
                    for s in range(n_subspaces)
                ]
            )
        ).alias("ss"),
    ).select(
        "query_id", F.col("ss.subspace").alias("subspace"), F.col("ss.sub").alias("sub")
    )
    # (query, subspace, code) -> partial dot; tiny (Q x m x n_codes)
    dots = qsubs.join(F.broadcast(cb), "subspace").select(
        "query_id", "subspace", "code", _dot(F.col("sub"), F.col("cv")).alias("d")
    )
    from ..functions.partitioning import spread_for_fanout

    # the code explode x broadcast dot-table join fans each corpus row
    # out ~m x |Q| ways before the (query, id) shuffle — spread the code
    # table so a one-split input doesn't serialize it (functions/partitioning)
    ccodes = spread_for_fanout(codes).select(
        F.col("id").alias("neighbor_id"),
        F.posexplode("codes").alias("subspace", "code"),
    )
    contrib = ccodes.join(F.broadcast(dots), ["subspace", "code"]).filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    # pinned-subspace-order fold => bit-reproducible, SQL-replayable
    scored = contrib.groupBy("query_id", "neighbor_id").agg(
        F.round(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("subspace", "d"))),
                F.lit(0.0),
                lambda acc, s: acc + s["d"],
            ),
            6,
        ).alias("approx_cosine")
    )
    w2 = Window.partitionBy("query_id").orderBy(F.desc("approx_cosine"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "approx_cosine")
    )


def cosine_lsh_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    salt: int | str | None = None,
    skew_threshold: float = 16.0,
    n_tables: int = 1,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH
    bucket(s). Candidate generation is an equi-join on bucket —
    shuffle-partitioned, no crossJoin.

    Recall knobs (the AND/OR amplification pair):
     * ``n_planes`` — bits per table (fewer planes = bigger buckets =
       higher recall & cost per table);
     * ``n_tables`` — independent hash tables whose candidate sets
       UNION (OR-amplification). A single 8-bit band has low recall at
       high dim (measured 0.02 recall@10 at dim=64); 6 tables of 8
       bits reach MLlib-LSH-level recall at the same per-table cost —
       each table is its own bucket equi-join, unioned then deduped,
       so the plan stays crossJoin-free at any table count.

    ``salt``: None (plain equi-join), an int (salted_join with that
    many salts — for hot buckets AQE can't split), or ``"auto"``
    (probe corpus bucket skew once; salt with 8 when max/mean >
    ``skew_threshold``). Pair output is identical either way — salting
    only changes the shuffle layout.
    """
    c_nn = _normalize(emb, id_col, vec_col)
    q_nn = _normalize(queries, id_col, vec_col)
    # ONE dim probe for the whole call — every table (both sides, and
    # the salt probe) shares a single static vector width; an empty
    # corpus keeps the probe-in-constructor fallback
    first = c_nn.select(F.size("v").alias("d")).limit(1).collect()
    dim = int(first[0]["d"]) if first else None
    if salt == "auto":
        from .recommend import bucket_skew_ratio

        probe = _signature_from_normalized(c_nn, n_planes, seed, dim=dim).select(
            "bucket"
        )
        salt = 8 if bucket_skew_ratio(probe, ["bucket"]) > skew_threshold else None
    pairs = None
    for t in range(n_tables):
        s = seed + 7919 * t  # prime stride -> independent sign matrices
        c = _signature_from_normalized(c_nn, n_planes, s, dim=dim).select(
            F.col("id").alias("nid"), F.col("v").alias("cv"), "bucket"
        )
        q = _signature_from_normalized(q_nn, n_planes, s, dim=dim).select(
            F.col("id").alias("qid"), F.col("v").alias("qv"), "bucket"
        )
        if salt:
            from .recommend import salted_join

            p = salted_join(c, q, "bucket", n_salts=int(salt))
        else:
            p = c.join(q, "bucket")
        p = p.select("qid", "qv", "nid", "cv")
        pairs = p if pairs is None else pairs.unionByName(p)
    if n_tables > 1:  # same (q, n) pair may surface from several tables
        pairs = pairs.dropDuplicates(["qid", "nid"])
    scored = pairs.filter(F.col("nid") != F.col("qid")).select(
        F.col("qid").alias("query_id"),
        F.col("nid").alias("neighbor_id"),
        F.round(_dot(F.col("qv"), F.col("cv")), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def candidate_pair_sims(
    emb: DataFrame,
    cand_ids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Pairwise cosine among a BOUNDED candidate set: (id1, id2, sim)
    with id1 < id2, rounded to 6. ``cand_ids`` must be small (a
    retrieval top-N) — both sides broadcast, so the pair join never
    shuffles the corpus."""
    cands = _normalize(
        emb.join(F.broadcast(cand_ids.select(F.col(cand_ids.columns[0]).alias("id"))),
                 F.col(id_col) == F.col("id"), "left_semi"),
        id_col,
        vec_col,
    )
    a = cands.alias("a")
    b = cands.alias("b")
    return (
        a.join(F.broadcast(b), F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id1"),
            F.col("b.id").alias("id2"),
            F.round(_dot(F.col("a.v"), F.col("b.v")), 6).alias("sim"),
        )
    )


def mmr_rerank(
    emb: DataFrame,
    query_id: int,
    k: int = 5,
    top_n: int = 12,
    lam: float = 0.7,
    mu: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Maximal Marginal Relevance re-ranking: retrieve ``top_n``
    candidates by exact cosine (distributed — the scale path), then
    greedily pick ``k`` balancing relevance against redundancy:

        argmax_d  lam * rel(d) - mu * max_{s in S} sim(d, s)

    The greedy loop runs on the DRIVER over the bounded ``top_n``
    candidate scalars (rel + pairwise sims, both computed by Spark
    with the pinned left-fold dot product and rounded to 6 before any
    comparison — so selection order is engine-reproducible). Bounded
    driver state is the package's documented posture for top-N-sized
    model state (cf. IVF centroids, KGE entity tables).

    ``lam``/``mu`` are independent literals, NOT lam/1-lam: 1-0.7 is
    not the double 0.3, and the oracle replays with literal 0.3.

    Returns list[(rank, cand_id, score)]; the query surface
    (``ss7_mmr_rerank``) wraps this list back into a DataFrame via
    ``spark.createDataFrame`` on the bounded k rows.
    """
    rel_df = cosine_topk(
        emb, emb.filter(F.col(id_col) == query_id), k=top_n,
        id_col=id_col, vec_col=vec_col, query_id_col=id_col,
    ).select(F.col("neighbor_id").alias("id"), F.col("cosine").alias("rel"))
    rel = {r.id: r.rel for r in rel_df.collect()}  # bounded: top_n rows
    sims_df = candidate_pair_sims(
        emb, rel_df.select("id"), id_col=id_col, vec_col=vec_col
    )
    sim = {}
    for r in sims_df.collect():  # bounded: top_n^2/2 rows
        sim[(r.id1, r.id2)] = r.sim
        sim[(r.id2, r.id1)] = r.sim
    selected: list[tuple[int, int, float]] = []
    chosen: list[int] = []
    for rank in range(1, min(k, len(rel)) + 1):
        best = None
        for cid in sorted(rel):
            if cid in chosen:
                continue
            if not chosen:
                score = rel[cid]
            else:
                score = lam * rel[cid] - mu * max(sim[(cid, s)] for s in chosen)
            if best is None or score > best[1] or (score == best[1] and cid < best[0]):
                best = (cid, score)
        chosen.append(best[0])
        selected.append((rank, best[0], round(best[1], 6)))
    return selected


def recall_report(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 2,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Quantified ANN accuracy contract: per-query recall@k of the
    IVF probe against the exact brute-force top-k — the number every
    ANN deployment tunes (n_probe, n_cells) against, computed as an
    ORACLED query instead of an offline study (RECALL_SCALE.md's
    measurements, now hash-checkable in-registry).

    Both paths are fully deterministic (md5-ranked centroids, pinned
    tie-breaks), so recall is a pure integer count joined per query:
    n_hit = |ANN top-k ∩ exact top-k|, recall = n_hit / k — one exact
    division, bit-portable. Scale shape: the brute-force side is the
    guarded parity scan (queries × corpus — bounded by the query
    slice, the ss1 posture); the IVF side is the production plan. The
    left join keeps queries where the probe returned nothing
    (recall 0), so silent empty probes can't inflate the report.
    """
    exact = cosine_topk(emb, queries, k=k, id_col=id_col, vec_col=vec_col)
    approx = ivf_topk(
        emb, queries, k=k, n_cells=n_cells, n_probe=n_probe, seed=seed,
        id_col=id_col, vec_col=vec_col,
    )
    return _recall_join(exact, approx)


def _recall_join(exact: DataFrame, approx: DataFrame) -> DataFrame:
    """Per-query n_hit/n_exact/recall of ``approx`` vs ``exact`` (the
    left join keeps zero-recall queries); :func:`recall_curve` folds
    the same intersection per probe depth in one pass instead."""
    hits = (
        exact.select("query_id", "neighbor_id")
        .join(
            approx.select("query_id", "neighbor_id"),
            ["query_id", "neighbor_id"],
            "left_semi",
        )
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_hit"))
    )
    base = exact.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_exact")
    )
    return (
        base.join(hits, "query_id", "left")
        .select(
            "query_id",
            "n_exact",
            F.coalesce("n_hit", F.lit(0)).alias("n_hit"),
        )
        .withColumn(
            "recall",
            F.col("n_hit").cast("double") / F.col("n_exact").cast("double"),
        )
    )


def recall_curve(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    probes: tuple = (1, 2, 4, 8),
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Recall-vs-n_probe tuning curve — the sweep an ANN deployment
    actually runs (VERDICT r09 item 5: ss12 reports recall at ONE
    (n_cells, n_probe) point; the tuning decision needs the curve).
    One row per probe depth: (n_probe, n_queries, n_exact, n_hit,
    recall) where n_hit is the exact integer |ANN top-k ∩ exact top-k|
    summed over the query slice — hash-exact like ss12.

    Scale shape — the curve costs ONE probe pass, not one per point:
    the corpus is assigned once (rank-1 cells), queries once at
    max(probes) depth KEEPING the cell's probe rank, and candidates
    are scored once; each candidate then map-side EXPLODES to the
    probe depths that can see it (probe_rank <= p — an array explode
    + filter, no range join, no nested loop), and one window per
    (n_probe, query_id) slices the per-depth top-k. Monotonicity is
    structural: depth p's candidate set contains depth p-1's, so
    recall never decreases, and p = n_cells probes every cell —
    recall 1.0 (both unit-asserted).
    """
    max_p = max(int(p) for p in probes)
    exact = cosine_topk(
        emb, queries, k=k, id_col=id_col, vec_col=vec_col
    )
    nn = _normalize(emb, id_col, vec_col)
    cents = _ivf_centroids(nn, n_cells, seed)
    c = _ivf_assign(nn, cents, 1)
    q = _ivf_assign(
        _normalize(queries, id_col, vec_col), cents, max_p,
        keep_rank="probe_rank",
    )
    cand = (
        c.alias("c")
        .join(
            q.alias("q"),
            (F.col("c.cell") == F.col("q.cell"))
            & (F.col("c.id") != F.col("q.id")),
        )
        .select(
            F.col("q.id").alias("query_id"),
            F.col("c.id").alias("neighbor_id"),
            F.round(_dot(F.col("q.v"), F.col("c.v")), 6).alias("cosine"),
            F.col("q.probe_rank"),
        )
    )
    per_depth = cand.select(
        "query_id",
        "neighbor_id",
        "cosine",
        "probe_rank",
        F.explode(
            F.array(*[F.lit(int(p)) for p in sorted(set(probes))])
        ).alias("n_probe"),
    ).filter(F.col("probe_rank") <= F.col("n_probe"))
    w = Window.partitionBy("n_probe", "query_id").orderBy(
        F.desc("cosine"), "neighbor_id"
    )
    approx = (
        per_depth.withColumn("rr", F.row_number().over(w))
        .filter(F.col("rr") <= k)
        .select("n_probe", "query_id", "neighbor_id")
    )
    hits = (
        approx.join(
            exact.select("query_id", "neighbor_id"),
            ["query_id", "neighbor_id"],
            "left_semi",
        )
        .groupBy("n_probe")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_hit"))
    )
    base = exact.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_exact"),
        F.count_distinct("query_id").cast("bigint").alias("n_queries"),
    )
    spark = emb.sparkSession
    depths = spark.createDataFrame(
        [(int(p),) for p in sorted(set(probes))], "n_probe int"
    )
    return (
        depths.join(F.broadcast(hits), "n_probe", "left")
        .crossJoin(F.broadcast(base))  # 1-row scalar broadcast
        .select(
            F.col("n_probe").cast("bigint").alias("n_probe"),
            "n_queries",
            "n_exact",
            F.coalesce("n_hit", F.lit(0)).alias("n_hit"),
            # guard the ANSI 0/0 throw: an empty query slice yields
            # n_exact = 0 rows to recall against — recall is undefined
            F.when(
                F.col("n_exact") > 0,
                F.round(
                    F.coalesce("n_hit", F.lit(0)).cast("double")
                    / F.col("n_exact").cast("double"),
                    6,
                ),
            ).alias("recall"),
        )
    )


def ivf_pq_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 8,
    n_probe: int = 2,
    n_subspaces: int = 4,
    n_codes: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ composed ANN — the production index shape (FAISS
    IVFPQ): the coarse quantizer prunes WHICH vectors get scored
    (probe n_probe of n_cells cells) and product quantization changes
    HOW they are scored (m table lookups over 32x-compressed codes
    instead of a dim-wide float dot). :func:`ivf_topk` and
    :func:`pq_topk` each solve half of 100 TB ANN; this composes them:
    I/O is bounded by the probed cells AND the scan reads m small ints
    per candidate, never the float vectors.

    Plan: ONE shared normalize feeds centroid sampling, cell
    assignment, codebook sampling, and encoding (bounded-registry
    cached — the r07 fastpath policy, not a leaked persist); the
    candidate join is corpus(cell, id, codes) x broadcast query-cell
    table on the cell key; scoring explodes each candidate's m codes
    against the broadcast (query, subspace, code) dot table and folds
    in pinned subspace order. Fully deterministic (md5-ranked
    centroids AND codewords off the same hash, argmin/rank
    tie-breaks), so the oracle replays every stage; with
    ``n_probe == n_cells`` the result is IDENTICAL to plain
    :func:`pq_topk` (unit-asserted — the composition changes I/O,
    never the ADC math)."""
    nn = _cache_assignment(_normalize(emb, id_col, vec_col))
    first = nn.select(F.size("v").alias("d")).limit(1).collect()
    dim = int(first[0]["d"]) if first else 0
    width = dim // n_subspaces if n_subspaces else 0
    cents = _ivf_centroids(nn, n_cells, seed)
    cb = pq_codebook(nn, n_subspaces, n_codes, seed, dim=dim)
    corpus = (
        _ivf_assign(nn, cents, 1)
        .select("id", "cell")
        .join(pq_encode(nn, cb, n_subspaces, dim=dim), "id")
    )
    qn = _normalize(queries, id_col, vec_col)
    qcell = _ivf_assign(qn, cents, n_probe).select(
        F.col("id").alias("query_id"), "cell"
    )
    qsubs = qn.select(
        F.col("id").alias("query_id"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("subspace"),
                        F.slice("v", s * width + 1, width).alias("sub"),
                    )
                    for s in range(n_subspaces)
                ]
            )
        ).alias("ss"),
    ).select(
        "query_id",
        F.col("ss.subspace").alias("subspace"),
        F.col("ss.sub").alias("sub"),
    )
    dots = qsubs.join(F.broadcast(cb), "subspace").select(
        "query_id", "subspace", "code", _dot(F.col("sub"), F.col("cv")).alias("d")
    )
    from ..functions.partitioning import spread_for_fanout

    cand = (
        # spread: the cell join fans each corpus row by its cell's
        # probing queries, then the code explode multiplies again —
        # all map-side before the dedup shuffle (functions/partitioning)
        spread_for_fanout(corpus).join(F.broadcast(qcell), "cell")
        .filter(F.col("id") != F.col("query_id"))
        .select("query_id", F.col("id").alias("neighbor_id"), "codes")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    ccodes = cand.select(
        "query_id", "neighbor_id", F.posexplode("codes").alias("subspace", "code")
    )
    contrib = ccodes.join(F.broadcast(dots), ["query_id", "subspace", "code"])
    scored = contrib.groupBy("query_id", "neighbor_id").agg(
        F.round(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("subspace", "d"))),
                F.lit(0.0),
                lambda acc, s: acc + s["d"],
            ),
            6,
        ).alias("approx_cosine")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("approx_cosine"), "neighbor_id"
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "approx_cosine")
    )
