"""End-to-end streaming curation — the full training-data ingest
pipeline in ONE availableNow drain (st15).

Greenfield scale extension: the batch curation pipelines (dp2/dp5)
have a streaming twin in production — documents arrive continuously
and each micro-batch must be quality-gated, near-dup-checked against
the existing corpus, and made searchable, WITHOUT ever re-scanning the
corpus per trigger. This module composes the already-tested stages
inside a single ``foreachBatch``:

 1. **Quality gate** (st11's machinery): the batch's expectation
    counter rows land exactly-once in ``metrics_dir/batch_id=N``
    (OVERWRITE — at-least-once retries replace, never double-count),
    and a row-level ``quality_score >= tau`` filter curates the batch
    itself;
 2. **Incremental near-dup dedup** (st6 / dd11): survivors are
    LSH-banded against the ONCE-BUILT, persisted corpus band/shingle
    index and exact-verified — per-trigger cost proportional to the
    batch, never the corpus;
 3. **ANN index ingest** (st13): survivors' embeddings (inner join to
    the static embedding table — only embedded docs are indexable)
    assign against the STORED centroids into the exactly-once delta
    dir ``index/corpus_delta/batch=N``; :func:`run_curation_drain`
    closes the loop by consulting the staleness report after the
    drain and firing compaction when due (st14 → st16).

Every stage's per-doc verdict depends only on (doc, static state), so
the final index content is BATCHING-INVARIANT and a composed batch
oracle (quality filter -> dd11 anti-select -> centroid assignment)
applies verbatim under any micro-batch split — the property st4/st5/
st6/st13 each assert for their own stage, now asserted end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import quality_score
from ..operators.dedup import (
    build_corpus_dedup_index,
    dedup_against_corpus,
    dedup_state_rows,
    greedy_state_dedup_drops,
)
from ..operators.expectations import Check
from ..operators.similarity import (
    append_delta_to_ivf_index,
    compact_ivf_index,
    ivf_staleness_report,
    recover_ivf_compaction,
)
from .quality import write_batch_counts


def curation_pipeline_stream(
    docs_stream: DataFrame,
    corpus: DataFrame,
    index_path: str,
    metrics_dir: str,
    checkpoint_dir: str,
    embeddings: DataFrame,
    checks: list[Check] | None = None,
    quality_threshold: float = 0.68,
    bands: int = 8,
    n_hashes: int = 16,
    n: int = 3,
    verify_threshold: float = 0.1,
    id_col: str = "doc_id",
    text_col: str = "text",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
    corpus_state=None,
    drain_state_dir: str | None = None,
    state_compact_dirs: int = 8,
):
    """Start the composed curation drain over a document stream;
    returns the started StreamingQuery (availableNow — caller awaits).
    The caller must have materialized the base IVF index at
    ``index_path`` (operators/similarity.build_ivf_index over the
    corpus embeddings). ``corpus_state`` — the persisted
    ``build_corpus_dedup_index`` pair — is REQUIRED (ADVICE r10: the
    old build-if-None path persisted two DataFrames but returned only
    the StreamingQuery, so direct callers had no handle to unpersist
    and every invocation stranded two persisted frames — the exact
    leak class r10 closed for run_curation_drain). Use
    :func:`run_curation_drain`, which builds the state, scopes the
    persist to the drain, and retires it in a ``finally``."""
    if checks is None:
        checks = [Check("text_present", "completeness", text_col, 1.0)]

    if corpus_state is None:
        raise ValueError(
            "curation_pipeline_stream requires corpus_state (the persisted "
            "build_corpus_dedup_index pair) so its lifecycle has an owner — "
            "use run_curation_drain, which builds, persists, and retires it."
        )
    state = corpus_state
    emb = embeddings.select(
        F.col(vec_id_col), F.col(vec_col)
    )
    # one centroid read per DRAIN, not per trigger (static quantizer,
    # single-writer contract); _ivf_assign memoizes the collected rows
    # on this shared frame so later batches skip the driver collect too
    cents = corpus.sparkSession.read.parquet(index_path + "/centroids")

    def process(batch: DataFrame, batch_id: int) -> None:
        curate_batch(
            batch, batch_id, corpus, state, emb, index_path, metrics_dir,
            checks, quality_threshold, bands, n_hashes, n, verify_threshold,
            id_col, text_col, vec_id_col, vec_col, drain_state_dir,
            state_compact_dirs, cents,
        )

    import os

    return (
        docs_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", os.path.join(checkpoint_dir, "curation"))
        .trigger(availableNow=True)
        .start()
    )


def run_curation_drain(
    docs_stream: DataFrame,
    corpus: DataFrame,
    index_path: str,
    metrics_dir: str,
    checkpoint_dir: str,
    embeddings: DataFrame,
    checks: list[Check] | None = None,
    quality_threshold: float = 0.68,
    bands: int = 8,
    n_hashes: int = 16,
    n: int = 3,
    verify_threshold: float = 0.1,
    id_col: str = "doc_id",
    text_col: str = "text",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
    compact_if_due: bool = True,
    delta_share_due: float = 0.2,
    max_delta_batches: int = 8,
    intra_drain_dedup: bool = False,
    state_compact_dirs: int = 8,
) -> bool:
    """Blocking curation drain with a COMPLETE index lifecycle
    (VERDICT r09 item 2: st14 computed ``compaction_due`` but nothing
    consumed it, so st15's deltas accumulated unboundedly).

    ``intra_drain_dedup``: when True, new docs are ALSO deduped
    against the other new docs of the same drain (within and across
    micro-batches — VERDICT r10 item 1: the corpus index covers only
    pre-drain docs, so near-dups arriving together both survived);
    the per-batch dedup state lives under
    ``checkpoint_dir/drain_state`` — the checkpoint's lifetime IS the
    drain's, so a checkpoint-resumed drain finds exactly the state
    its committed batches wrote. See :func:`curate_batch` for the
    keep-smallest-id contract and its batching-invariance condition.
    ``state_compact_dirs``: once more than this many per-batch state
    dirs accumulate WITHIN the drain, the next batch folds them into
    the batch=-1 base before reading (VERDICT r11 item 1 — caps the
    per-batch state listing/read at O(threshold) instead of O(B),
    killing the O(B^2) term over a long drain); the end-of-drain fold
    below still runs for whatever tail the last trigger left.

    Builds + persists the corpus dedup state, runs the availableNow
    drain to completion, unpersists the state in a ``finally`` (the
    r09 ADVICE leak — every drain invocation used to strand two
    persisted DataFrames), then consults
    :func:`~..operators.similarity.ivf_staleness_report` and, if ANY
    cell trips the trigger, folds the deltas back into the
    cell-partitioned base via
    :func:`~..operators.similarity.compact_ivf_index` (crash-safe
    rename-aside swap; search-invariant). Returns True iff compaction
    fired. End-of-drain is the right cadence for availableNow: the
    drain is the unit of ingest, and compacting between drains keeps
    every FUTURE probe partition-pruned without racing the writer."""
    spark = corpus.sparkSession
    # the drain is the index's single writer, so it owns crash
    # recovery: a compaction that died mid-swap on the PREVIOUS drain
    # left corpus_old/corpus_new markers (and possibly no corpus dir);
    # roll it forward before reading or ingesting anything
    recover_ivf_compaction(index_path)
    buckets, shingles = build_corpus_dedup_index(
        corpus, bands, n_hashes, n, id_col, text_col
    )
    state = (buckets.persist(), shingles.persist())
    import os

    from ..operators.dedup import compact_dedup_state, recover_dedup_state_compaction

    drain_state_dir = (
        os.path.join(checkpoint_dir, "drain_state") if intra_drain_dedup else None
    )
    if drain_state_dir is not None:
        # same single-writer recovery duty as the IVF swap above: a
        # state compaction that died mid-swap on the previous drain
        # rolls forward before any batch reads the state
        recover_dedup_state_compaction(drain_state_dir)
    try:
        curation_pipeline_stream(
            docs_stream, corpus, index_path, metrics_dir, checkpoint_dir,
            embeddings, checks, quality_threshold, bands, n_hashes, n,
            verify_threshold, id_col, text_col, vec_id_col, vec_col,
            corpus_state=state, drain_state_dir=drain_state_dir,
            state_compact_dirs=state_compact_dirs,
        ).awaitTermination()
    finally:
        buckets.unpersist()
        shingles.unpersist()
    if drain_state_dir is not None:
        # fold this drain's per-batch state dirs into the single base
        # partition (small-files control — semantics preserved, see
        # operators/dedup.compact_dedup_state)
        compact_dedup_state(spark, drain_state_dir)
    if not compact_if_due:
        return False
    due = (
        ivf_staleness_report(
            spark, index_path, delta_share_due, max_delta_batches
        )
        .filter(F.col("compaction_due"))
        .limit(1)
        .count()
        > 0
    )
    if due:
        compact_ivf_index(spark, index_path)
    return due


def curate_batch(
    batch: DataFrame,
    batch_id: int,
    corpus: DataFrame,
    corpus_state,
    emb: DataFrame,
    index_path: str,
    metrics_dir: str,
    checks: list[Check],
    quality_threshold: float = 0.68,
    bands: int = 8,
    n_hashes: int = 16,
    n: int = 3,
    verify_threshold: float = 0.1,
    id_col: str = "doc_id",
    text_col: str = "text",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
    drain_state_dir: str | None = None,
    state_compact_dirs: int = 8,
    cents: DataFrame | None = None,
) -> None:
    """One micro-batch of the curation drain — module-level so the
    at-least-once retry contract is directly testable: every write is
    an OVERWRITE of a batch-id-deterministic partition (metric rows in
    ``metrics_dir/batch_id=N``, index rows in
    ``corpus_delta/batch=N``, intra-drain dedup state in
    ``drain_state_dir/state/batch=N``), so re-running the
    SAME (batch, batch_id) replaces its own output bit-for-bit instead
    of appending a duplicate copy.

    ``drain_state_dir``: when set, stage 2b also dedups NEW docs
    against the other new docs of the SAME drain (within-batch and
    across its micro-batches) — see the inline contract note. When
    None (the default) the drain keeps the dd11 corpus-only
    semantics: every per-doc verdict depends only on (doc, static
    state), so the output is invariant under ANY re-batching of the
    stream, not just order-preserving splits."""
    # 1. quality gate: exactly-once metric log + row-level curation.
    # The metric write touches only (batch, checks) — fully independent
    # of the dedup/index chain below — so it runs CONCURRENTLY with
    # stage 2/3 (guide §2.6: overlap independent jobs; its tasks
    # back-fill executors idled by the dedup chain's stragglers). The
    # future is joined in the finally below, BEFORE foreachBatch
    # returns: the trigger cannot commit until the metric partition is
    # written, so the at-least-once overwrite contract is unchanged.
    from concurrent.futures import ThreadPoolExecutor

    metrics_pool = ThreadPoolExecutor(max_workers=1)
    metrics_fut = metrics_pool.submit(
        write_batch_counts, batch, checks, metrics_dir, batch_id
    )
    # One broadcast-gate probe per trigger (VERDICT r14 item 3): the
    # micro-batch frame is scan-backed, so the optimizer estimate is
    # the actual file bytes of the trigger's input — a normal batch
    # passes and every batch-derived frame below broadcasts as before;
    # a backfill-sized first trigger fails the gate and the whole chain
    # degrades to planner-chosen shuffle joins instead of OOMing on an
    # unbounded broadcast. The verdict is shared by every stage of this
    # trigger (they all broadcast O(batch)-bounded frames).
    from ..functions.partitioning import batch_fits_broadcast

    bb = batch_fits_broadcast(batch)
    bcast = F.broadcast if bb else (lambda df: df)
    curated = batch.filter(
        quality_score(F.col(text_col)) >= F.lit(float(quality_threshold))
    )
    # 2. near-dup dedup against the persisted corpus index. The
    # candidate frame is persisted through THIS batch only, via the
    # registry drained in the finally below — computed once per batch
    # (not 3x, the r10 cache_candidates=False recompute tradeoff) with
    # zero net persisted frames after the batch (VERDICT r10 item 3;
    # a fire-and-forget .cache() per micro-batch is never reaped by
    # the CacheManager — the r09 ADVICE leak class).
    batch_caches: list = []
    try:
        # ONE tokenize+shingle pass over the batch text per trigger
        # (guide §2.4): the corpus-dedup band signatures, the corpus-
        # dedup Jaccard verify, and (below) the intra-drain state rows
        # all derive from this persisted frame — previously each
        # consumer re-tokenized the batch from the parquet source.
        from ..operators.dedup import doc_shingles

        cur_shingles = doc_shingles(curated, id_col, text_col, n).persist()
        batch_caches.append(cur_shingles)
        survivors = dedup_against_corpus(
            curated,
            corpus,
            bands=bands,
            n_hashes=n_hashes,
            n=n,
            verify_threshold=verify_threshold,
            id_col=id_col,
            text_col=text_col,
            corpus_state=corpus_state,
            cache_registry=batch_caches,
            new_shingles=cur_shingles,
            broadcast_batch=bb,
        )
        # 2b. intra-drain new-vs-new dedup (VERDICT r10 item 1: the
        # corpus index covers only PRE-drain docs, so two near-dups
        # arriving within one drain both survived). Every corpus-
        # surviving curated doc's bands/shingles land in an
        # exactly-once per-batch state partition FIRST (overwrite —
        # retries replace), then one band equi-join of this batch
        # against the accumulated state (batch <= N, which includes
        # this batch itself, so within-batch pairs need no second
        # path) verifies candidates and drops a doc iff a verified
        # near-dup with a SMALLER id has been seen. With ids monotone
        # in arrival order (the crawl-ingest norm) this greedy rule
        # equals the global "no smaller-id verified neighbor among
        # the drain's corpus-surviving curated docs" — batch-split
        # invariant and replayable by a batch oracle; dropped docs
        # STAY in the state so duplicate chains remain suppressed.
        # Per-trigger cost is batch-vs-drain, never corpus-sized.
        if drain_state_dir is not None:
            spark = batch.sparkSession
            # mid-drain small-files control (VERDICT r11 item 1): fold
            # the accumulated per-batch state dirs into the base BEFORE
            # this batch writes its own dir or reads the state — the
            # one point in the trigger where no lazy plan can reference
            # the pre-fold layout. Threshold-gated; the check itself is
            # a pure listing (no Spark job until a fold actually fires)
            from ..operators.dedup import maybe_compact_dedup_state

            maybe_compact_dedup_state(
                spark, drain_state_dir, max_state_dirs=state_compact_dirs
            )
            # the corpus-surviving frame is consumed three times below
            # (the state write, the new-side of the band join, the
            # final delta write) and its lineage embeds the whole
            # batch-vs-corpus dedup join — persist it through the
            # batch registry or every consumer replays that join
            survivors = survivors.persist()
            batch_caches.append(survivors)
            # survivor shingles = the shared batch-shingle frame
            # filtered to survivor ids (survivors ⊆ curated) — no
            # re-tokenize; the id set is batch-bounded so the semi-join
            # is a map-side broadcast probe of the cached shingles
            surv_shingles = cur_shingles.join(
                bcast(survivors.select(F.col(id_col).alias("id"))),
                "id",
                "left_semi",
            ).persist()
            batch_caches.append(surv_shingles)
            dedup_state_rows(
                survivors, bands, n_hashes, n, id_col, text_col,
                shingles=surv_shingles,
            ).write.mode("overwrite").parquet(
                f"{drain_state_dir}/state/batch={int(batch_id)}"
            )
            seen = spark.read.parquet(f"{drain_state_dir}/state").filter(
                F.col("batch") <= int(batch_id)
            )
            nn_drops = greedy_state_dedup_drops(
                seen,
                batch_id,
                verify_threshold=verify_threshold,
                cache_registry=batch_caches,
                broadcast_batch=bb,
            ).withColumnRenamed("id", id_col)
            # drop set ⊆ batch ids — broadcast so the batch is not
            # shuffled for the anti-join (guide §3.1); runtime-gated
            survivors = survivors.join(bcast(nn_drops), id_col, "left_anti")
        # 3. index the survivors' embeddings as an exactly-once delta.
        # Broadcast the batch-sized id set so the (corpus-scale)
        # embedding table is semi-joined map-side, never shuffled
        # (guide §3.1/§3.2 — the emb scan still prunes to two columns);
        # runtime-gated like the rest of the trigger's batch broadcasts
        batch_emb = bcast(
            survivors.select(F.col(id_col).alias("_id"))
        ).join(
            emb, F.col("_id") == F.col(vec_id_col), "inner"
        ).select(vec_id_col, vec_col)
        append_delta_to_ivf_index(
            batch.sparkSession,
            index_path,
            batch_emb,
            batch_id,
            id_col=vec_id_col,
            vec_col=vec_col,
            cents=cents,
        )
    finally:
        # join the concurrent metric write before the trigger returns
        # (and so before the streaming commit); shutdown() alone would
        # swallow a failed write's exception
        try:
            metrics_fut.result()
        finally:
            metrics_pool.shutdown()
            for cached in batch_caches:
                cached.unpersist(blocking=False)
