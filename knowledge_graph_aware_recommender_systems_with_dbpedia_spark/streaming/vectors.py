"""Streaming ANN index maintenance — ss9's incremental ingest at a
firehose (st13).

Greenfield scale extension: a production embedding pipeline never
rebuilds the vector index per batch — new vectors arrive continuously
and must become searchable at batch latency while the 100 TB base
corpus stays untouched. Each micro-batch assigns its vectors against
the STORED centroids (fixed quantizer — drift is a periodic offline
rebuild, the FAISS/ANN-service convention) and lands in an
exactly-once per-batch delta directory
(operators/similarity.append_delta_to_ivf_index);
``ivf_topk_from_index`` unions the deltas at search time, and
compaction folds them into the cell-partitioned layout out-of-band —
the same merge-on-read discipline as st10's materialized view.

The final index state is BATCHING-INVARIANT (per-row centroid argmax
does not depend on what else is in the batch), so the post-drain
search equals a from-scratch index built with the same centroids over
the union corpus — ss9's oracle applies verbatim to st13.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators.similarity import append_delta_to_ivf_index


def ann_ingest_stream(
    vec_stream: DataFrame,
    index_path: str,
    checkpoint_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """foreachBatch ingest of an embedding stream into a materialized
    IVF index's delta log. Returns the started query (availableNow
    drain — caller awaits)."""
    # one centroid read per DRAIN, not per trigger: the quantizer is
    # static for the drain's lifetime (single-writer contract), and
    # _ivf_assign memoizes the collected rows on this shared frame
    cents = vec_stream.sparkSession.read.parquet(index_path + "/centroids")

    def process(batch: DataFrame, batch_id: int) -> None:
        append_delta_to_ivf_index(
            batch.sparkSession,
            index_path,
            batch,
            batch_id,
            id_col=id_col,
            vec_col=vec_col,
            cents=cents,
        )

    return (
        vec_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
