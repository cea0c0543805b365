"""Custom stateful streaming operator: applyInPandasWithState sessionizer.

``session_window`` covers fixed-gap sessions (streaming/events.py);
this module is the template for stateful semantics Spark's built-in
windows can't express — per-key state lives in the state store,
batches arrive as Arrow-backed pandas frames, and the operator decides
what to emit and when.

Semantics (fixed gap, matching batch ev2 / streaming sessionize):
per user, events sorted by time; a gap > ``gap_s`` closes the current
session. Every batch emits the user's sessions *as currently known*
(output mode ``update`` — a session extended by a later batch is
re-emitted with the same (user_id, start_s) key and larger
n_events/end_s; consumers keep the last row per key).

State schema: (start_us, end_us, n) of the single open session.
Closed sessions are emitted immediately and never re-enter state, so
state size is O(1) per user — this is the property that makes the
operator safe at 100 TB (state does not grow with history).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("start_s", LongType()),
        StructField("end_s", LongType()),
        StructField("n_events", LongType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("end_us", LongType()),
        StructField("n", LongType()),
    ]
)


def _session_fn(gap_s: int):
    gap_us = gap_s * 1_000_000

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            start_us, end_us, n = state.get
        else:
            start_us = end_us = n = None

        out: list[tuple[int, int, int, int]] = []
        # one group's micro-batch can span MULTIPLE Arrow chunks
        # (> arrow.maxRecordsPerBatch rows): sorting per chunk would
        # let a later chunk's earlier timestamp rewind end_us and
        # split/merge sessions wrongly — concatenate, sort ONCE.
        chunks = [pdf["tus"] for pdf in pdfs]
        if len(chunks) == 1:
            tss = chunks[0]
        elif chunks:
            tss = pd.concat(chunks)
        else:  # timeout-style empty invocation: nothing to fold in
            tss = pd.Series([], dtype="int64")
        for tus in tss.sort_values():
            tus = int(tus)
            if start_us is None:
                start_us, end_us, n = tus, tus, 1
            elif tus - end_us > gap_us:
                out.append((user_id, start_us, end_us, n))  # closed
                start_us, end_us, n = tus, tus, 1
            else:
                end_us, n = tus, n + 1
        if start_us is not None:
            state.update((start_us, end_us, n))
            out.append((user_id, start_us, end_us, n))  # open (update-mode)
        if out:
            yield pd.DataFrame(
                {
                    "user_id": [o[0] for o in out],
                    "start_s": [o[1] // 1_000_000 for o in out],
                    "end_s": [o[2] // 1_000_000 for o in out],
                    "n_events": [o[3] for o in out],
                }
            )

    return fn


def sessionize_stateful(events: DataFrame, gap_s: int = 1800) -> DataFrame:
    """Per-user gap sessions via applyInPandasWithState.

    ``events`` must carry ``user_id`` and ``ts_ns`` (streaming or
    batch-shaped via with_event_time). Emits update-mode rows; the
    latest row per (user_id, start_s) is the session's current truth.
    """
    from pyspark.sql import functions as F

    e = events.select(
        "user_id", F.expr("ts_ns div 1000").cast("bigint").alias("tus")
    )
    return e.groupBy("user_id").applyInPandasWithState(
        _session_fn(gap_s),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
