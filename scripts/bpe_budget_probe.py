#!/usr/bin/env python3
"""Batched-BPE production-budget probe (VERDICT r12 item 3).

Measures learn_bpe_merges_batched at a >= 1k merge budget:

  * wall + Spark-round count per batch_m on the sf0.1 corpus;
  * divergence vs EXACT sequential BPE on the sf0.01 corpus (the
    sequential reference is learn_bpe_merges_topv with max_vocab
    covering the FULL vocabulary, which is pinned identical to
    learn_bpe_merges by the parity test — running the one-job-per-
    merge loop itself at 1k merges is exactly what the batched
    learner exists to avoid).

The synthetic corpus has a 31-word vocabulary, which character-level
BPE exhausts after a few dozen merges, so the probe gives BPE real
material the standard way tokenizer benchmarks do: each document's
text with whitespace removed is one pseudo-word (sf0.1: 4,992 distinct
~300-char words, 1.49M chars — pair mass comparable to a real token
stream). The operators under test are UNCHANGED; only the input is
reshaped for budget depth.

Divergence metrics vs the sequential reference at the same budget:
  * prefix_agree — fraction of steps before the first differing merge;
  * step_agree  — fraction of steps whose (left,right) equals
    sequential's at the same index;
  * vocab_jaccard — Jaccard of the two merged-token SETS (order-blind:
    the metric that matters for the downstream segmenter).

Usage: python3 scripts/bpe_budget_probe.py [n_merges] [batch_ms...]
Writes BPE_BUDGET_r13.txt next to the repo root.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

from pyspark.sql import functions as F  # noqa: E402

from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators import bpe as B  # noqa: E402
from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.session import get_spark  # noqa: E402
from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.sources.tables import load_table  # noqa: E402


def pseudo_word_docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").select(
        F.translate(F.col("text"), " ", "").alias("text")
    )


def merge_pairs(df) -> list[tuple[str, str]]:
    return [
        (r.left_sym, r.right_sym)
        for r in df.orderBy("step").collect()
    ]


def divergence(seq: list, bat: list) -> dict:
    n = min(len(seq), len(bat))
    prefix = next((i for i in range(n) if seq[i] != bat[i]), n)
    step_agree = sum(1 for i in range(n) if seq[i] == bat[i]) / n if n else 1.0
    sv = {a + b for a, b in seq}
    bv = {a + b for a, b in bat}
    jac = len(sv & bv) / len(sv | bv) if (sv or bv) else 1.0
    return {
        "n_seq": len(seq), "n_bat": len(bat),
        "prefix_agree": round(prefix / n, 4) if n else 1.0,
        "step_agree": round(step_agree, 4),
        "vocab_jaccard": round(jac, 4),
    }


def main() -> None:
    n_merges = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    batch_ms = [int(x) for x in sys.argv[2:]] or [1, 8, 32, 128]
    spark = get_spark("bpe-budget-probe")
    lines = [f"batched-BPE budget probe: n_merges={n_merges}"]

    # --- wall/rounds at sf0.1 ------------------------------------------
    docs01 = pseudo_word_docs(spark, "/root/testdata/sf0.1").persist()
    docs01.count()
    for m in batch_ms:
        if m == 1 and n_merges > 256:
            lines.append(
                "sf0.1 batch_m=1: skipped (one job per merge is the "
                "documented anti-pattern the batched learner replaces)"
            )
            continue
        st: dict = {}
        t0 = time.time()
        got = B.learn_bpe_merges_batched(
            docs01, n_merges=n_merges, batch_m=m, stats=st
        )
        rows = sorted(got.collect(), key=lambda r: r.step)
        lines.append(
            f"sf0.1 batch_m={m}: wall={time.time() - t0:.1f}s "
            f"merges={len(rows)} count_rounds={st['count_rounds']} "
            f"last_count={rows[-1].pair_count if rows else None}"
        )
    docs01.unpersist()

    # --- divergence at sf0.01 ------------------------------------------
    docs001 = pseudo_word_docs(spark, "/root/testdata/sf0.01").persist()
    n_vocab = docs001.distinct().count()
    t0 = time.time()
    seq_ref = merge_pairs(
        B.learn_bpe_merges_topv(docs001, n_merges=n_merges, max_vocab=n_vocab + 1)
    )
    lines.append(
        f"sf0.01 sequential reference (topv, full vocab {n_vocab}): "
        f"wall={time.time() - t0:.1f}s merges={len(seq_ref)}"
    )
    for m in batch_ms:
        t0 = time.time()
        bat = merge_pairs(
            B.learn_bpe_merges_batched(docs001, n_merges=n_merges, batch_m=m)
        )
        d = divergence(seq_ref, bat)
        lines.append(
            f"sf0.01 batch_m={m}: wall={time.time() - t0:.1f}s {d}"
        )

    # --- adaptive mitigation (VERDICT r13 item 4) ----------------------
    # adaptive=True: exactness-bound batching (a candidate commits only
    # while its count strictly exceeds every earlier accept's touching
    # bound) + bounded-exact sequential continuation once a round
    # collapses to one accept. rounds below are MEASURED via the
    # learner's stats hook (the guard can close a round after fewer
    # than batch_m accepts, so a ceil(head/m) formula only lower-bounds
    # the true distributed job count); +1 counts the continuation's
    # TakeOrdered when it ran.
    lines.append(
        f"mitigation adaptive=True (done gate: vocab_jaccard >= 0.9 "
        f"at rounds <= 2x fixed batch_m=32 = {2 * -(-n_merges // 32)})"
    )
    for m in (32, 128):
        st2: dict = {}
        t0 = time.time()
        bat = merge_pairs(
            B.learn_bpe_merges_batched(
                docs001, n_merges=n_merges, batch_m=m, adaptive=True, stats=st2
            )
        )
        d = divergence(seq_ref, bat)
        rounds = st2["count_rounds"] + (1 if st2["switched"] else 0)
        lines.append(
            f"sf0.01 batch_m={m} adaptive=True: "
            f"wall={time.time() - t0:.1f}s head_merges={st2['head_merges']} "
            f"rounds={rounds} (count_rounds={st2['count_rounds']} "
            f"switched={st2['switched']}) {d}"
        )

    out = "\n".join(lines) + "\n"
    print(out)
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "BPE_BUDGET_r14.txt"), "w") as fh:
        fh.write(out)
    spark.stop()


if __name__ == "__main__":
    main()
