"""Byte-pair-encoding merge learning — the tokenizer-training step of
an LLM data pipeline (Sennrich et al., ACL'16), distributed.

Greenfield operator (no reference counterpart; the reference stops at
word-level token counts). Scale shape — the part that matters at
100 TB:

 * the CORPUS is touched exactly once, to build the (word, count)
   table; every merge iteration then runs over that table, whose size
   is bounded by the VOCABULARY (unique pre-tokens), not the corpus —
   the same two-phase structure production tokenizer trainers use;
 * each iteration is one map-side pair fan-out + one combinable
   hash-aggregate + a TakeOrdered(1); the only driver transfer is the
   single best (pair, count) row per iteration (the bounded-scalar
   collect pattern of similarity._ivf_centroids);
 * the merge rewrite is a literal string replace over the wrapped
   symbol sequence (below) — embarrassingly parallel.

Determinism / oracle contract: symbol sequences are stored as
``\\x01 sym \\x02`` wrapped strings (tokens are [a-z0-9]+ so the
delimiters cannot collide). SQL ``replace()`` scans left-to-right and
never rescans replaced output, which is EXACTLY classic BPE's greedy
non-overlapping merge ("aaa" + (a,a) -> [aa, a]); both engines share
that semantic, so a DuckDB oracle replays every iteration verbatim.
Ties on pair count break lexicographically (smallest (left, right)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens

D1, D2 = "\x01", "\x02"


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt) over the corpus — the one corpus-scale pass."""
    return (
        docs.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def _wrapped_chars(word):
    """'abc' -> '\\x01a\\x02\\x01b\\x02\\x01c\\x02'."""
    return F.concat(
        F.lit(D1), F.array_join(F.split(word, ""), D2 + D1), F.lit(D2)
    )


def _symbols(seq):
    """Wrapped string -> array of symbols."""
    return F.split(F.expr(f"substring({seq}, 2, length({seq}) - 2)"), D2 + D1)


def learn_bpe_merges(
    docs: DataFrame,
    n_merges: int = 3,
    text_col: str = "text",
) -> DataFrame:
    """Learn ``n_merges`` BPE merges over the corpus vocabulary ->
    (step, left_sym, right_sym, merged, pair_count), step 1-based.

    Stops early if no adjacent pair remains. The returned DataFrame is
    driver-materialized (n_merges rows) — the distributed work is the
    per-iteration pair count over the persisted vocab table.

    JOB-COUNT CAVEAT: each merge is one Spark job (a driver round-trip
    is inherent to sequential BPE — merge i+1's counts depend on merge
    i). Fine for small budgets; for real budgets (32k merges) use
    :func:`learn_bpe_merges_topv`, which runs the identical loop
    in-driver over the bounded top-V vocabulary with O(1) Spark jobs.
    """
    spark = docs.sparkSession
    words = word_counts(docs, text_col).persist()
    seqs = words.select("cnt", _wrapped_chars(F.col("word")).alias("seq"))
    merges = []
    for step in range(1, n_merges + 1):
        syms = seqs.select("cnt", _symbols("seq").alias("s"))
        pairs = (
            syms.select(
                "cnt",
                F.explode(
                    F.zip_with(
                        F.slice(F.col("s"), 1, F.size("s") - 1),
                        F.slice(F.col("s"), 2, F.size("s") - 1),
                        lambda a, b: F.struct(a.alias("a"), b.alias("b")),
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("cnt").alias("pair_count"))
        )
        best = pairs.orderBy(F.desc("pair_count"), "a", "b").limit(1).collect()
        if not best:
            break
        a, b, cnt = best[0]["a"], best[0]["b"], int(best[0]["pair_count"])
        merges.append((step, a, b, a + b, cnt))
        seqs = seqs.select(
            "cnt",
            F.replace(
                F.col("seq"), F.lit(D1 + a + D2 + D1 + b + D2), F.lit(D1 + a + b + D2)
            ).alias("seq"),
        )
    return spark.createDataFrame(
        merges,
        "step bigint, left_sym string, right_sym string, merged string, pair_count bigint",
    )


def learn_bpe_merges_batched(
    docs: DataFrame,
    n_merges: int = 3,
    text_col: str = "text",
    batch_m: int = 16,
    candidate_factor: int = 4,
    adaptive: bool = False,
    switch_max_vocab: int = 1_000_000,
    stats: dict | None = None,
) -> DataFrame:
    """EXACT distributed BPE with a Spark-job count of
    O(n_merges / batch_m) — the middle path between
    :func:`learn_bpe_merges` (exact, one job PER merge: 32k merges =
    32k driver round-trips) and :func:`learn_bpe_merges_topv` (O(1)
    jobs but exact only over the bounded top-V vocabulary). VERDICT
    r11 item 4.

    Per round: ONE distributed pair count over the full vocabulary,
    then a greedy scan of the top candidates accepting up to
    ``batch_m`` pairs that are pairwise CONFLICT-FREE — no accepted
    pair shares a symbol with an earlier-accepted pair of the same
    round — and one rewrite pass applying them together. Disjoint
    pairs commute: merging (a,b) can neither create nor destroy an
    occurrence of (c,d) when {a,b} ∩ {c,d} = ∅, so every accepted
    pair's recorded count is the count sequential BPE would have seen
    at its turn, and the within-round rewrites don't interact.

    At ``batch_m=1`` this IS :func:`learn_bpe_merges` (one accepted
    pair per count, same (count desc, pair asc) tie-break) — pinned by
    the parity test. At ``batch_m>1`` it can diverge from sequential
    BPE: sequential re-counts after EVERY merge, so a brand-new pair
    involving a just-merged symbol can outrank the round's remaining
    candidates. Example (pinned as a divergence test): corpus
    "abc"x10 + "de"x9 — sequential merges (a,b) then (ab,c) (the new
    pair counts 10 > 9); batched(2) merges (a,b) and (d,e) in one
    round, never seeing (ab,c). With Zipfian pair mass the divergence
    touches only near-tie tail merges — the standard batching
    compromise of distributed tokenizer trainers.

    ``candidate_factor``: each round collects
    ``max(candidate_factor * batch_m, 16)`` top rows to scan past
    conflicts (a bounded driver transfer); if conflicts exhaust the
    window the round closes early with what it accepted and the next
    round's fresh count continues — never wrong, only a shorter round.

    PRODUCTION-BUDGET NOTE (r13): each round's rewrite is
    localCheckpoint-ed EAGERLY, truncating the lineage — without it
    round R's pair count replays all R-1 prior rewrite chains from the
    raw vocab (O(rounds^2) total work and a plan that deepens by
    batch_m replace() nodes per round; measured: untruncated wall
    goes super-linear in rounds by ~round 20). Eager, not lazy — a
    lazy persist in a loop loses the concurrent-stage race under AQE
    (see kge.py's epoch cache note). Values are unchanged; 1k-merge
    budgets become flat-per-round (see SCALING.md's bpe_batched rows).

    DIVERGENCE MITIGATION (VERDICT r13 item 4, opt-in via
    ``adaptive=True``). The r13 probe measured vocab Jaccard
    0.46-0.66 vs sequential at a 1024-merge budget; the r14 probe
    showed WHY the suggested min/max-ratio trigger cannot fix it: the
    first divergence is at merge ~3 while the round-1 batch spans a
    4715->128 count range (ratio 0.027) — the mechanism is not batch
    flatness but NEW and RESIDUAL pairs: after merging (a,b), any
    pair TOUCHING a or b can (new: count(x,ab) <= count(x,a)) or does
    (residual: reduced in place) carry a count up to the largest
    observed count adjacent to those symbols, and sequential BPE —
    which re-counts per merge — may rank it above the batch's next
    candidate. So ``adaptive`` enforces the EXACTNESS BOUND instead:
    a candidate is committed only while its count strictly exceeds
    B_max = max over already-accepted merges of (largest window count
    touching their symbols — the accept's OWN count included when it
    is a self-pair (a,a), since run-generated pairs like (aa,aa) are
    bounded by the accept itself, not by a neighbor — and the window
    floor when pairs exist below the window) — every committed batch
    is then provably the sequential prefix. When the guard collapses a round to a single
    accept (entangled symbol dynamics: batching cannot help), the
    learner switches to the bounded-exact sequential continuation:
    one TakeOrdered collects the top ``switch_max_vocab`` CURRENT
    sequences and the topv driver loop finishes the remaining merges
    exactly — zero further Spark jobs, fidelity bound = top-V
    truncation, topv's documented contract. Result on the r14 probe
    (rounds MEASURED via ``stats``, not a ceil formula): vocab
    Jaccard 1.0 at the 1024-merge budget in 4 rounds — 3 distributed
    count jobs + the continuation's TakeOrdered — vs 0.57 in 67
    measured rounds unguarded. Default False keeps r13 behavior
    bit-identical (every parity/divergence pin unchanged).

    ``stats``: pass a dict to receive MEASURED execution counters —
    ``count_rounds`` (distributed pair-count jobs actually run; the
    adaptive guard can close a round after fewer than ``batch_m``
    accepts, so ``ceil(merges/batch_m)`` is only a lower bound),
    ``head_merges`` (merges committed distributed, before any
    continuation), ``switched`` (whether the bounded-exact sequential
    continuation finished the run).
    """
    spark = docs.sparkSession
    words = word_counts(docs, text_col).persist()
    seqs = words.select("cnt", _wrapped_chars(F.col("word")).alias("seq"))
    merges: list[tuple[int, str, str, str, int]] = []
    count_rounds = 0
    switched = False
    step = 1
    while step <= n_merges:
        syms = seqs.select("cnt", _symbols("seq").alias("s"))
        pairs = (
            syms.select(
                "cnt",
                F.explode(
                    F.zip_with(
                        F.slice(F.col("s"), 1, F.size("s") - 1),
                        F.slice(F.col("s"), 2, F.size("s") - 1),
                        lambda a, b: F.struct(a.alias("a"), b.alias("b")),
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("cnt").alias("pair_count"))
        )
        m_round = min(batch_m, n_merges - step + 1)
        top = (
            pairs.orderBy(F.desc("pair_count"), "a", "b")
            .limit(max(candidate_factor * m_round, 16))
            .collect()
        )
        count_rounds += 1
        if not top:
            break
        window_full = len(top) >= max(candidate_factor * m_round, 16)
        # out-of-window pairs exist only when the window filled up;
        # their counts are bounded by the window floor
        floor = int(top[-1]["pair_count"]) if window_full else 0
        # per symbol: (best touching count, its window row index,
        # second-best touching count) — "touching" = the symbol appears
        # on either side of the pair; the accepted row itself is
        # excluded via the index when bounding its own symbols
        touch: dict[str, tuple[int, int, int]] = {}
        if adaptive:
            for idx, r in enumerate(top):
                c = int(r["pair_count"])
                for s in {r["a"], r["b"]}:
                    best, bi, second = touch.get(s, (0, -1, 0))
                    if c > best:
                        touch[s] = (c, idx, best)
                    elif c > second:
                        touch[s] = (best, bi, c)
        used: set[str] = set()
        accepted: list[tuple[str, str, int]] = []
        b_max = 0
        for idx, r in enumerate(top):
            if len(accepted) >= m_round:
                break
            if r["a"] in used or r["b"] in used:
                continue
            c = int(r["pair_count"])
            if adaptive and accepted and c <= b_max:
                # exactness bound violated: a new/residual pair from an
                # earlier accept could outrank this candidate — close
                # the round here
                break
            accepted.append((r["a"], r["b"], c))
            used.add(r["a"])
            used.add(r["b"])
            if adaptive:
                b_max = max(b_max, floor)
                if r["a"] == r["b"]:
                    # Self-pair: merging (a,a) over a character run
                    # creates (aa,aa)/(aa,a) pairs whose counts derive
                    # from occurrences of THIS pair itself (the middle
                    # pair of a,a,a,a IS the accept), so the
                    # self-exclusion below is unsound here — the bound
                    # must include the accept's own count. The window
                    # is count-desc, so this closes the round at the
                    # self-pair (strictly-greater can't hold), which is
                    # exactly the sequential pace the guard promises.
                    b_max = max(b_max, c)
                for s in {r["a"], r["b"]}:
                    best, bi, second = touch.get(s, (0, -1, 0))
                    b_max = max(b_max, second if bi == idx else best)
        if adaptive and len(accepted) == 1 and m_round > 1:
            # the guard collapsed the round to sequential pace —
            # batching cannot help this corpus's symbol dynamics; do
            # NOT commit, finish with the bounded-exact continuation
            # (it re-derives this merge and the rest from the current
            # state, exactly)
            switched = True
            merges.extend(
                _sequential_continuation(seqs, step, n_merges, switch_max_vocab)
            )
            break
        expr = F.col("seq")
        for a, b, cnt in accepted:
            merges.append((step, a, b, a + b, cnt))
            step += 1
            expr = F.replace(
                expr, F.lit(D1 + a + D2 + D1 + b + D2), F.lit(D1 + a + b + D2)
            )
        seqs = seqs.select("cnt", expr.alias("seq")).localCheckpoint(eager=True)
    words.unpersist()
    if stats is not None:
        stats["count_rounds"] = count_rounds
        stats["head_merges"] = step - 1
        stats["switched"] = switched
    return spark.createDataFrame(
        merges,
        "step bigint, left_sym string, right_sym string, merged string, pair_count bigint",
    )


def _sequential_continuation(
    seqs: DataFrame, start_step: int, n_merges: int, max_vocab: int
) -> list[tuple[int, str, str, str, int]]:
    """Finish a batched run exactly: collect the top ``max_vocab``
    CURRENT (cnt, seq) rows — the state with every already-committed
    merge applied — and run classic sequential BPE driver-side for
    steps ``start_step..n_merges`` (same counting, same greedy
    non-rescanning rewrite, same (count desc, pair asc) tie-break as
    :func:`learn_bpe_merges_topv`). One TakeOrdered job, then zero
    Spark jobs; fidelity bound = top-V truncation, identical to topv's
    documented contract."""
    top = seqs.orderBy(F.desc("cnt"), "seq").limit(max_vocab).collect()
    vocab: list[tuple[list[str], int]] = [
        ((r.seq[1:-1].split(D2 + D1) if len(r.seq) >= 2 else []), int(r.cnt))
        for r in top
    ]
    merges: list[tuple[int, str, str, str, int]] = []
    for step in range(start_step, n_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for syms, cnt in vocab:
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + cnt
        if not counts:
            break
        (a, b), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((step, a, b, a + b, c))
        merged = a + b
        for idx, (syms, cnt) in enumerate(vocab):
            i, out = 0, []
            changed = False
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(merged)
                    i += 2
                    changed = True
                else:
                    out.append(syms[i])
                    i += 1
            if changed:
                vocab[idx] = (out, cnt)
    return merges


def learn_bpe_merges_topv(
    docs: DataFrame,
    n_merges: int = 3,
    text_col: str = "text",
    max_vocab: int = 1_000_000,
) -> DataFrame:
    """BPE merge learning with a SPARK-JOB COUNT OF O(1) — the scale
    path for real merge budgets (n_merges = 32k would mean 32k driver
    round-trip jobs through :func:`learn_bpe_merges`'s loop).

    Structure (how production tokenizer trainers handle web-scale
    corpora): ONE distributed corpus pass builds (word, cnt); ONE
    TakeOrdered collects the top ``max_vocab`` words by (cnt desc,
    word asc); the merge loop then runs in-driver over that bounded
    vocabulary in pure Python — exact BPE, no per-merge Spark job.

    Exactness: when ``max_vocab`` covers the whole vocabulary the
    result is IDENTICAL to :func:`learn_bpe_merges` (same overlapping
    pair counts, same greedy left-to-right non-rescanning merge, same
    (count desc, pair asc) tie-break) — pinned by the parity test.
    Truncation below full vocab trades tail-word influence for the
    bounded driver footprint; with Zipfian word frequencies the top
    10^6 words carry ~all pair mass, the standard sample-the-corpus
    posture of tokenizer training.
    """
    spark = docs.sparkSession
    top = (
        word_counts(docs, text_col)
        .orderBy(F.desc("cnt"), "word")
        .limit(max_vocab)
        .collect()
    )
    vocab: list[tuple[list[str], int]] = [
        (list(r.word), int(r.cnt)) for r in top
    ]
    merges = []
    for step in range(1, n_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for syms, cnt in vocab:
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + cnt
        if not counts:
            break
        # max count, ties -> lexicographically smallest (left, right)
        (a, b), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((step, a, b, a + b, c))
        merged = a + b
        for idx, (syms, cnt) in enumerate(vocab):
            i, out = 0, []
            changed = False
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    # greedy non-overlapping, no rescan of the merged
                    # output — the same left-to-right semantics as SQL
                    # replace() in the distributed path
                    out.append(merged)
                    i += 2
                    changed = True
                else:
                    out.append(syms[i])
                    i += 1
            if changed:
                vocab[idx] = (out, cnt)
    return spark.createDataFrame(
        merges,
        "step bigint, left_sym string, right_sym string, merged string, pair_count bigint",
    )


def segment_words(
    docs: DataFrame, merges: list[tuple[str, str]], text_col: str = "text"
) -> DataFrame:
    """Apply an ordered merge list to the vocab -> (word, cnt, pieces).

    The tokenize-with-a-trained-BPE step: replays each merge (in
    learned order) over the wrapped sequences, then splits back to
    symbol arrays. Pure string ops — map-side and ROW-count safe at
    corpus scale, but MERGE-count bounded: each merge is one chained
    ``F.replace`` node, so the Catalyst expression tree is as deep as
    the merge list and a production budget (~32k merges) blows up the
    analyzer/codegen long before data volume matters. Use it for small
    budgets (oracle replay, audits); real tokenizer budgets go through
    :func:`segment_words_scale`, whose plan is ONE mapInPandas node
    regardless of merge count — the same split tx12 already has on the
    training side (learn_bpe_merges vs learn_bpe_merges_topv).
    """
    words = word_counts(docs, text_col)
    seq = _wrapped_chars(F.col("word"))
    out = words.select("word", "cnt", seq.alias("seq"))
    for a, b in merges:
        out = out.select(
            "word",
            "cnt",
            F.replace(
                F.col("seq"), F.lit(D1 + a + D2 + D1 + b + D2), F.lit(D1 + a + b + D2)
            ).alias("seq"),
        )
    return out.select("word", "cnt", _symbols("seq").alias("pieces"))


def segment_words_scale(
    docs: DataFrame, merges: list[tuple[str, str]], text_col: str = "text"
) -> DataFrame:
    """:func:`segment_words` with a PLAN SIZE OF O(1) in the merge
    budget — the encode-side scale twin of ``learn_bpe_merges_topv``
    (VERDICT r09 item 1: one chained ``F.replace`` per merge is a
    32k-deep expression tree at production budgets).

    One Arrow-batched ``mapInPandas`` over the vocab table applies the
    WHOLE merge list per word; the merge table ships once per executor
    as a broadcast variable, never inside the plan. Per-word cost is
    O(fired_merges × |word|) dict-lookup passes — independent of the
    total merge count M, because merges whose pair never occurs in the
    word are never visited: each pass scans the word's adjacent pairs,
    looks up their ranks, and fires the LOWEST rank greater than the
    last fired rank.

    Output is IDENTICAL to :func:`segment_words` for ANY merge list
    (pinned by the parity test and tx19's shared oracle): sequential
    replay visits merges in rank order and skipping a merge whose pair
    is absent is a no-op by definition, so firing the next present
    rank reproduces the replay exactly; each firing is the same greedy
    left-to-right non-overlapping single pass as ``replace()`` (which
    never rescans its own output). Duplicate pairs in the list are
    handled by keeping ALL ranks per pair and resuming past the last
    fired one."""
    import pandas as pd

    spark = docs.sparkSession
    merge_list = [(a, b, a + b) for a, b in merges]
    by_pair: dict[tuple[str, str], list[int]] = {}
    for i, (a, b, _) in enumerate(merge_list):
        by_pair.setdefault((a, b), []).append(i)
    bc = spark.sparkContext.broadcast((merge_list, by_pair))

    def encode_batches(batches):
        from bisect import bisect_right

        mlist, ranks = bc.value
        for pdf in batches:
            pieces = []
            for word in pdf["word"]:
                syms = list(word)
                last = -1
                while True:
                    best = None
                    for i in range(len(syms) - 1):
                        rs = ranks.get((syms[i], syms[i + 1]))
                        if rs is None:
                            continue
                        k = bisect_right(rs, last)
                        if k < len(rs) and (best is None or rs[k] < best):
                            best = rs[k]
                    if best is None:
                        break
                    a, b, m = mlist[best]
                    out, i, n = [], 0, len(syms)
                    while i < n:
                        if i + 1 < n and syms[i] == a and syms[i + 1] == b:
                            out.append(m)
                            i += 2
                        else:
                            out.append(syms[i])
                            i += 1
                    syms = out
                    last = best
                pieces.append(syms)
            yield pd.DataFrame(
                {"word": pdf["word"], "cnt": pdf["cnt"], "pieces": pieces}
            )

    return word_counts(docs, text_col).mapInPandas(
        encode_batches, "word string, cnt bigint, pieces array<string>"
    )
