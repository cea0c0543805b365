"""WRatio-family fuzzy string scoring — the reference's J7
disambiguation scorer, reimplemented from the PUBLIC fuzzywuzzy/thefuzz
algorithm family (Cohen's token-set/partial-ratio blend).

The reference disambiguates SPARQL candidate URIs with
``thefuzz.process.extractOne(expected, candidates)``
(data_integration/datasets/movielens.py:126-131), whose default scorer
is WRatio: a weighted max over plain ratio, partial ratio, and the
token-sort / token-set variants. Plain levenshtein (the repo's default
J7 scorer) disagrees with WRatio exactly where real DBpedia labels
differ from catalog titles — reordered articles ("Shining, The"),
parenthesized years, subtitle punctuation — so this module provides the
WRatio-compatible scorer as an alternative.

Implementation notes:
 * Pure Python: the core ratio is an EXACT LCS-based normalized InDel
   similarity (what python-Levenshtein/rapidfuzz compute — symmetric,
   unlike difflib's greedy approximation; see :func:`_ratio`), and
   ``difflib.SequenceMatcher`` (autojunk off) supplies only
   partial_ratio's alignment-candidate scan, fuzzywuzzy's historical
   control flow. ``rapidfuzz`` is used instead when importable (same
   public semantics, C speed). All functions return ints in [0, 100]
   like the originals.
 * The hot path is a vectorized pandas_udf seam
   (:func:`operators.integration.link_entities` with
   ``scorer='wratio'``): Arrow batches in, one Python call per
   (name, label) pair — the documented mapInPandas/pandas_udf posture
   for logic Spark expressions cannot express (SequenceMatcher's
   longest-matching-block recursion).
 * Deterministic: no state, no tie-dependence on candidate order —
   the caller breaks score ties with (label length, URI) like the
   levenshtein path, making the whole J7 plan reproducible (the
   reference's extractOne keeps whichever max came first in SPARQL
   response order, which is NOT deterministic run-to-run).
"""

from __future__ import annotations

import re
from difflib import SequenceMatcher

try:  # optional C implementation, identical public semantics
    from rapidfuzz import fuzz as _rf_fuzz  # type: ignore

    _HAVE_RAPIDFUZZ = True
except Exception:  # pragma: no cover - env-dependent
    _HAVE_RAPIDFUZZ = False

_NON_ALNUM = re.compile(r"[^0-9a-zA-Z]+")


def full_process(s: str | None) -> str:
    """fuzzywuzzy's default preprocessor: non-alphanumeric -> spaces,
    lowercase, trim."""
    if s is None:
        return ""
    return _NON_ALNUM.sub(" ", s).lower().strip()


def _lcs_len(a: str, b: str) -> int:
    """Exact longest-common-subsequence length, two-row DP."""
    if not a or not b:
        return 0
    if len(b) > len(a):  # keep the inner row short
        a, b = b, a
    prev = [0] * (len(b) + 1)
    for ca in a:
        cur = [0]
        append = cur.append
        for j, cb in enumerate(b, 1):
            append(prev[j - 1] + 1 if ca == cb else max(prev[j], cur[j - 1]))
        prev = cur
    return prev[-1]


def _ratio(a: str, b: str) -> int:
    """2*LCS/(|a|+|b|) as a 0-100 int — the normalized InDel
    similarity python-Levenshtein/rapidfuzz compute for fuzz.ratio.
    EXACT LCS on purpose: difflib's SequenceMatcher.ratio uses the
    same formula over a GREEDY matching-block approximation, which is
    order-DEPENDENT (ratio('0 00','1 10') != ratio('1 10','0 00')) —
    hypothesis caught the asymmetry leaking through token_set_ratio
    and wratio, whose published semantics are symmetric."""
    if not a and not b:
        return 100
    return int(round(200.0 * _lcs_len(a, b) / (len(a) + len(b))))


def partial_ratio(a: str, b: str) -> int:
    """Best ratio of the shorter string against any same-length
    alignment of the longer (fuzzywuzzy's matching-blocks scan).

    EQUAL lengths tie-break lexicographically, not by argument order:
    SequenceMatcher's greedy block scan is order-dependent, so
    ``len(a) <= len(b)`` alone made partial_ratio (and through
    token_set_ratio, wratio) asymmetric whenever the two sides tie on
    length — e.g. wratio('0100', 'A:a:00') != its mirror (hypothesis,
    r14). This module's contract is symmetric scoring (see _ratio)."""
    if len(a) < len(b) or (len(a) == len(b) and a <= b):
        shorter, longer = a, b
    else:
        shorter, longer = b, a
    if not shorter:
        return 100 if not longer else 0
    m = SequenceMatcher(None, shorter, longer, autojunk=False)
    best = 0
    for block in m.get_matching_blocks():
        start = max(block.b - block.a, 0)
        sub = longer[start : start + len(shorter)]
        r = _ratio(shorter, sub)
        if r == 100:
            return 100
        best = max(best, r)
    return best


def _token_sort(s: str) -> str:
    return " ".join(sorted(s.split()))


def token_sort_ratio(a: str, b: str, partial: bool = False) -> int:
    sa, sb = _token_sort(full_process(a)), _token_sort(full_process(b))
    return partial_ratio(sa, sb) if partial else _ratio(sa, sb)


def token_set_ratio(a: str, b: str, partial: bool = False) -> int:
    """max over {sorted-intersection vs itself+rest combinations} —
    the scorer that makes 'Shining, The (1980)' ≈ 'The Shining'."""
    ta, tb = set(full_process(a).split()), set(full_process(b).split())
    inter = " ".join(sorted(ta & tb))
    d1 = " ".join(sorted(ta - tb))
    d2 = " ".join(sorted(tb - ta))
    c1 = f"{inter} {d1}".strip()
    c2 = f"{inter} {d2}".strip()
    f = partial_ratio if partial else _ratio
    return max(f(inter, c1), f(inter, c2), f(c1, c2))


def wratio(a: str | None, b: str | None) -> int:
    """fuzzywuzzy WRatio: weighted max over the scorer family.

    Mirrors the published control flow: plain ratio always competes;
    when the lengths differ by >=1.5x the partial variants join in at a
    0.9 scale (0.6 beyond 8x); token variants are scaled by 0.95.
    """
    if _HAVE_RAPIDFUZZ:  # pragma: no cover - env-dependent
        # rapidfuzz >= 2.0 defaults to processor=None, unlike
        # fuzzywuzzy/thefuzz WRatio (and this module's fallback), which
        # full_process first — pass the processor explicitly so both
        # paths share semantics (ADVICE r04).
        from rapidfuzz.utils import default_process as _rf_proc

        return int(round(_rf_fuzz.WRatio(a or "", b or "", processor=_rf_proc)))
    p1, p2 = full_process(a), full_process(b)
    if not p1 or not p2:
        return 0
    base = _ratio(p1, p2)
    len_ratio = max(len(p1), len(p2)) / min(len(p1), len(p2))
    unbase_scale = 0.95
    if len_ratio < 1.5:
        tsor = token_sort_ratio(p1, p2) * unbase_scale
        tser = token_set_ratio(p1, p2) * unbase_scale
        return int(round(max(base, tsor, tser)))
    # fuzzywuzzy switches to 0.6 only STRICTLY beyond 8x (len_ratio
    # == 8 still uses 0.9) — match the published boundary exactly.
    partial_scale = 0.60 if len_ratio > 8 else 0.90
    part = partial_ratio(p1, p2) * partial_scale
    ptsor = token_sort_ratio(p1, p2, partial=True) * unbase_scale * partial_scale
    ptser = token_set_ratio(p1, p2, partial=True) * unbase_scale * partial_scale
    return int(round(max(base, part, ptsor, ptser)))


def extract_one(query: str, choices: list[str]) -> tuple[str, int] | None:
    """Driver-side convenience mirroring ``process.extractOne`` with a
    DETERMINISTIC tie-break (score desc, choice length, choice asc)."""
    best: tuple[str, int] | None = None
    for c in choices:
        s = wratio(query, c)
        if (
            best is None
            or s > best[1]
            or (s == best[1] and (len(c), c) < (len(best[0]), best[0]))
        ):
            best = (c, s)
    return best
