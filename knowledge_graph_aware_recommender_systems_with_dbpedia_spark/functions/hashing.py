"""Deterministic, engine-portable hashing utilities.

Why not ``F.rand(seed)`` / ``F.xxhash64``: Spark's ``rand`` is
partition-sensitive (a repartition changes the values), and ``xxhash64``
has no DuckDB equivalent, so neither can back (a) reproducible seeded
splits under retries/repartitioning (SURVEY §4 risk register) nor
(b) the DuckDB oracle. Instead every "random" decision is a pure
function of the row's key:

    md5_long(key)    -- first 15 hex chars of md5 as int64 (60 bits)
    det_hash(...)    -- affine combination mod 1_000_000
    det_unit(...)    -- det_hash scaled to [0, 1)

Identical SQL exists in DuckDB (see ``DUCKDB_MD5_LONG``), so split
membership is bit-for-bit comparable across engines. At 100 TB this is
also the *right* design: hash-of-key decisions are embarrassingly
parallel, never shuffle, and survive speculative re-execution.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MOD = 1_000_000
# multipliers: odd constants (Knuth-style); values stay < 2^63 because
# each key term is first reduced mod 100_003.
_PRIMES = (2654435761, 1597334677, 968764411, 374761393)
_KEY_MOD = 100_003

# DuckDB expression template computing the same md5_long(expr)
DUCKDB_MD5_LONG = "CAST(('0x' || substring(md5({expr}), 1, 15)) AS BIGINT)"


def md5_long(c: Column) -> Column:
    """First 60 bits of md5(string) as a non-negative int64.

    Portable: DuckDB ``CAST(('0x' || substring(md5(x),1,15)) AS BIGINT)``.
    """
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 15), 16, 10).cast("bigint")


def _seed_mult(seed: int, i: int) -> int:
    """Seed-dependent multiplier for key i, nonzero mod the prime
    _KEY_MOD. Multiplication mod a prime is a bijection, so changing
    the seed genuinely *permutes* the hash order (an additive seed
    would only shift values, leaving the row ordering — and therefore
    split membership — unchanged)."""
    m = (_PRIMES[i % len(_PRIMES)] * (2 * seed + 1) + seed) % _KEY_MOD
    return m if m != 0 else 1


def det_hash(*keys: Column, seed: int = 42) -> Column:
    """Deterministic hash of one or more integer key columns -> [0, MOD).

    Each key is reduced mod the prime 100_003, scrambled by a
    seed-derived multiplier (see :func:`_seed_mult`), and re-reduced
    before the affine sum, so every intermediate stays far below 2**63
    (ANSI-mode overflow-safe in Spark 4 and DuckDB alike).
    """
    acc: Column | None = None
    for i, k in enumerate(keys):
        # numeric keys hash by value (bit-identical to det_hash_sql);
        # non-numeric keys (string ids) fall back to md5 — ANSI-safe
        kn = F.coalesce(k.try_cast("bigint"), md5_long(k))
        scrambled = F.pmod(
            F.pmod(kn, F.lit(_KEY_MOD)) * F.lit(_seed_mult(seed, i)),
            F.lit(_KEY_MOD),
        )
        term = scrambled * F.lit(_PRIMES[i % len(_PRIMES)])
        acc = term if acc is None else acc + term
    assert acc is not None, "det_hash needs at least one key column"
    return F.pmod(acc + F.lit(seed), F.lit(MOD))


def det_hash_sql(*exprs: str, seed: int = 42) -> str:
    """The DuckDB/ANSI-SQL text equivalent of :func:`det_hash`,
    faithful for ALL key types:

     * ANSI ``%`` follows the dividend's sign while Spark ``pmod`` is
       non-negative, so every modulo is wrapped ``((x % m) + m) % m``
       (identical to the plain ``%`` for the non-negative keys every
       existing oracle uses — their hashes are unchanged);
     * non-numeric keys take the same md5 fallback ``det_hash`` does
       (``TRY_CAST`` + md5-prefix bigint), and the BIGINT cast also
       keeps literal keys out of INT32 overflow in the multiplies.
    """

    def _pm(x: str, m: int) -> str:
        return f"((({x}) % {m} + {m}) % {m})"

    terms = []
    for i, e in enumerate(exprs):
        kn = (
            f"COALESCE(TRY_CAST({e} AS BIGINT), "
            f"CAST(('0x' || substring(md5(CAST({e} AS VARCHAR)), 1, 15)) AS BIGINT))"
        )
        scrambled = _pm(f"{_pm(kn, _KEY_MOD)} * {_seed_mult(seed, i)}", _KEY_MOD)
        terms.append(f"{scrambled} * {_PRIMES[i % len(_PRIMES)]}")
    return f"({_pm(' + '.join(terms) + f' + {seed}', MOD)})"


def det_unit(*keys: Column, seed: int = 42) -> Column:
    """Deterministic uniform-ish value in [0, 1) from key columns."""
    return det_hash(*keys, seed=seed) / F.lit(float(MOD))


def minhash_expr(hash_col: Column, a: int, b: int, prime: int = 2147483647) -> Column:
    """One universal-hash family member over a pre-hashed int column.

    ``min((a*x + b) mod prime)`` per group gives a MinHash signature
    component. ``x`` must already be bounded (use md5_long % prime) so
    ``a*x`` stays in int64 range.
    """
    x = F.pmod(hash_col, F.lit(prime))
    # a <= 2**31, x < 2**31  ->  a*x < 2**62: safe
    return F.pmod(F.lit(a) * x + F.lit(b), F.lit(prime))
