"""Cross-engine deterministic hashing primitives.

Spark's builtin ``hash()`` (murmur3) and DuckDB's ``hash()`` don't agree, so
every hash-based operator (minhash, simhash, LSH, fingerprints) is built on a
primitive both engines compute identically: the first 15 hex chars of md5
(60 bits, always < 2^60 so it fits a signed BIGINT).

  Spark : CAST(conv(substring(md5(x), 1, 15), 16, 10) AS BIGINT)
  DuckDB: ('0x' || substring(md5(x), 1, 15))::BIGINT

On top of that, a family of universal hash functions
``h_i(s) = (a_i * (H(s) % P) + b_i) % P`` with P = 2^31 - 1 (Mersenne prime)
keeps all arithmetic below 2^62 — no BIGINT overflow on either engine.

The (a_i, b_i) constants are fixed literals (generated once from a seeded PRNG)
so the Spark expression and the oracle SQL are provably the same function.
"""

from __future__ import annotations

MERSENNE_P = 2_147_483_647  # 2^31 - 1

# 16 (a, b) pairs, generated once with random.Random(42); frozen as literals.
HASH_COEFFS: list[tuple[int, int]] = [
    (1373158607, 239081663), (53710185, 1592467581), (590620972, 525901256),
    (479341424, 299655412), (1581559893, 220106707), (1453201079, 1590571865),
    (1915941033, 1171165722), (186699714, 1268073012), (906070221, 68252793),
    (63989048, 201209005), (469521478, 499635468), (1085242217, 1292825378),
    (56985562, 1205264595), (427000597, 1537640408), (1395616197, 1506083910),
    (1170252924, 900911954),
]


def spark_md5_long(expr: str) -> str:
    """Spark SQL expression: 60-bit int hash of a string expression."""
    return f"CAST(conv(substring(md5({expr}), 1, 15), 16, 10) AS BIGINT)"


def duck_md5_long(expr: str) -> str:
    """DuckDB SQL expression computing the identical 60-bit int hash."""
    return f"(('0x' || substring(md5({expr}), 1, 15))::BIGINT)"


def universal_hash(h_expr: str, i: int) -> str:
    """Engine-neutral SQL for hash family member i over an int expression.

    Works verbatim in both Spark SQL and DuckDB (same literals, same % and *
    semantics on non-negative BIGINTs below 2^62).
    """
    a, b = HASH_COEFFS[i]
    return f"(({a} * ({h_expr} % {MERSENNE_P}) + {b}) % {MERSENNE_P})"
