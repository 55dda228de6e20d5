"""Portable hashing primitives.

``h64`` is a 60-bit hash computed as the first 15 hex digits of md5,
chosen because it is expressible identically in Spark SQL
(``conv(substr(md5(x),1,15),16,10)::long``) and DuckDB
(``('0x'||substr(md5(x),1,15))::BIGINT``) — the correctness oracle can
therefore verify every hash-based operator (minhash, simhash,
fingerprinting, LSH) value-for-value.

At 100 TB scale md5 is ~2x slower than xxhash64; swap ``h64`` for
``F.xxhash64`` when oracle parity is not needed — every operator takes
the hash expression as an injectable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Overflow-safe affine-rehash constants: base is reduced mod 2^20-ish
# prime so a*base+b stays far below 2^63 in both engines (DuckDB raises
# on BIGINT overflow rather than wrapping like the JVM).
REDUCE_MOD = 1048573          # 2^20 - 3, prime
AFFINE_MOD = 1000000007       # < 2^30, prime
# (a, b) pairs for the K minhash permutations — small primes, arbitrary
MINHASH_COEFFS = [
    (769, 12289),
    (1543, 24593),
    (3079, 49157),
    (6151, 98317),
    (12289, 196613),
    (24593, 393241),
    (49157, 786433),
    (98317, 1572869),
]


def h64(col: Column | str) -> Column:
    """60-bit portable hash of a string column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 15), 16, 10).cast("long")


def h64_sql(expr: str) -> str:
    """DuckDB-side twin of :func:`h64` over a SQL expression."""
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


def affine(hash_col: Column, a: int, b: int) -> Column:
    """Overflow-safe affine rehash of a 60-bit hash (for minhash perms)."""
    return (hash_col % REDUCE_MOD * a + b) % AFFINE_MOD


def affine_sql(expr: str, a: int, b: int) -> str:
    return f"((({expr}) % {REDUCE_MOD} * {a} + {b}) % {AFFINE_MOD})"
