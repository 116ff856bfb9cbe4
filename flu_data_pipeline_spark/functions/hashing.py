"""Portable deterministic hashing.

Spark's builtin ``hash``/``xxhash64`` and DuckDB's ``hash`` use different
algorithms, so any operator whose *results* depend on hash values (minhash,
simhash, LSH bucketing, fingerprints) is built on an md5-prefix hash that
both engines compute identically:

    hash64(s) = int(md5(s)[:14], 16)        # 56 bits, fits in int64

Spark:  ``conv(substring(md5(s), 1, 14), 16, 10) :: long``
DuckDB: ``('0x' || substr(md5(s), 1, 14))::BIGINT``

md5 is used as a mixing function, not for security. 56 bits keeps
``a * h + b`` products inside int64*small without overflow when reduced
mod a 61-bit prime via the standard Carter-Wegman family below.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: prime modulus for the universal-hash family (2^31 - 1, Mersenne).
#: Kept small so a*h+b stays within int64: a,b < P and h < 2^56 would
#: overflow, so hashes are first reduced mod P.
HASH64_MOD = 2_147_483_647

#: Deterministic coefficient pairs (a_i, b_i) for the minhash family,
#: generated once from digits of pi (public, reproducible, no RNG at
#: query time). a_i must be non-zero mod P.
MINHASH_COEFFS: list[tuple[int, int]] = [
    (314159261, 535897932), (384626433, 832795028), (841971693, 993751058),
    (209749445, 923078164), (628620899, 862803482), (534211706, 798214808),
    (651328230, 664709384), (460955058, 223172535), (940812848, 111745028),
    (410270193, 852110555), (964462294, 895493038), (196442881, 97566593),
    (344612847, 564823378), (678316527, 120190914), (564856692, 346034861),
    (45432664, 821339360), (726024914, 127372458), (700660631, 558817488),
    (152092096, 282925409), (171536436, 789259036),
]


def hash64(col: Column | str) -> Column:
    """56-bit portable hash of a string column (see module docstring)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 14), 16, 10).cast("long")


def hash64_sql(expr: str) -> str:
    """DuckDB SQL computing the same value as :func:`hash64`."""
    return f"CAST('0x' || substr(md5({expr}), 1, 14) AS BIGINT)"


def minhash_value(col: Column | str, i: int) -> Column:
    """i-th universal-hash of a string column: ``(a_i * (h mod P) + b_i) mod P``.

    Used per-shingle; the minhash signature component is the MIN of this
    over a document's shingle set.
    """
    a, b = MINHASH_COEFFS[i]
    h = hash64(col) % HASH64_MOD
    return (h * a + b) % HASH64_MOD


def minhash_value_sql(expr: str, i: int) -> str:
    """DuckDB SQL equivalent of :func:`minhash_value`."""
    a, b = MINHASH_COEFFS[i]
    return f"(({hash64_sql(expr)} % {HASH64_MOD}) * {a} + {b}) % {HASH64_MOD}"
