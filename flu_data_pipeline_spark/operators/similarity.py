"""Similarity-search operators: brute-force cosine and random-hyperplane LSH.

The hyperplanes are deterministic module constants (md5-seeded floats
computed in Python at import — no RNG at query time), embedded as literal
arrays in both the Spark plan and the DuckDB oracle, so bucket assignments
are bit-identical across engines.

Scale design: the LSH signature is computed in one scan projection (no
shuffle); the candidate join shuffles on the bucket key only. Brute force
stays as the exact baseline for small query sets (broadcast the queries,
scan candidates once).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EMBED_DIM = 64
N_PLANES = 4  # 16 buckets over the test corpus; raise for bigger corpora


def _plane_component(j: int, d: int) -> float:
    """Deterministic pseudo-random float in [-0.5, 0.5)."""
    h = int(hashlib.md5(f"plane{j}_{d}".encode()).hexdigest()[:8], 16)
    return h / 2**32 - 0.5


PLANES: list[list[float]] = [
    [_plane_component(j, d) for d in range(EMBED_DIM)] for j in range(N_PLANES)
]


def dot_literal(vec: Column, plane: list[float]) -> Column:
    """Σ vec_i · plane_i with double accumulation in array order (matches
    the DuckDB left-fold bit for bit)."""
    return F.aggregate(
        F.zip_with(
            vec,
            F.array(*[F.lit(x) for x in plane]),
            lambda a, b: a.cast("double") * b,
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def lsh_bucket(vec: Column) -> Column:
    """Random-hyperplane signature: bit j = sign(vec · plane_j)."""
    bucket = F.lit(0)
    for j, plane in enumerate(PLANES):
        bucket = bucket + F.when(dot_literal(vec, plane) > 0, F.lit(2**j)).otherwise(
            F.lit(0)
        )
    return bucket.cast("int")


def plane_sql(plane: list[float]) -> str:
    """DuckDB literal for one hyperplane."""
    return "[" + ", ".join(repr(x) for x in plane) + "]"


def dot_literal_sql(vec_expr: str, plane: list[float]) -> str:
    p = plane_sql(plane)
    return (
        f"list_reduce(list_transform(range(1, {EMBED_DIM} + 1), "
        f"i -> CAST({vec_expr}[i] AS DOUBLE) * ({p})[i]), (x, y) -> x + y)"
    )


def lsh_bucket_sql(vec_expr: str) -> str:
    terms = [
        f"(CASE WHEN {dot_literal_sql(vec_expr, plane)} > 0 THEN {2**j} ELSE 0 END)"
        for j, plane in enumerate(PLANES)
    ]
    return "CAST(" + " + ".join(terms) + " AS INT)"
