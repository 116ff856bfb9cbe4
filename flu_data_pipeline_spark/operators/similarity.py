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

#: Default plane count sized for the TEST corpus (2^4 = 16 buckets over
#: ~5k vectors ≈ 300 rows/bucket). This is a tuning parameter, not a
#: constant of the algorithm — size it with :func:`make_planes`.
N_PLANES = 4


def _plane_component(j: int, d: int) -> float:
    """Deterministic pseudo-random float in [-0.5, 0.5)."""
    h = int(hashlib.md5(f"plane{j}_{d}".encode()).hexdigest()[:8], 16)
    return h / 2**32 - 0.5


def make_planes(n_planes: int, dim: int = EMBED_DIM) -> list[list[float]]:
    """Deterministic random-hyperplane family (no RNG: md5-seeded, so the
    same family is reproducible in any engine, including the SQL oracle).

    Sizing contract for scale: with corpus size N and a target candidate
    bucket of B rows, use ``n_planes = ceil(log2(N / B))`` — 2^n_planes
    buckets of ~B expected rows. E.g. N=1e10 embeddings, B=50k →
    n_planes≈18 (262k buckets). The bucket key is what the candidate
    self-join shuffles on, so B bounds per-task join work; recall drops
    as n_planes grows — band multiple independent families (OR over
    bands, like MinHash-LSH banding) to recover it.
    """
    return [[_plane_component(j, d) for d in range(dim)] for j in range(n_planes)]


PLANES: list[list[float]] = make_planes(N_PLANES)


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


def lsh_bucket(vec: Column, planes: list[list[float]] | None = None) -> Column:
    """Random-hyperplane signature: bit j = sign(vec · plane_j).

    ``planes`` defaults to the test-sized family; at scale pass
    ``make_planes(ceil(log2(N / target_bucket_rows)))``."""
    bucket = F.lit(0)
    for j, plane in enumerate(planes or PLANES):
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


def lsh_bucket_sql(vec_expr: str, planes: list[list[float]] | None = None) -> str:
    terms = [
        f"(CASE WHEN {dot_literal_sql(vec_expr, plane)} > 0 THEN {2**j} ELSE 0 END)"
        for j, plane in enumerate(planes or PLANES)
    ]
    return "CAST(" + " + ".join(terms) + " AS INT)"
