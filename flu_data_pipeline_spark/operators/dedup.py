"""Reusable dedup operators, 100 TB-minded.

All operators are compositions of native DataFrame ops (no Python UDFs):

- exact dedup: hash-groupBy on a fingerprint — shuffles (hash, id), never
  the payload.
- MinHash: shingle → portable universal-hash family → per-doc MIN per hash
  function → banded LSH → candidate pairs from band-bucket self-join.
  Candidate generation is the standard distributed near-dup design: cost
  bounded by band-bucket sizes, no O(n²) cross join.
- SimHash: per-token portable hash → per-bit signed majority → B-bit
  signature; near-dup pairs via banded buckets + hamming distance filter.

Determinism: every hash is the md5-prefix portable hash
(:mod:`flu_data_pipeline_spark.functions.hashing`), so a DuckDB oracle
reproduces identical signatures.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from flu_data_pipeline_spark.functions.hashing import HASH64_MOD, MINHASH_COEFFS, hash64


def tokenize(col: Column) -> Column:
    """Lowercased whitespace tokens. ALWAYS materialize this as its own
    projected column before building shingles/features from it: expression
    trees that reference the split result multiple times inside
    higher-order-function lambdas re-evaluate the regex split per
    reference (no CSE across lambda boundaries) — O(len²) per row."""
    return F.split(F.lower(F.trim(col)), r"\s+")


def shingles_from_tokens(tokens: Column, n: int = 3) -> Column:
    """Word n-gram shingle array from a *materialized* token-array column."""
    return F.filter(
        F.transform(
            tokens,
            lambda _, i: F.when(
                i + n <= F.size(tokens),
                F.concat_ws(" ", F.slice(tokens, i + 1, n)),
            ),
        ),
        lambda x: x.isNotNull(),
    )


def shingles(col: Column, n: int = 3) -> Column:
    """Shingles straight from raw text — convenience for small inputs; on
    large corpora project :func:`tokenize` first (see its docstring)."""
    return shingles_from_tokens(tokenize(col), n)


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Representative (min id) per identical payload, via md5 fingerprint."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("fingerprint"))
        .agg(F.min(id_col).alias(f"keep_{id_col}"), F.count(F.lit(1)).alias("n_copies"))
    )


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, num_hashes: int = 12, shingle_n: int = 3
) -> DataFrame:
    """Per-document MinHash signature columns ``h0..h{num_hashes-1}``.

    One shuffle (groupBy id); the md5 base hash is computed once per
    shingle and reused by all hash functions (linear congruential family).
    """
    if num_hashes > len(MINHASH_COEFFS):
        raise ValueError(f"at most {len(MINHASH_COEFFS)} hash functions supported")
    shingled = (
        df.select(F.col(id_col), tokenize(F.col(text_col)).alias("tokens"))
        .select(
            F.col(id_col),
            F.explode(shingles_from_tokens(F.col("tokens"), shingle_n)).alias("shingle"),
        )
        .distinct()
        .withColumn("base_h", hash64(F.col("shingle")) % HASH64_MOD)
    )
    aggs = [
        F.min((F.col("base_h") * a + b) % HASH64_MOD).alias(f"h{i}")
        for i, (a, b) in enumerate(MINHASH_COEFFS[:num_hashes])
    ]
    return shingled.groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs(
    sig: DataFrame, id_col: str, num_hashes: int = 12, band_size: int = 3
) -> DataFrame:
    """Banded-LSH candidate pairs: docs sharing any full band of signature
    values. Returns distinct (id_a, id_b), id_a < id_b.

    The self-join key is (band_idx, band_key) — bucket sizes, not n²,
    bound the shuffle. Skewed buckets (boilerplate text) are handled by
    AQE skew-join splitting at scale.
    """
    n_bands = num_hashes // band_size
    bands = [
        sig.select(
            F.col(id_col),
            F.lit(b).alias("band_idx"),
            F.concat_ws(
                "_", *[F.col(f"h{b * band_size + j}") for j in range(band_size)]
            ).alias("band_key"),
        )
        for b in range(n_bands)
    ]
    banded = reduce(DataFrame.unionByName, bands)
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


def simhash(
    df: DataFrame, id_col: str, text_col: str, bits: int = 16
) -> DataFrame:
    """B-bit SimHash per document: bit j set iff the signed majority of
    distinct-token hash bits at position j is positive."""
    tokens = (
        df.select(
            F.col(id_col),
            F.explode(tokenize(F.col(text_col))).alias("token"),
        )
        .distinct()
        .withColumn("th", hash64(F.col("token")))
    )
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("th"), j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"s{j}")
        for j in range(bits)
    ]
    summed = tokens.groupBy(id_col).agg(*bit_sums)
    sig = reduce(
        lambda acc, j: acc
        + F.when(F.col(f"s{j}") > 0, F.lit(2**j).cast("long")).otherwise(F.lit(0).cast("long")),
        range(bits),
        F.lit(0).cast("long"),
    )
    return summed.select(F.col(id_col), sig.alias("simhash"))


def simhash_near_pairs(
    sig: DataFrame, id_col: str, bits: int = 16, bands: int = 4, max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs by SimHash: candidates share one of ``bands`` equal
    signature slices (pigeonhole: any pair within hamming ≤ bands-1 shares
    a band), then exact hamming ≤ max_hamming via xor+bit_count."""
    band_bits = bits // bands
    mask = (1 << band_bits) - 1
    sliced = reduce(
        DataFrame.unionByName,
        [
            sig.select(
                F.col(id_col),
                F.col("simhash"),
                F.lit(b).alias("band_idx"),
                F.shiftright(F.col("simhash"), b * band_bits)
                .bitwiseAND(F.lit(mask))
                .alias("band_key"),
            )
            for b in range(bands)
        ],
    )
    a = sliced.alias("a")
    b = sliced.alias("b")
    hamming = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            hamming.alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
