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
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 12,
    shingle_n: int = 3,
    spread: bool = True,
) -> DataFrame:
    """Per-document MinHash signature columns ``h0..h{num_hashes-1}``.

    **Zero shuffles**: MIN is duplicate-insensitive, so each signature
    component is ``array_min`` over a per-row array of universal-hash
    values — the whole computation stays inside whole-stage codegen on the
    scan side (the naive explode → distinct → groupBy design shuffles the
    exploded shingle set twice). The md5 base hash is materialized once per
    shingle (its own projection — HOF lambdas don't CSE across columns)
    and reused by all hash functions of the linear-congruential family.

    Documents with fewer than ``shingle_n`` tokens have no shingles and
    produce no output row (matching explode semantics / the SQL oracle).

    ``spread=True`` round-robins (id, text) across shuffle partitions
    before hashing: the signature math is CPU-bound and map-side, so a
    low-partition-count scan (one small parquet file locally; a skewed
    file layout at scale) would otherwise serialize it. This shuffle moves
    only raw text — strictly less than what an explode-based design
    shuffles — and is the *only* exchange in signature computation.
    """
    if num_hashes > len(MINHASH_COEFFS):
        raise ValueError(f"at most {len(MINHASH_COEFFS)} hash functions supported")
    if spread:
        # explicit numPartitions: AQE would coalesce a bytes-tiny exchange
        # to 1 partition and serialize the CPU-bound hash stage
        df = df.repartition(
            df.sparkSession.sparkContext.defaultParallelism, F.col(id_col)
        )
    base = (
        df.select(F.col(id_col), tokenize(F.col(text_col)).alias("tokens"))
        # cheap no-shingle filter (≥ n tokens ⟺ ≥ 1 shingle): filtering on
        # size(sh) instead gets predicate-pushed below the repartition and
        # re-runs the whole shingle build serially on the scan side
        .filter(F.size("tokens") >= shingle_n)
        .select(
            F.col(id_col),
            shingles_from_tokens(F.col("tokens"), shingle_n).alias("sh"),
        )
        .select(
            F.col(id_col),
            F.transform("sh", lambda s: hash64(s) % HASH64_MOD).alias("base_h"),
        )
    )
    sigs = [
        F.array_min(
            F.transform("base_h", lambda h: (h * a + b) % HASH64_MOD)
        ).alias(f"h{i}")
        for i, (a, b) in enumerate(MINHASH_COEFFS[:num_hashes])
    ]
    return base.select(F.col(id_col), *sigs)


def lsh_bands(
    sig: DataFrame, id_col: str, num_hashes: int = 12, band_size: int = 3
) -> DataFrame:
    """Explode a MinHash signature frame into its banded-LSH bucket keys:
    one row per (id, band_idx, band_key). The (band_idx, band_key) pair
    is the shuffle/join key for both self-join dedup
    (:func:`lsh_candidate_pairs`) and cross-frame probes (incremental
    ingest against an existing index)."""
    n_bands = num_hashes // band_size
    return sig.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.concat_ws(
                            "_",
                            *[F.col(f"h{b * band_size + j}") for j in range(band_size)],
                        ).alias("band_key"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("band"),
    ).select(F.col(id_col), F.col("band.band_idx"), F.col("band.band_key"))


def lsh_candidate_pairs(
    sig: DataFrame, id_col: str, num_hashes: int = 12, band_size: int = 3
) -> DataFrame:
    """Banded-LSH candidate pairs: docs sharing any full band of signature
    values. Returns distinct (id_a, id_b), id_a < id_b.

    The self-join key is (band_idx, band_key) — bucket sizes, not n²,
    bound the shuffle. Skewed buckets (boilerplate text) are handled by
    AQE skew-join splitting at scale.
    """
    banded = lsh_bands(sig, id_col, num_hashes, band_size)
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
    df: DataFrame, id_col: str, text_col: str, bits: int = 16, spread: bool = True
) -> DataFrame:
    """B-bit SimHash per document: bit j set iff the signed majority of
    distinct-token hash bits at position j is positive.

    **Zero shuffles**: the distinct-token set is ``array_distinct`` over
    the per-row token array and each per-bit signed sum is an
    ``aggregate`` over the materialized token-hash array — all map-side
    (the naive explode → distinct → groupBy design shuffles the token set
    twice). Per-bit majorities stay identical to the exploded form because
    both operate on the same distinct-token multiset.

    ``spread``: see :func:`minhash_signatures` — parallelizes the
    CPU-bound hash work when the scan has few partitions.
    """
    if spread:
        df = df.repartition(
            df.sparkSession.sparkContext.defaultParallelism, F.col(id_col)
        )
    hashed = (
        # null text must drop the row (explode/unnest semantics, matching
        # the SQL oracle) — the array fold would otherwise emit simhash=0
        df.filter(F.col(text_col).isNotNull())
        .select(
            F.col(id_col),
            F.array_distinct(tokenize(F.col(text_col))).alias("toks"),
        )
        .select(
            F.col(id_col),
            F.transform("toks", lambda t: hash64(t)).alias("th"),
        )
    )
    bit_sums = [
        F.aggregate(
            "th",
            F.lit(0).cast("long"),
            lambda acc, h: acc
            + F.when(F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        ).alias(f"s{j}")
        for j in range(bits)
    ]
    summed = hashed.select(F.col(id_col), *bit_sums)
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
    sliced = sig.select(
        F.col(id_col),
        F.col("simhash"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.shiftright(F.col("simhash"), b * band_bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("band_key"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band"),
    ).select(F.col(id_col), F.col("simhash"), F.col("band.band_idx"), F.col("band.band_key"))
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
