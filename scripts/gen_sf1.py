#!/usr/bin/env python
"""Synthesize sf1 testdata (10x sf0.1) for the third scaling decade.

The driver ships sf0.001/0.01/0.1 (read-only). SCALING.md's 100 TB
argument rests on ratios across those two decades; this script adds a
third by upscaling sf0.1 10x with TPC-H-style key remapping so that
join cardinalities, group counts, and key distributions scale the way
a real corpus does:

- fact + large-dim tables (orders, lineitem, customer, supplier, part,
  events, documents, embeddings) are replicated 10x; every key column
  gets ``key + replica * (max_key + 1)`` so foreign keys stay
  consistent WITHIN a replica and never collide across replicas;
- region/nation stay fixed (they are fixed-size enums at any scale);
- document text gets a per-replica suffix token and embeddings a
  deterministic per-replica value nudge, so dedup/similarity queries
  see 10x the candidate space rather than 10 exact copies of every
  item (which would measure a pathological all-duplicates corpus, not
  a bigger one);
- deterministic throughout (no RNG) — re-running reproduces the same
  bytes, and timing comparisons stay apples-to-apples.

Output: .testdata/sf1/*.parquet under the repo root (gitignored —
~170 MB of derived data). Timing-only: the DuckDB oracle gate runs at
sf0.01; nothing here feeds correctness checks.

Usage: python scripts/gen_sf1.py [out_dir] [src_sf_dir] [replicas]

``src_sf_dir`` defaults to $SPARK_GRAFT_SF_DIR (the same env var
bench.py reads) falling back to /root/testdata/sf0.1, so the generator
works on any machine whose testdata lives elsewhere. ``replicas``
(default 10) sets the upscale factor: 10 -> sf1, 100 -> sf10 (a FIFTH
decade, ~60M lineitem rows / 200k embeddings). Above 26 replicas the
per-replica document transform switches from pure alphabet rotation to
the general AFFINE character permutation i -> (a*i + b) mod 26 with a
coprime to 26 — 312 distinct permutations, each a bijection on [a-z],
so replicas stay textually unrelated (pairwise-distinct permutations)
while word/char statistics keep their shape. For r < 26 the affine
pair is (1, r), which IS the historical rotation — a regenerated sf1
carries exactly the same rows as before the parameter existed.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from flu_data_pipeline_spark.session import get_spark

REPLICAS = 10

#: multipliers coprime to 26 — with shifts 0..25 they enumerate 312
#: pairwise-distinct affine permutations i -> (a*i + b) mod 26 of the
#: lowercase alphabet. Ordered so pair r < 26 is (1, r): the pure
#: rotation the script always used, keeping sf1 output byte-identical.
_COPRIME_26 = [1, 3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25]


def _affine_perm(r: int) -> str:
    """The r-th affine permutation of a-z as a 26-char translate target."""
    if r >= len(_COPRIME_26) * 26:
        raise ValueError(f"replica {r} exceeds the 312 affine permutations")
    a = _COPRIME_26[r // 26]
    b = r % 26
    return "".join(
        chr(ord("a") + (a * i + b) % 26) for i in range(26)
    )

#: key columns remapped per table: (primary/foreign key -> base table
#: whose max defines the offset stride)
KEYED = {
    "customer": {"c_custkey": "c_custkey"},
    "supplier": {"s_suppkey": "s_suppkey"},
    "part": {"p_partkey": "p_partkey"},
    "orders": {"o_orderkey": "o_orderkey", "o_custkey": "c_custkey"},
    "lineitem": {
        "l_orderkey": "o_orderkey",
        "l_partkey": "p_partkey",
        "l_suppkey": "s_suppkey",
    },
    "events": {"event_id": "event_id", "user_id": "user_id"},
    "documents": {"doc_id": "doc_id"},
    "embeddings": {"vec_id": "vec_id"},
}

#: where each stride column lives
STRIDE_TABLE = {
    "c_custkey": "customer",
    "s_suppkey": "supplier",
    "p_partkey": "part",
    "o_orderkey": "orders",
    "event_id": "events",
    "user_id": "events",
    "doc_id": "documents",
    "vec_id": "embeddings",
}


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".testdata", "sf1",
    )
    src = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    replicas = int(sys.argv[3]) if len(sys.argv) > 3 else REPLICAS
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="gen-sf1")

    strides: dict[str, int] = {}
    for col, table in STRIDE_TABLE.items():
        df = spark.read.parquet(f"{src}/{table}.parquet")
        strides[col] = int(df.agg(F.max(col)).first()[0]) + 1

    reps = F.broadcast(
        spark.createDataFrame(
            [(r, _affine_perm(r)) for r in range(replicas)],
            "__rep bigint, __perm string",
        )
    )

    for table in ["region", "nation"]:
        spark.read.parquet(f"{src}/{table}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{out_dir}/{table}.parquet")
        print(f"{table}: copied (fixed-size dim)")

    for table, keymap in KEYED.items():
        df = spark.read.parquet(f"{src}/{table}.parquet")
        up = df.crossJoin(reps)
        for col, stride_col in keymap.items():
            up = up.withColumn(
                col,
                (F.col(col) + F.col("__rep") * F.lit(strides[stride_col]))
                .cast("bigint"),
            )
        if table == "documents":
            # Replica r > 0 gets a per-replica character permutation:
            # a suffix alone would leave every replica a NEAR-dup of
            # its original (shingle sets ~identical), so near-dup
            # queries would see replica-count-copy families — a
            # quadratic candidate-pair artifact of the generator, not
            # of a real bigger corpus. Permuting the token alphabet
            # makes replicas textually unrelated (n-gram Jaccard ~ 0
            # across replicas) while preserving word/char statistics
            # shape. The FULL a-z range must permute: an a-t-only
            # rotation left u/v/w/y runs identical across replicas,
            # and CHARACTER-level operators (winnowing 8-gram
            # fingerprints) then saw hot cross-replica fingerprints
            # with df^2 cost — measured as a fake 12x super-linearity
            # before this fix. Pairwise-distinct AFFINE permutations
            # (see _affine_perm) extend the scheme past 26 replicas;
            # r < 26 is the historical pure rotation.
            up = up.withColumn(
                "text",
                F.expr(
                    "translate(text, 'abcdefghijklmnopqrstuvwxyz', "
                    "__perm)"
                ),
            ).withColumn("n_chars", F.length("text").cast("bigint"))
        if table == "embeddings":
            # deterministic per-replica nudge on the first component:
            # vectors stay near their family (ANN recall shape holds)
            # without 10 exact copies collapsing distance structure
            up = up.withColumn(
                "embedding",
                F.concat(
                    F.array(
                        (
                            F.element_at("embedding", 1)
                            + F.col("__rep").cast("float") / F.lit(1000.0)
                        ).cast("float")
                    ),
                    F.slice("embedding", 2, 10_000),
                ),
            )
        n = up.count()
        up.drop("__rep", "__perm").repartition(32).write.mode(
            "overwrite"
        ).parquet(f"{out_dir}/{table}.parquet")
        print(f"{table}: {n} rows")

    spark.stop()
    print(f"{replicas}x upscale written to {out_dir}")


if __name__ == "__main__":
    main()
