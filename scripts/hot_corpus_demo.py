#!/usr/bin/env python
"""Hot-shingle corpus demo: where the df cap earns its keep.

The driver's synthetic documents grow vocabulary with corpus size
(max shingle df 25 at sf1), so SCALING.md cannot show the regime the
df-capped near-dup variant exists for. This script builds that regime
deterministically — a Zipfian 200-word vocabulary over 20k docs, where
common trigrams' document frequency grows with the corpus — and times
both variants. Measured on local[32]:

    dedup_ngram_jaccard_capped:  5.9 s,     83,758 pairs >= 0.2
    dedup_ngram_jaccard:        30.3 s, 13,819,015 pairs >= 0.2

5x faster AND the 13.7M dropped pairs are precisely the
common-boilerplate overlaps (7% of ALL doc pairs cleared 0.2 through
shared hot trigrams alone) a near-dup pass wants to ignore. At another
10x corpus the uncapped sum(df^2) becomes untenable while cap x
postings stays linear.

Usage: python scripts/hot_corpus_demo.py
"""

import sys
import time
sys.path.insert(0, '/root/repo')
from pyspark.sql import functions as F
from flu_data_pipeline_spark.plans import REGISTRY
from flu_data_pipeline_spark.session import get_spark

spark = get_spark(app_name="hot-demo")
# Zipfian 200-word vocabulary, 20k docs x ~30 tokens: common trigrams'
# df grows with the corpus - the natural-language regime.
N_DOCS, LEN, V = 20000, 30, 200
docs = (
    spark.range(N_DOCS).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", F.transform(
            F.sequence(F.lit(1), F.lit(LEN)),
            # deterministic zipf-ish: rank = floor(V / (1 + (hash % V^2)/V)) - skew to low ranks
            lambda i: F.concat(F.lit("w"), (
                F.floor(F.lit(V) / (F.pmod(F.xxhash64(F.col("id") * 1000 + i), F.lit(V*V)) / F.lit(V) + 1))
            ).cast("int").cast("string"))
        )).alias("text"),
        F.lit("en").alias("lang"), F.lit("src1").alias("source"),
    ).withColumn("n_chars", F.length("text").cast("long"))
)
sf = "/tmp/hot_sf"
docs.coalesce(8).write.mode("overwrite").parquet(f"{sf}/documents.parquet")

for name in ["dedup_ngram_jaccard_capped", "dedup_ngram_jaccard"]:
    qd = REGISTRY[name]
    t0 = time.perf_counter()
    n = qd.builder(spark, sf).count()
    print(f"{name}: {time.perf_counter()-t0:.1f}s, {n} pairs >= 0.2", flush=True)
spark.stop()
