"""Curation-op edge cases unreachable via the (digit-free) test corpus:
the match half of the PII scrubber, and contamination-flag semantics on a
constructed overlap."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_pii_scrub_matches_and_redacts(spark):
    from flu_data_pipeline_spark.plans.curation_queries import (
        PII_EMAIL,
        PII_IPV4,
        PII_PHONE,
    )

    df = spark.createDataFrame(
        [
            (1, "contact bob@example.com or 555-123-4567 now"),
            (2, "server at 10.0.0.1 and mirror at 192.168.1.100"),
            (3, "clean text with no identifiers at all"),
            (4, "two mails: a@b.io c.d@e-corp.org; ip 8.8.8.8"),
        ],
        "doc_id long, text string",
    )
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), PII_EMAIL, "<EMAIL>"),
            PII_PHONE,
            "<PHONE>",
        ),
        PII_IPV4,
        "<IP>",
    )
    rows = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            F.size(F.regexp_extract_all("text", F.lit(PII_EMAIL), F.lit(0))).alias("ne"),
            F.size(F.regexp_extract_all("text", F.lit(PII_PHONE), F.lit(0))).alias("np"),
            F.size(F.regexp_extract_all("text", F.lit(PII_IPV4), F.lit(0))).alias("ni"),
            redacted.alias("red"),
        ).collect()
    }
    assert (rows[1]["ne"], rows[1]["np"], rows[1]["ni"]) == (1, 1, 0)
    assert rows[1]["red"] == "contact <EMAIL> or <PHONE> now"
    assert rows[2]["ni"] == 2 and "<IP>" in rows[2]["red"]
    assert rows[3]["red"] == "clean text with no identifiers at all"
    assert rows[4]["ne"] == 2 and rows[4]["ni"] == 1


def test_contamination_flags_constructed_overlap(spark, tmp_path):
    """A val doc that is a verbatim copy of a train doc must be flagged
    contaminated (ratio 1.0); a disjoint val doc must not appear."""
    import shutil

    from flu_data_pipeline_spark.functions.hashing import hash64
    from flu_data_pipeline_spark.plans.curation_queries import (
        curation_contamination_check,
    )

    # pick ids landing on each side of the deterministic 90/10 hash split
    probe = spark.createDataFrame(
        [(i,) for i in range(1, 200)], "doc_id long"
    ).select(
        "doc_id", (hash64(F.col("doc_id").cast("string")) % 100 < 90).alias("t")
    )
    sides = {r["doc_id"]: r["t"] for r in probe.collect()}
    train_id = next(i for i, t in sides.items() if t)
    val_id = next(i for i, t in sides.items() if not t)
    val_id2 = next(i for i, t in sides.items() if not t and i != val_id)

    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (train_id, shared, "en", "src0", len(shared)),
        (val_id, shared, "en", "src0", len(shared)),
        (val_id2, "one two three four five six seven eight nine ten", "en",
         "src0", 49),
    ]
    sf = tmp_path / "sf_fixture"
    sf.mkdir()
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(str(sf / "documents.parquet"))

    got = {
        r["doc_id"]: r for r in curation_contamination_check(spark, str(sf)).collect()
    }
    assert val_id in got and got[val_id]["contaminated"] is True
    assert got[val_id]["share_ratio"] == 1.0
    assert val_id2 not in got  # disjoint 5-grams -> no hit
    assert train_id not in got  # train docs are never reported
    shutil.rmtree(sf, ignore_errors=True)
