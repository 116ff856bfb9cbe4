#!/usr/bin/env python
"""Regenerate PLANS.md: annotated physical plans for the headline queries.

Evidence for the scale-design claims (pushdown reaching the scan, broadcast
vs shuffle join selection, single-exchange windows, Expand-based grouping
sets): each bench query plus a few showcase operators, with the plan Spark
actually executes at sf0.01 and the operator's scale rationale (registry
docstring). Run from the repo root:

    python scripts/dump_plans.py > PLANS.md
"""

from __future__ import annotations

import sys
import textwrap

sys.path.insert(0, ".")

from flu_data_pipeline_spark.plans import REGISTRY  # noqa: E402
from flu_data_pipeline_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.01"

#: non-bench queries whose plans document a specific scale mechanism
SHOWCASE = (
    "scd2_priority_history",
    "grouping_sets_revenue",
    "subq_exists_late_ship",
    "ts_forward_fill",
    "centroid_cosine_matrix",
    "skew_salted_term_counts",
    "cdc_snapshot_diff",
    "zorder_pruning_gain",
    "pagerank_trade_graph",
    "dq_constraint_report",
    # late round-2 showcase: distributed ranking, curve layout, one-pass CV
    "mannwhitney_rank_sum",
    "spearman_rho_ranks",
    "hilbert_vs_zorder_locality",
    "curation_js_divergence",
    "cv_kfold_regression",
    "ts_rolling_slope",
    "hits_trade_graph",
    "curation_quantile_normalize",
    "events_survival_km",
    "stump_best_split",
    "embedding_jl_distortion",
    "huber_irls_regression",
    # final round-2 batch: retrieval, sketch, tokenizer-training,
    # incremental dedup, experimentation, placement
    "ann_mmr_rerank",
    "ranking_ndcg_eval",
    "kendall_tau_daily",
    "quantile_histogram_sketch",
    "embedding_dim_stats",
    "split_leakage_audit",
    "text_textrank_keywords",
    "dedup_incremental_ingest",
    "text_bpe_train_merges",
    "abtest_cuped_adjustment",
    "shard_rebalance_audit",
    # round-3 batch: skew-safe join, substring dedup, incremental
    # manifests, deterministic sampling, LSH self-audit
    "skew_salted_dim_join",
    "text_chunk_dedup_ratio",
    "incremental_partition_manifest",
    "curation_hash_stratified_sample",
    "dedup_lsh_recall_audit",
    # later round-3 batch: repetition gate, curation funnel, CDC
    # compaction, rate-limit fold, binned range join, byte packing,
    # exact power iteration, VARIANT extraction, centroid drift
    "text_repetition_rules",
    "curation_pipeline_funnel",
    "cdc_changelog_compaction",
    "events_rate_limit_audit",
    "join_range_bin_windows",
    "multimodal_bytes_shard_pack",
    "embedding_top_pc_power_iteration",
    "events_variant_extract",
    "embedding_centroid_drift",
    # round-4 batch: distributed exact rank, scale twins, self-proving
    # layout optimizations, df-capped near-dup
    "customer_rfm_segments_scale",
    "ntile_equidepth_scale",
    "skyline_price_size_scale",
    "dpp_pruning_gain",
    "bucketed_join_no_shuffle",
    "dedup_ngram_jaccard_capped",
    # round-4 closing batch: fingerprinting, data selection, corpus
    # planning, composite ANN, weighted sampling
    "text_winnow_density",
    "dedup_winnow_overlap",
    "curation_dsir_selection",
    "corpus_unimax_allocation",
    "ann_ivf_pq",
    "sample_es_topk",
    # round-5 batch: semantic dedup, perplexity buckets, exact packing,
    # star-contraction components, self-proving AQE probes
    "dedup_semdedup",
    "curation_ccnet_ppl_buckets",
    "corpus_concat_chunk_packing",
    "dedup_components_scale",
    "dedup_cluster_size_histogram",
    # round-6 batch: two-level IVF fit, serving layout + maintenance,
    # removal plan, classifier inference, collator audit, BPE encode
    "dedup_semdedup_scale",
    "ivf_layout_pruning_gain",
    "ivf_index_ingest_maintenance",
    "aqe_skew_join_split",
    "text_dedup_removal_plan",
    "text_hashed_linear_classifier",
    "corpus_padding_waste_audit",
    "text_bpe_encode_compression",
    # round-6 closing batch: scalar quantization, text->vector e2e,
    # semantic eval integrity, AQE coalesce gate
    "ann_sq8_asymmetric",
    "text_e2e_semantic_neighbors",
    "contamination_semantic_check",
    "aqe_coalesce_shuffle_read",
    # round-7: executed-metric gates (the returned frames are local
    # one-row results — the documented value is the PROBE plan they
    # assert on, see each docstring) and the corpus write pipeline
    "semdedup_pair_cap_metric",
    "lsh_band_pair_metric",
    "ivf_pruning_files_metric",
    # round-9: the (e)-family migration's representative plan (global
    # prefix via range shuffle + partitioned windows), the hydration
    # metric gate, and the leakproof group split
    "eval_isotonic_calibration",
    "pq_rerank_hydration_metric",
    "sample_group_split_leakproof",
    # round-10: the mixture materializer (per-domain doc ranks through
    # the distributed global_rank prefix, not a per-source window)
    "curation_doremi_apply",
)


def main() -> None:
    spark = get_spark(app_name="dump-plans")
    names = [n for n, q in REGISTRY.items() if q.bench] + [
        n for n in SHOWCASE if n in REGISTRY
    ]
    out = [
        "# PLANS — executed physical plans of the headline queries",
        "",
        f"Generated by `python scripts/dump_plans.py > PLANS.md` at sf0.01.",
        "What to look for: `PushedFilters`/`ReadSchema` at the `Scan parquet`",
        "nodes (pushdown + pruning reach the format reader), broadcast vs",
        "shuffle join selection per the 2MB policy, exchange counts (the",
        "shuffle budget each docstring claims), and Expand/Window/TakeOrdered",
        "physical operators backing the declarative plans.",
        "",
    ]
    for name in names:
        qd = REGISTRY[name]
        df = qd.builder(spark, SF)
        # NUL bytes appear when a plan renders an empty-string literal
        # (xxhash64 coalesce) — strip them so PLANS.md stays text
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "simple"
            )
        )
        doc = " ".join(qd.doc.split())
        out.append(f"## {name}" + ("  _(bench)_" if qd.bench else ""))
        out.append("")
        out.append("\n".join(textwrap.wrap(doc, width=76)))
        out.append("")
        out.append("```")
        out.append(plan.rstrip().replace("\x00", "''"))
        out.append("```")
        out.append("")
    print("\n".join(out))
    spark.stop()


if __name__ == "__main__":
    main()
