#!/usr/bin/env python
"""Registry-wide physical-plan hygiene sweep.

Builds (analysis only — nothing executes) every registered query's plan
and flags the anti-patterns that break at 100 TB:

- ``CartesianProduct``: an unconditioned cross join of data-sized inputs.
  Bounded grids (dimension x calendar) must go through an explicit
  ``crossJoin`` of provably tiny frames, which Spark plans as
  BroadcastNestedLoopJoin — reported separately as informational.
- ``BatchEvalPython``: row-at-a-time Python in the plan. Arrow-batched
  Python (``ArrowEvalPython`` / ``MapInPandas`` / ``FlatMapGroupsInPandas``)
  is the sanctioned slow path for the multimodal family and is allowed.
- ``InMemoryTableScan``: a query silently depending on cached state.

Streaming queries (``stream_*``) are skipped: their builders *execute*
the stream to a memory sink; the returned frame is a post-hoc batch agg.

Usage: python scripts/plan_lint.py   (exit 1 on hard violations)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HARD = ("CartesianProduct", "BatchEvalPython", "InMemoryTableScan")
INFO = ("BroadcastNestedLoopJoin",)

#: Audited BroadcastNestedLoopJoin sites (see each query's docstring).
#: Three legitimate shapes: (a) crossJoin with a 1-ROW aggregate
#: (global totals/bounds/quantiles — scalar broadcast, free at any
#: scale); (b) broadcast of a PROVABLY TINY frame (centroids, bloom
#: bits, query vectors, calendar grids); (c) a deliberate NON-EQUI
#: join condition (band ranges, triangle orientation m<n) where BNLJ
#: with a broadcast side IS the plan. New queries showing BNLJ land
#: in REVIEW until audited into this set.
BNLJ_AUDITED = {
    "abtest_cuped_adjustment",  # (a) crossJoin of two 1-row moment aggs
    "conversion_latency_quantiles",  # (a)+(c) 1-row n + rank-interval cond
    "conformal_interval_coverage",  # (a) 1-row fit/k/q_hat broadcasts
    "shard_rebalance_audit",  # (b) 40-row hash ring broadcast
    "ann_mmr_rerank",        # (b) 1-row query vec + 20-row pool/pairs
    "attribution_shapley",   # (a) crossJoin of two 1-row aggregates
    "drift_psi",             # (a) 1-row bin-bounds aggregate
    "kendall_tau_daily",     # (b)+(c) calendar-bounded daily agg, d1<d2
    "quantile_histogram_sketch",  # (a)+(b) 1-row min/max + 256-bin hist
    "ranking_ndcg_eval",     # (b) 5 query vectors broadcast, id<>id
    "ranking_rrf_fusion",    # (b) literal term list broadcast
    "ann_ivf",               # (b) K centroid vectors broadcast
    "ann_ivf_kmeans",        # (b) trained centroids broadcast
    "ann_mrr_eval",          # (b) brute-force truth for 5 queries
    "ann_recall_eval",       # (b) truth set for 5 query ids
    "ann_topk_cosine",       # (b) 5 query vectors broadcast
    "bloom_semi_prune",      # (b) filter bit positions
    "brand_affinity_lift",   # (a) 1-row basket-count total
    "centroid_cosine_matrix",  # (b) label centroids
    "curation_association_chi2",  # (a) 1-row grand total
    "customer_rfm_segments",  # (a) 1-row max-date anchor
    "poisson_bootstrap_se",  # (b) 5-row replicate enum broadcast
    "curation_domain_mix",   # (a) 1-row corpus totals
    "decayed_user_leaderboard",  # (a) 1-row max-date anchor
    "dq_benford_digits",     # (a) 1-row digit-count total
    "drift_value_histogram",  # (a) 1-row min/max bounds
    "embedding_prefix_capture",  # (b) 3-row prefix-length enum
    "epoch_shuffle_plan",    # (b) 3-row epoch enum broadcast
    "eval_auc_purchase",     # (a) 1-row pos/neg totals
    "eval_calibration_bins",  # (a) 1-row bounds
    "eval_pr_curve_purchase",  # (a) 1-row totals
    "histogram_equiwidth",   # (a) 1-row min/max
    "join_cardinality_audit",  # (a) crosses of 1-row stat aggregates
    "kmeans_cluster_summary",  # (b) k centroids
    "kmv_distinct_setalgebra",  # (a) 1-row merged-sketch stats
    "q11_important_stock",   # (a) 1-row global sum+count
    "q22_dormant_rich_customers",  # (a) 1-row avg balance cutoff
    "range_band_join",       # (c) band-range condition
    "ranking_rbo_eval",      # (a)+(b) corpus stats + 10-row depth enum
    "sample_weighted",       # (a) 1-row max length
    "supplier_scorecard",    # (a) 1-row population-stats broadcast
    "text_bigram_lm_score",  # (a) 1-row vocab-size scalar
    "text_bm25_topk",        # (a) 1-row corpus stats
    "triangle_count_cosupply",  # (c) orientation m<n condition
    "ts_gapfill_daily",      # (b) calendar grid x type enum
    "ts_linear_interpolate",  # (c) anchor-range condition
    "winsorize_stats",       # (a) 1-row quantile cutoffs
    "zorder_layout",         # (a) 1-row dimension bounds
    # late round-2 stats/curation batch — all (a) 1-row-aggregate
    # broadcasts (totals, bounds, coefficients) or (b) tiny enums:
    "anova_f_groups",        # (a) 1-row grand totals
    "cluster_label_nmi",     # (a) 1-row N + (b) K centroids
    "curation_ipf_raking",   # (a) 1-row margin targets
    "curation_js_divergence",  # (a) 1-row corpus token total
    "curation_quantile_normalize",  # (a) 1-row pool size
    "cv_kfold_regression",   # (a) 1-row total moments
    "did_event_value",       # (a) 1-row day bounds
    "embedding_jl_distortion",  # (b) 1-row sign-matrix broadcast
    "events_survival_km",    # (a) 1-row user-count total
    "gdpr_delete_cascade",   # (a) 1-row per-table counts crossed
    "hilbert_layout",        # (a) 1-row dimension bounds
    "hilbert_vs_zorder_locality",  # (a) 1-row dimension bounds
    "huber_irls_regression",  # (a) 1-row coefficient broadcast
    "ks_two_sample",         # (a) 1-row group totals
    "label_noise_estimate",  # (b) K centroids broadcast
    "mannwhitney_rank_sum",  # (a) tiny bucket-offsets broadcast
    "permutation_test_mean",  # (a) 1-row moment totals
    "spearman_rho_ranks",    # (a) tiny bucket-offsets broadcast
    "stump_best_split",      # (a) 1-row class totals
    "survival_logrank_test",  # (a) 1-row cohort totals
    "trimmed_mean_exact",    # (a) 1-row n/k totals
    "ts_acf_lags",           # (a) 1-row global moments
}


def main() -> int:
    from flu_data_pipeline_spark.plans import REGISTRY
    from flu_data_pipeline_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="plan_lint", shuffle_partitions=8)

    hard_hits: list[tuple[str, str]] = []
    info_hits: list[tuple[str, str]] = []
    for name, qd in sorted(REGISTRY.items()):
        if name.startswith("stream_"):
            continue
        try:
            plan = (
                qd.builder(spark, sf_dir)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
        except Exception as ex:  # build failure is itself a hard hit
            hard_hits.append((name, f"build-error: {str(ex)[:120]}"))
            continue
        for marker in HARD:
            if marker in plan:
                hard_hits.append((name, marker))
        for marker in INFO:
            if marker in plan:
                info_hits.append((name, marker))

    review = [(n, m) for n, m in info_hits if n not in BNLJ_AUDITED]
    for name, marker in info_hits:
        flag = "REVIEW" if name not in BNLJ_AUDITED else "audited"
        print(f"info [{flag}] {name}: {marker}")
    for name, marker in hard_hits:
        print(f"HARD {name}: {marker}")
    print(
        f"\n{len(hard_hits)} hard violations, {len(info_hits)} informational "
        f"({len(review)} to review)"
    )
    return 1 if hard_hits or review else 0


if __name__ == "__main__":
    raise SystemExit(main())
