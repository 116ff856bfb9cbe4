#!/usr/bin/env python
"""Round-close gate: one command, exit 0 only when EVERY check passes.

Runs, in order, the three checks a round must close green on — and
FAILS the close if any of them fails, so post-close additions can no
longer silently re-open a gate (the round-6 regression: six queries
added after the close left 9 BroadcastNestedLoopJoin sites unaudited
and the lint sat red in the committed tree while pytest and the sweeps
were green):

1. ``python -m pytest tests/ -q``   — oracle + runtime suite
2. ``python scripts/plan_lint.py``  — plan hygiene incl. the audited-
   BNLJ registry; a new query showing BNLJ lands in REVIEW and RED
3. ``python scripts/driver_sweep.py`` — every registry query vs DuckDB
   on a stock session (pass ``--skip-sweep`` to close faster when the
   sweep already ran this session; the default is the full battery)

Usage: python scripts/close_battery.py [--skip-sweep]
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(label: str, cmd: list[str]) -> bool:
    t0 = time.time()
    print(f"=== {label}: {' '.join(cmd)}", flush=True)
    rc = subprocess.call(cmd, cwd=ROOT)
    print(f"=== {label}: exit {rc} in {time.time() - t0:.0f}s", flush=True)
    return rc == 0


def main() -> int:
    skip_sweep = "--skip-sweep" in sys.argv[1:]
    checks = [
        ("pytest", [sys.executable, "-m", "pytest", "tests/", "-q"]),
        ("plan_lint", [sys.executable, "scripts/plan_lint.py"]),
    ]
    if not skip_sweep:
        checks.append(
            ("driver_sweep", [sys.executable, "scripts/driver_sweep.py"])
        )
    failed = [label for label, cmd in checks if not run(label, cmd)]
    canary_verdict_line()
    if failed:
        print(f"CLOSE RED: {', '.join(failed)}")
        return 1
    print("CLOSE GREEN: all gates passed")
    return 0


def canary_verdict_line() -> None:
    """One-line mechanized two-axis arbitration (round 10 — VERDICT r9
    #1): take the most recent recoverable sf0.1 reading as "current"
    and run bench.arbitrate against everything before it, so the
    layout-smear-vs-regression call (frozen canary-16 = smear-sensitive
    small axis; frozen heavy-4 = executor-bound axis a smear can't
    move) is printed mechanically against BOTH anchors — the prior
    reading AND the last committed driver artifact. Informational —
    load smears are a rerun, not a gate failure; a red gate would train
    rounds to ignore it under ambient load."""
    sys.path.insert(0, ROOT)
    try:
        import bench
    except Exception as ex:  # pragma: no cover - import guard only
        print(f"canary: unavailable ({ex})")
        return
    records = bench.reading_records(ROOT, 0.1)
    if len(records) < 2:
        print("canary: no-prior (fewer than 2 sf0.1 readings)")
        return
    # "current" = the most recent CANARY-bearing record, not blindly
    # records[-1]: a heavy-only record (artifact where just the heavy
    # block was recoverable) would otherwise print canary-16 n/a /
    # no-prior even though older canary readings exist (ADVICE r10).
    cur_idx = max(
        (
            i
            for i, r in enumerate(records)
            if r["canary_total_median"] is not None
        ),
        default=len(records) - 1,
    )
    cur, prior = records[cur_idx], records[:cur_idx]
    if not prior:
        print("canary: no-prior (no reading before the current one)")
        return
    verdict, cr, hr = bench.arbitrate(
        cur["canary_total_median"],
        cur["heavy_total_median"],
        prior,
        # heavy anchors must share the CURRENT reading's cost basis —
        # a pre-reanchor reading replayed here anchors against its own
        # basis, not whatever the ledger has moved on to
        heavy_basis=cur.get("heavy_basis")
        or bench._HEAVY_BASIS_HISTORY[0][0],
    )
    def _axis(label, val, ratios):
        v = f"{val:.2f}s" if val is not None else "n/a"
        return (
            f"{label} {v} (vs_prev {ratios['ratio_vs_prev']} "
            f"[{ratios['prev_source']}], vs_last_round "
            f"{ratios['ratio_vs_last_round']} "
            f"[{ratios['last_round_source']}])"
        )
    print(
        f"canary: {verdict} — current {cur['source']}: "
        + _axis("canary-16", cur["canary_total_median"], cr)
        + "; "
        + _axis("heavy-4", cur["heavy_total_median"], hr)
        + f"; threshold {bench.CANARY_FLAT_THRESHOLD}"
    )


if __name__ == "__main__":
    sys.exit(main())
