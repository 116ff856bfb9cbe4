"""Unit tests for bench.py's canary-arbitration plumbing (round 9):
recovering prior frozen-canary readings from committed driver
artifacts (including the truncated-``tail`` capture) and from the
local history file, filtered to the matching scale factor."""

from __future__ import annotations

import importlib.util
import json
import os

_spec = importlib.util.spec_from_file_location(
    "bench_mod",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "bench.py",
    ),
)
bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench)


def _write(path, obj):
    with open(path, "w") as fh:
        fh.write(obj if isinstance(obj, str) else json.dumps(obj))


def test_readings_from_parsed_tail_and_history(tmp_path):
    # r7-style artifact: no canary anywhere -> skipped
    _write(tmp_path / "BENCH_r07.json",
           {"sf": 0.1, "parsed": None, "tail": '"queries": {"a": 1.0}'})
    # r8-style artifact: canary only in the truncated tail
    _write(tmp_path / "BENCH_r08.json",
           {"sf": 0.1, "parsed": None,
            "tail": 'xx "canary": {"n": 16, "total_median": 4.911} yy'})
    # r9-style artifact: fully parsed JSON
    _write(tmp_path / "BENCH_r09.json",
           {"sf": 0.1,
            "parsed": {"canary": {"total_median": 5.0}}, "tail": ""})
    # wrong-sf artifact must be filtered out
    _write(tmp_path / "BENCH_r10.json",
           {"sf": 0.01,
            "parsed": {"canary": {"total_median": 9.9}}, "tail": ""})
    # local history: one matching line, one wrong-sf line, one junk line
    with open(tmp_path / ".bench_history.jsonl", "w") as fh:
        fh.write(json.dumps({"sf": 0.1, "canary_total_median": 5.2}) + "\n")
        fh.write(json.dumps({"sf": 0.01, "canary_total_median": 7.7}) + "\n")
        fh.write("not json\n")
    got = bench.canary_readings(str(tmp_path), 0.1)
    assert got == [
        ("BENCH_r08.json:tail", 4.911),
        ("BENCH_r09.json", 5.0),
        (".bench_history.jsonl", 5.2),
    ]


def test_readings_order_by_round_number_not_lexicographic(tmp_path):
    # r10 must sort AFTER r09 (lexicographic order would reverse them)
    _write(tmp_path / "BENCH_r09.json",
           {"sf": 0.1, "parsed": {"canary": {"total_median": 1.0}}})
    _write(tmp_path / "BENCH_r10.json",
           {"sf": 0.1, "parsed": {"canary": {"total_median": 2.0}}})
    got = bench.canary_readings(str(tmp_path), 0.1)
    assert [v for _, v in got] == [1.0, 2.0]


def test_readings_empty_dir(tmp_path):
    assert bench.canary_readings(str(tmp_path), 0.1) == []
