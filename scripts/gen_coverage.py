#!/usr/bin/env python
"""Regenerate COVERAGE.md from the query registry.

The SURVEY §2 table maps every operator id (S/P/J/A/W/O/D/F/U rows) to the
registry queries tagged with it; ids covered by source-layer code rather
than oracle queries (S1-S7) keep hand-written rows. The extensions table
groups every non-§2 tag. Run from the repo root:

    python scripts/gen_coverage.py > COVERAGE.md
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

from flu_data_pipeline_spark.plans import REGISTRY  # noqa: E402

FAMILY = {
    "S": "Scans / sources / sinks",
    "P": "Projection / filter",
    "J": "Joins",
    "A": "Aggregations",
    "W": "Windows",
    "O": "Sorts / limits / top-k",
    "D": "Set ops / dedup",
    "F": "Scalar functions",
    "U": "UDF surface (natively re-expressed)",
}

# ids implemented in the source/sink layer (code + runtime tests), not as
# registry queries — rows maintained here
HAND_ROWS = {
    "S1": "sources/readers.py fetch_to_landing+read_csv (tests/test_sources.py)",
    "S2": "sources/readers.py read_csv (tests/test_sources.py)",
    "S3": "sources/readers.py read_json_records / read_json_files (tests/test_sources.py)",
    "S4": "sources/writers.py write_csv (tests/test_sources.py)",
    "S5": "sources/writers.py write_table (partitioned parquet; tests/test_sources.py)",
    "S6": "sources/writers.py idempotent_append; streaming/ingest.py streaming_idempotent_sink (tests/test_sources.py, tests/test_streaming.py)",
    "S7": "schemas.py StructType registry + sources/writers.py validate_primary_key/validate_foreign_key (tests/test_sources.py)",
}

SURVEY_IDS = [
    *[f"S{i}" for i in range(1, 10)],
    *[f"P{i}" for i in range(1, 8)],
    *[f"J{i}" for i in range(1, 8)],
    *[f"A{i}" for i in range(1, 13)],
    "W1",
    *[f"O{i}" for i in range(1, 8)],
    *[f"D{i}" for i in range(1, 4)],
    *[f"F{i}" for i in range(1, 16)],
    *[f"U{i}" for i in range(1, 5)],
]
_ID_RE = re.compile(r"^[SPJAWODFU]\d+$")

TRAILER = """
Streaming runtime (tested, not oracle-queries): windowed rollup,
session windows, stream-stream interval join, applyInPandasWithState
running stats, dropDuplicatesWithinWatermark dedup, stream-static
broadcast enrichment, idempotent foreachBatch sink — `streaming/ingest.py`,
`tests/test_streaming.py`. Multimodal plumbing: blob+meta shape,
mapInPandas decode, constant-size resize, overlapping audio chunking,
1→N frame sampling — `multimodal/binary_ops.py`,
`tests/test_multimodal.py`. Property-based operator checks vs pandas
merge_asof / union-find / from-scratch minhash —
`tests/test_operators_property.py`. Bucketed co-located join (zero
Exchange) — `tests/test_sources.py`.
"""


def main() -> None:
    by_id: dict[str, list[str]] = {}
    by_ext: dict[str, list[str]] = {}
    for name, qd in REGISTRY.items():
        for tag in qd.tags:
            (by_id if _ID_RE.match(tag) else by_ext).setdefault(tag, []).append(name)

    out = [
        "# COVERAGE — SURVEY.md §2 operator inventory → implementation",
        "",
        "Generated from the query registry (`python scripts/gen_coverage.py >",
        "COVERAGE.md`): every §2 operator id maps to the oracle-checked",
        "queries tagged with it (see `plans/*.py`) or, for the source/sink",
        "layer, to code + runtime tests.",
        "",
        "| id | family | implementation |",
        "|---|---|---|",
    ]
    for oid in SURVEY_IDS:
        family = FAMILY[oid[0]]
        if oid in HAND_ROWS and oid not in by_id:
            impl = HAND_ROWS[oid]
        else:
            names = sorted(set(by_id.get(oid, [])))
            impl = ", ".join(f"`{n}`" for n in names) if names else "—"
        out.append(f"| {oid} | {family} | {impl} |")

    out += [
        "",
        "## Extensions beyond the reference (BASELINE.json mandate)",
        "",
        "| family | queries |",
        "|---|---|",
    ]
    for tag in sorted(by_ext):
        names = ", ".join(f"`{n}`" for n in sorted(set(by_ext[tag])))
        out.append(f"| {tag} | {names} |")

    print("\n".join(out) + "\n" + TRAILER.rstrip() + "\n", end="")


if __name__ == "__main__":
    main()
