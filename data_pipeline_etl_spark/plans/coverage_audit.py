"""Regenerate the query table in COVERAGE.md from the registry and the
cross-round driver grading record (CORRECTNESS_r*.json).

Usage: ``python -m data_pipeline_etl_spark.plans.coverage_audit``
Rewrites the block between the BEGIN/END markers in COVERAGE.md in place,
so the inventory and its "last driver-graded" column can never drift from
the code. The rest of the file (tests-only rows, verification log) stays
hand-maintained.
"""

from __future__ import annotations

import os

from data_pipeline_etl_spark.registry import (
    ORACLES,
    QUERIES,
    QUERY_MODULES,
    _last_graded_round,
    load_all_operators,
)

BEGIN = "<!-- BEGIN query table (generated: python -m data_pipeline_etl_spark.plans.coverage_audit) -->"
END = "<!-- END query table -->"


def render_table() -> str:
    load_all_operators()
    last = _last_graded_round()
    lines = [
        f"**{len(QUERIES)} queries, {len(ORACLES)} with oracles.** "
        '"last graded" = newest CORRECTNESS_r*.json containing the query '
        "(r0 = never driver-graded).",
        "",
        "| queries() key | module | check | last graded |",
        "|---|---|---|---|",
    ]
    for name in sorted(QUERIES):
        check = "oracle" if name in ORACLES else "rows-only"
        lines.append(
            f"| {name} | {QUERY_MODULES[name]} | {check} | r{last.get(name, 0)} |"
        )
    return "\n".join(lines)


def main() -> None:
    root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    path = os.path.join(root, "COVERAGE.md")
    with open(path) as f:
        doc = f.read()
    pre, rest = doc.split(BEGIN, 1)
    _, post = rest.split(END, 1)
    with open(path, "w") as f:
        f.write(pre + BEGIN + "\n" + render_table() + "\n" + END + post)
    print(f"rewrote query table: {len(QUERIES)} queries")


if __name__ == "__main__":
    main()
