#!/usr/bin/env python
"""Round-start fixture check (CLAUDE.md): the driver may regenerate
/root/testdata between rounds with identical row counts but different
physical types (r4: events.ts NANOS->MICROS; r5: o_orderdate/l_shipdate
ms->us). This script diffs every table's arrow schema at every scale
factor against the committed snapshot and exits non-zero on ANY change,
printing what moved. On an intentional re-baseline run with --update
after verifying parity.

    python scripts/round_start_check.py [--update]
"""

from __future__ import annotations

import json
import os
import sys

import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SNAP = os.path.join(REPO, "scripts", "fixtures_schema.json")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()
SFS = ["sf0.001", "sf0.01", "sf0.1"]


def current() -> dict:
    out = {}
    for sf in SFS:
        for t in TABLES:
            path = f"/root/testdata/{sf}/{t}.parquet"
            pf = pq.ParquetFile(path)
            s = pf.schema_arrow
            out[f"{sf}/{t}"] = {
                "fields": [f"{f.name}:{f.type}" for f in s],
                "rows": pf.metadata.num_rows,
            }
    return out


def main() -> int:
    cur = current()
    if "--update" in sys.argv or not os.path.exists(SNAP):
        with open(SNAP, "w") as f:
            json.dump(cur, f, indent=1, sort_keys=True)
        print(f"snapshot written: {SNAP} ({len(cur)} table/sf entries)")
        return 0
    with open(SNAP) as f:
        ref = json.load(f)
    diffs = []
    for k in sorted(set(ref) | set(cur)):
        if ref.get(k) != cur.get(k):
            diffs.append((k, ref.get(k), cur.get(k)))
    if not diffs:
        print(f"fixtures unchanged ({len(cur)} table/sf entries match snapshot)")
        return 0
    for k, a, b in diffs:
        print(f"CHANGED {k}:")
        print(f"  snapshot: {a}")
        print(f"  current : {b}")
    print(
        f"\n{len(diffs)} entries changed — re-verify parity "
        "(pytest tests/test_parity.py -k q_stream_tumbling) then re-baseline "
        "with --update."
    )
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
