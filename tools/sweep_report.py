#!/usr/bin/env python3
"""Render a sweep JSONL (tools/sf_sweep.py output) into the round's markdown
artifact table. Re-run records supersede earlier ones for the same name (the
sweep appends; retries and post-fix re-measurements land later in the file).

Usage: python tools/sweep_report.py in.jsonl [top_n]   (prints markdown)
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    path = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    recs: dict[str, dict] = {}
    for line in open(path):
        r = json.loads(line)
        recs[r["name"]] = r  # later records supersede
    rows = sorted(recs.values(), key=lambda r: -(r.get("spark_s") or 0))
    n_pass = sum(1 for r in rows if r["status"] == "PASS")
    print(f"**{n_pass}/{len(rows)} PASS.**\n")
    print("| entry | status | mode | spark s | duckdb s | rows |")
    print("|---|---|---|---|---|---|")
    for r in rows[:top_n]:
        print(
            f"| {r['name']} | {r['status']} | {r.get('mode', 'full')} "
            f"| {r.get('spark_s', '')} | {r.get('duck_s', '')} "
            f"| {r.get('rows', '')} |"
        )
    rest = rows[top_n:]
    if rest:
        fails = [r["name"] for r in rest if r["status"] != "PASS"]
        print(
            f"\n(+{len(rest)} more entries, all "
            f"{'PASS' if not fails else 'except ' + ', '.join(fails)}, "
            f"max spark {max((r.get('spark_s') or 0) for r in rest)} s)"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
