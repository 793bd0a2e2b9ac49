"""Static gate: every multi-consumer ``owned_persist`` site must eagerly
materialize its frame before the consumer branches run.

Round-5 lesson (NOTES.md, commit 00630dd): a persisted frame whose plan has
no exchange and 2+ independent consumer branches gets recomputed once per
branch when AQE launches them concurrently before the cache populates
(losers' blocks are discarded) — measured 12-30x on the shingle family.
The fix is a one-line ``frame.count()`` right after the persist.

This test scans package sources for ``<var> = owned_persist(...)``
assignments and requires ``<var>.count()`` within the next few statements,
unless the site is on the explicit allowlist below (single-consumer frames,
or frames populated by an immediate driver-side ``.collect()``).
"""

from __future__ import annotations

import re
from pathlib import Path

PKG = Path(__file__).resolve().parent.parent / "hadoop_3_0_0_beta1_gaia_spark"

# (relative path, variable name) -> justification for NOT needing an eager
# count. Add entries ONLY with a reason; the default is count().
ALLOWLIST: dict[tuple[str, str], str] = {
    ("plans/dedup_sim.py", "fresh"): (
        "single consumer (one .agg over fresh) — populated on first use, "
        "no concurrent branches to race"
    ),
    ("operators/sort.py", "part"): (
        "populated by the immediate driver-side groupBy().collect() offset "
        "pass before the second consumer runs"
    ),
    ("functions/similarity.py", "base"): (
        "populated by the immediate driver-side bucket-stats .collect() "
        "(the num_blocks derivation) before the cells consumer runs — no "
        "concurrent branches to race"
    ),
}

_ASSIGN = re.compile(r"^(\s*)(\w+)\s*=\s*owned_persist\(")


def _sites():
    for path in sorted(PKG.rglob("*.py")):
        lines = path.read_text().splitlines()
        for i, line in enumerate(lines):
            m = _ASSIGN.match(line)
            if not m:
                continue
            yield path, i, m.group(2), lines


def test_every_owned_persist_is_eagerly_materialized_or_allowlisted():
    problems = []
    for path, i, var, lines in _sites():
        rel = str(path.relative_to(PKG))
        if (rel, var) in ALLOWLIST:
            continue
        # Look ahead up to 12 lines past the (possibly multi-line) call for
        # an eager `<var>.count()` statement.
        window = "\n".join(lines[i : i + 14])
        if re.search(rf"\b{re.escape(var)}\.count\(\)", window):
            continue
        problems.append(f"{rel}:{i + 1} — {var} = owned_persist(...) has no "
                        f"eager {var}.count() within 13 lines and is not "
                        "allowlisted")
    assert not problems, (
        "multi-consumer owned_persist sites without eager materialization "
        "(round-5 AQE cache-race lesson — add <var>.count() or allowlist "
        "with a reason):\n" + "\n".join(problems)
    )


def test_allowlist_entries_still_exist():
    live = {(str(p.relative_to(PKG)), v) for p, _, v, _ in _sites()}
    stale = [k for k in ALLOWLIST if k not in live]
    assert not stale, f"stale allowlist entries (site removed/renamed): {stale}"
