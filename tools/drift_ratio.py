"""Mechanical box-drift estimator over a pinned canary key set.

The cross-round bench trend line keeps getting confounded by the box
itself (r12's committed detail ran at loadavg 7.03; r13's idle
re-bracket read 1.07-1.11x vs earlier rounds with the inflation
uniform across keys whose code never changed). This tool separates
box drift from plan regressions without new measurement machinery:
the CANARY keys below are cheap, stable operators whose plans have
not changed since their first registration, so any round-over-round
movement in their timings is the box, not the code. The geometric
mean of their ratios is the drift factor; dividing a round's
common-key total by it yields the drift-adjusted trend.

Usage:
    python tools/drift_ratio.py OLD_BENCH_DETAIL.json [NEW_..json]
    python tools/drift_ratio.py --anchor [NEW_..json]

NEW defaults to the repo-root BENCH_DETAIL.json. Git refs work too:
    python tools/drift_ratio.py 9a923f8:BENCH_DETAIL.json

``--anchor`` uses the committed CANARY.json (tools/canary_bench.py's
idle-gated min-of-5 canary receipt) as OLD — an ABSOLUTE anchor, so
cross-round comparisons divide by a fixed denominator instead of
chaining through the previous round's possibly-dirty detail (r13
VERDICT item 5). The output then carries the anchor's commit so the
round log can cite it.
"""

from __future__ import annotations

import json
import math
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: cheap, plan-stable since their registration round; spread across
#: scan/agg/join/window/sort so no single subsystem dominates
CANARY = (
    "scan_project",
    "agg_hash",
    "join_inner_hash",
    "window_rank",
    "sort_limit_topk",
    "dedup_exact",
    "similarity_topk",
    "text_tokens",
)


def load(spec: str) -> dict:
    if ":" in spec and not os.path.exists(spec):
        out = subprocess.run(
            ["git", "show", spec], capture_output=True, text=True, cwd=REPO
        )
        if out.returncode != 0:
            raise SystemExit(f"git show {spec} failed: {out.stderr.strip()}")
        return json.loads(out.stdout)
    with open(spec) as f:
        return json.load(f)


def main() -> None:
    if not sys.argv[1:]:
        raise SystemExit(__doc__)
    if sys.argv[1] == "--anchor":
        old = load(os.path.join(REPO, "CANARY.json"))
    else:
        old = load(sys.argv[1])
    new = load(
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(REPO, "BENCH_DETAIL.json")
    )
    oq, nq = old["queries"], new["queries"]
    ratios = {}
    for k in CANARY:
        if k in oq and k in nq and oq[k] > 0:
            ratios[k] = nq[k] / oq[k]
    if not ratios:
        raise SystemExit("no canary keys common to both details")
    drift = math.exp(sum(math.log(r) for r in ratios.values()) / len(ratios))
    out = {
        "canary_drift": round(drift, 4),
        "canary_ratios": {k: round(v, 3) for k, v in ratios.items()},
        "loadavg_start": {
            "old": old.get("loadavg_start"),
            "new": new.get("loadavg_start"),
        },
    }
    # The common-key trend is meaningful only against a FULL old detail.
    # Under --anchor, old is CANARY.json whose queries are exactly the
    # canary set, so "common" would collapse to the canaries and
    # drift_adjusted_ratio would be ~1.0 by construction (r14 ADVICE) —
    # report only canary_drift + anchor_commit there; divide a real old
    # detail's common total by canary_drift separately.
    if "anchor_commit" in old:
        out["anchor_commit"] = old["anchor_commit"]
    else:
        common = sorted(set(oq) & set(nq))
        tot_old = sum(oq[k] for k in common)
        tot_new = sum(nq[k] for k in common)
        raw = tot_new / tot_old
        out["common_keys"] = len(common)
        out["raw_common_ratio"] = round(raw, 4)
        out["drift_adjusted_ratio"] = round(raw / drift, 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
