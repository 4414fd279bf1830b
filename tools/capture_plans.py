"""Capture .explain('formatted') for every declared batch query.

Writes plans/<tag>/<key>_<suffix>.txt for each key plus a structural
summary JSON (exchange count, join strategies, Python-eval nodes,
scan count) to plans/<tag>/_summary_<suffix>.json — the optimization
round's before/after evidence (guide §1: measure first, capture plan
shape per operator).

Usage:
    python tools/capture_plans.py <tag> <suffix> [key ...]

e.g. `python tools/capture_plans.py r15 before` captures every batch
key; name keys explicitly to refresh a subset after a change.

Streaming keys are skipped by default (their returned frames are
bounded batch twins only when executed through the bench harness;
`formatted_plan` still works for most, so pass them explicitly if
needed).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def summarize(plan: str) -> dict:
    lines = plan.splitlines()
    node_re = re.compile(r"^\s*\(\d+\)\s+(\S+)")
    nodes: list[str] = []
    for ln in lines:
        m = node_re.match(ln)
        if m:
            nodes.append(m.group(1))
    return {
        "exchanges": sum(
            1 for n in nodes if n == "Exchange" or n.startswith("Exchange")
        ),
        "broadcast_exchanges": sum(
            1 for n in nodes if n.startswith("BroadcastExchange")
        ),
        "joins": sorted(
            {n for n in nodes if "Join" in n}
        ),
        "python_eval": sorted(
            {
                n
                for n in nodes
                if n
                in (
                    "BatchEvalPython",
                    "ArrowEvalPython",
                    "MapInPandas",
                    "MapInArrow",
                    "FlatMapGroupsInPandas",
                    "AggregateInPandas",
                    "FlatMapGroupsInPandasWithState",
                )
                or "Python" in n
                or "Pandas" in n
                or "Arrow" in n
            }
        ),
        "scans": sum(1 for n in nodes if n.startswith("Scan")),
        "sorts": sum(1 for n in nodes if n == "Sort"),
        "window_nodes": sum(1 for n in nodes if n.startswith("Window")),
        "n_nodes": len(nodes),
    }


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r15"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    explicit = sys.argv[3:]

    from kafka_parquet_writer_spark import get_spark
    from kafka_parquet_writer_spark.plans.inspect import formatted_plan
    from kafka_parquet_writer_spark.registry import QUERIES, load_all_operators

    load_all_operators()
    spark = get_spark("capture_plans")

    keys = explicit or [
        k for k in sorted(QUERIES) if not k.startswith("stream_")
    ]
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        tag,
    )
    os.makedirs(outdir, exist_ok=True)

    summary: dict[str, dict] = {}
    for key in keys:
        t0 = time.time()
        try:
            df = QUERIES[key](spark, SF_DIR)
            plan = formatted_plan(df)
        except Exception as e:  # noqa: BLE001 — audit must cover all keys
            summary[key] = {"error": str(e)[:300]}
            print(f"{key}: ERROR {e}", file=sys.stderr)
            continue
        finally:
            spark.catalog.clearCache()
        with open(os.path.join(outdir, f"{key}_{suffix}.txt"), "w") as f:
            f.write(plan)
        summary[key] = summarize(plan)
        summary[key]["build_s"] = round(time.time() - t0, 2)
        print(f"{key}: {summary[key]}", file=sys.stderr)

    spath = os.path.join(outdir, f"_summary_{suffix}.json")
    # merge with an existing summary so subset refreshes don't drop keys
    if os.path.exists(spath):
        with open(spath) as f:
            prev = json.load(f)
        prev.update(summary)
        summary = prev
    with open(spath, "w") as f:
        json.dump(summary, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {len(keys)} plans to {outdir}")


if __name__ == "__main__":
    main()
