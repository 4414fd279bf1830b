"""Absolute canary anchor: time ONLY drift_ratio's 8 canary keys and
pin the result as CANARY.json.

r13's verdict showed why round-over-round drift chaining is fragile:
the box slowed ~33% r12→r13 on plan-stable canaries, so every
cross-round absolute total is meaningless without a divisor — and the
divisor itself was the PREVIOUS round's possibly-driver-dirty detail
(the driver overwrites BENCH_DETAIL.json at loadavg 4+). This tool
fixes the denominator: a canary-only receipt measured under an
enforced idle gate with more passes than the full bench can afford
(min-of-5 vs min-of-2), committed once as CANARY.json. Future rounds
run `python tools/drift_ratio.py --anchor` to get drift against the
FIXED anchor instead of the previous round.

Usage:
    python tools/canary_bench.py          # refuses if loadavg >= 1.0
    python tools/canary_bench.py --force  # measure anyway (flagged)

Re-pin (overwrite CANARY.json + commit) only when the anchor is
deliberately being moved — e.g. the fixture or a canary key's plan
changes; note the re-pin in the round log.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.drift_ratio import CANARY  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PASSES = 5
IDLE_GATE = 1.0


def main() -> None:
    force = "--force" in sys.argv[1:]
    load0 = os.getloadavg()[0]
    if load0 >= IDLE_GATE and not force:
        raise SystemExit(
            f"loadavg {load0:.2f} >= {IDLE_GATE} — an anchor measured on a "
            "contended box poisons every future drift division; wait for "
            "idle (loadavg decays ~5-7 min after a Spark JVM exits) or "
            "pass --force"
        )

    from kafka_parquet_writer_spark import get_spark
    from kafka_parquet_writer_spark.registry import (
        QUERIES,
        load_all_operators,
    )

    load_all_operators()
    spark = get_spark("canary_bench")

    def run(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    # same warm-up as bench.py: JVM/codegen/file listing + worker pool
    run(QUERIES["agg_hash"](spark, SF_DIR))

    timings: dict[str, float] = {}
    for _pass in range(PASSES):
        for name in CANARY:
            spark.catalog.clearCache()
            t0 = time.time()
            run(QUERIES[name](spark, SF_DIR))
            dt = time.time() - t0
            spark.catalog.clearCache()
            timings[name] = round(min(timings.get(name, dt), dt), 3)
            print(f"{name}: {dt:.3f}s (pass {_pass + 1})", file=sys.stderr)

    head = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"],
        capture_output=True,
        text=True,
        cwd=REPO,
    ).stdout.strip()
    out = {
        "queries": timings,
        "passes": PASSES,
        "sf": float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]),
        "loadavg_start": round(load0, 2),
        "loadavg_end": round(os.getloadavg()[0], 2),
        "forced": force,
        "anchor_commit": head,
    }
    path = os.path.join(REPO, "CANARY.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
