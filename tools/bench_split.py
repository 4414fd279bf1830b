"""Per-key build/execute split timing.

For each key: time the QUERIES[k](spark, sf_dir) call (driver-side plan
construction, including any eager index/ensure work) separately from
the noop-sink execution, min over N passes each. Interleaved passes,
clearCache bracket, same warm-up as bench.py.

Usage: python tools/bench_split.py out.json [key ...]
Env: SPLIT_PASSES (default 3), SPARK_GRAFT_SF_DIR.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    out_path = sys.argv[1]
    keys = sys.argv[2:]
    from kafka_parquet_writer_spark import get_spark
    from kafka_parquet_writer_spark.registry import QUERIES, load_all_operators

    load_all_operators()
    spark = get_spark("bench_split")

    def run(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    run(QUERIES["agg_hash"](spark, SF_DIR))
    run(QUERIES["udf_scalar"](spark, SF_DIR))

    n_passes = int(os.environ.get("SPLIT_PASSES", "3"))
    build: dict[str, float] = {}
    execu: dict[str, float] = {}
    for _pass in range(n_passes):
        for name in keys:
            spark.catalog.clearCache()
            t0 = time.time()
            df = QUERIES[name](spark, SF_DIR)
            t1 = time.time()
            run(df)
            t2 = time.time()
            spark.catalog.clearCache()
            build[name] = round(min(build.get(name, 9e9), t1 - t0), 3)
            execu[name] = round(min(execu.get(name, 9e9), t2 - t1), 3)
            print(
                f"{name}: build={t1 - t0:.3f}s exec={t2 - t1:.3f}s "
                f"(pass {_pass + 1})",
                file=sys.stderr,
            )
    result = {
        "build": build,
        "exec": execu,
        "total": {k: round(build[k] + execu[k], 3) for k in build},
        "loadavg_start": round(os.getloadavg()[0], 2),
        "passes": n_passes,
    }
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1, sort_keys=True)
        f.write("\n")
    print(json.dumps({k: result["total"][k] for k in build}))


if __name__ == "__main__":
    main()
