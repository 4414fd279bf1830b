"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric", "value", "unit", "queries", "sf"}.

Execution is forced with the noop sink (full plan runs, nothing
materializes on the driver) — the honest way to time a distributed
plan. Each query timed once after a session warm-up query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: headline set: one per operator family, weighted toward the ones that
#: stress shuffle/join/window machinery at scale
HEADLINE = [
    "scan_project",
    "filter_pred",
    "agg_hash",
    "agg_distinct",
    "grouping_sets",
    "join_inner_hash",
    "join_multiway",
    "join_asof",
    "tpch_q3",
    "window_rank",
    "window_frame",
    "window_range_frame",
    "sort_limit_topk",
    "scalar_json",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "similarity_topk",
    "similarity_ann_lsh",
    "similarity_ivf",
    "agg_salted_skew",
    "join_salted_skew",
    "text_tokens",
    "text_quality",
    "udaf_grouped",
    "etl_rotation_binning",
    "pipeline_clean_corpus",
]


def main() -> None:
    from kafka_parquet_writer_spark import get_spark
    from kafka_parquet_writer_spark.registry import QUERIES, load_all_operators

    load_all_operators()
    spark = get_spark("bench")

    def run(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    # warm up JVM/codegen/file-listing paths AND the Python worker pool
    # (first pandas-UDF query otherwise pays worker fork cost; the
    # grouped warm-up forks one worker per core, which scalar UDFs on a
    # few scan partitions would not)
    run(QUERIES["agg_hash"](spark, SF_DIR))
    run(QUERIES["udf_scalar"](spark, SF_DIR))
    import pandas as _pd
    from pyspark.sql import functions as F

    run(
        spark.range(10_000)
        .withColumn("k", F.col("id") % 64)
        .repartition(64, "k")
        .groupBy("k")
        .applyInPandas(
            lambda pdf: _pd.DataFrame({"k": [pdf["k"].iloc[0]]}), "k long"
        )
    )

    # Each query is timed independently: best of two runs (steady-state
    # cost, robust to CI-machine noise), and any cache a query builds
    # internally is dropped afterwards so queries don't interfere.
    timings: dict[str, float] = {}
    for name in HEADLINE:
        best = float("inf")
        for _ in range(2):
            spark.catalog.clearCache()
            t0 = time.time()
            run(QUERIES[name](spark, SF_DIR))
            best = min(best, time.time() - t0)
        spark.catalog.clearCache()
        timings[name] = round(best, 3)
        print(f"{name}: {timings[name]:.3f}s", file=sys.stderr)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    result = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
