"""A/B a session-config variant over a subset of headline keys.

Same methodology as bench.py (noop sink, clearCache around each run,
min over 2 interleaved passes, bench warm-up trio) but over a named
key subset and with optional extra session confs — the cheap way to
measure a config candidate before paying a full bench run.

Usage:
    python tools/bench_subset.py out.json [conf=k=v ...] [key ...]

Keys default to TOP (the expensive half of the headline). Conf args
look like `conf=spark.sql.join.preferSortMergeJoin=false`.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

TOP = [
    "dedup_ngram_jaccard",
    "pipeline_clean_corpus",
    "dedup_containment",
    "rag_topk_retrieval_bmw",
    "rag_topk_retrieval_wand_multi",
    "dedup_span_variable",
    "dedup_span_exact",
    "pipeline_train_corpus",
    "similarity_ivf_pq",
    "similarity_rerank_mmr",
    "table_zorder_compact",
    "ann_index_delta",
    "ann_index_build",
    "dedup_embedding_ann_trained",
    "rag_bmw_from_index",
    "dedup_embedding",
    "text_line_dedup",
    "dedup_minhash_lsh",
    "text_ppl_buckets",
    "join_point_in_polygon",
    "text_bpe_vocab",
    "dedup_embedding_ann",
    "agg_theta_sketch",
    "text_ngram_novelty",
    "similarity_ann_imi",
    "rag_index_build",
    "rag_bm25_from_index",
    "tpch_q5",
    "join_salted_skew",
    "window_rank",
]


def main() -> None:
    out_path = sys.argv[1]
    extra: dict[str, str] = {}
    keys: list[str] = []
    for a in sys.argv[2:]:
        if a.startswith("conf="):
            k, v = a[5:].split("=", 1)
            extra[k] = v
        else:
            keys.append(a)
    keys = keys or TOP

    from kafka_parquet_writer_spark import get_spark
    from kafka_parquet_writer_spark.registry import QUERIES, load_all_operators

    load_all_operators()
    load0 = os.getloadavg()[0]
    n_passes = int(os.environ.get("SUBSET_PASSES", "2"))

    def cpu_stat() -> list[int]:
        with open("/proc/stat") as f:
            return [int(x) for x in f.readline().split()[1:]]

    stat0 = cpu_stat()
    spark = get_spark("bench_subset", extra_conf=extra or None)

    def run(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    run(QUERIES["agg_hash"](spark, SF_DIR))
    run(QUERIES["udf_scalar"](spark, SF_DIR))

    timings: dict[str, float] = {}
    for _pass in range(n_passes):
        for name in keys:
            spark.catalog.clearCache()
            t0 = time.time()
            run(QUERIES[name](spark, SF_DIR))
            dt = time.time() - t0
            spark.catalog.clearCache()
            timings[name] = round(min(timings.get(name, dt), dt), 3)
            print(f"{name}: {dt:.3f}s (pass {_pass + 1})", file=sys.stderr)

    stat1 = cpu_stat()
    d = [y - x for x, y in zip(stat0, stat1)]
    tot = sum(d) or 1
    result = {
        "value": round(sum(timings.values()), 3),
        "queries": timings,
        "extra_conf": extra,
        "loadavg_start": round(load0, 2),
        "passes": n_passes,
        # whole-run /proc/stat deltas: steal_pct > ~2 or an unexpected
        # user_pct (another tenant/process) flags a poisoned session
        "steal_pct": round(100 * d[7] / tot, 2),
        "idle_pct": round(100 * d[3] / tot, 2),
    }
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1, sort_keys=True)
        f.write("\n")
    print(json.dumps({"value": result["value"], "n": len(timings)}))


if __name__ == "__main__":
    main()
