"""Per-batch duration breakdown for streaming keys.

Monkeypatches _run_to_memory / _run_to_memory_traced to capture the
finished query's recentProgress, then invokes each named key once
(warm session) and prints per-batch durationMs components
(triggerExecution, queryPlanning, addBatch, walCommit,
commitOffsets, getBatch) plus batch count.

Usage: python tools/diag_stream_batches.py key [key ...]
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    keys = sys.argv[1:]
    from kafka_parquet_writer_spark import get_spark
    from kafka_parquet_writer_spark.registry import QUERIES, load_all_operators
    import kafka_parquet_writer_spark.operators.streaming_queries as SQ

    load_all_operators()
    spark = get_spark("diag_stream_batches")

    captured: list = []

    def wrap(orig, traced):
        def runner(stream_df, mode):
            import tempfile

            name = f"kpws_diag_{next(SQ._counter)}"
            ckpt = tempfile.mkdtemp(prefix="kpws_ckpt_")
            sp = stream_df.sparkSession
            prev = sp.conf.get("spark.sql.shuffle.partitions")
            sp.conf.set(
                "spark.sql.shuffle.partitions",
                str(SQ.STREAM_STATE_PARTITIONS),
            )
            try:
                q = (
                    stream_df.writeStream.outputMode(mode)
                    .format("memory")
                    .queryName(name)
                    .option("checkpointLocation", ckpt)
                    .trigger(availableNow=True)
                    .start()
                )
                q.awaitTermination()
            finally:
                sp.conf.set("spark.sql.shuffle.partitions", prev)
            captured.append([json.loads(p.json) for p in q.recentProgress])
            tbl = sp.table(name)
            if traced:
                info = {
                    "plan": q._jsq.explainInternal(True),
                    "state_operators": (q.lastProgress or {}).get(
                        "stateOperators", []
                    ),
                }
                return tbl, info
            return tbl

        return runner

    orig_plain = SQ._run_to_memory
    orig_traced = SQ._run_to_memory_traced
    SQ._run_to_memory = wrap(orig_plain, traced=False)
    SQ._run_to_memory_traced = wrap(orig_traced, traced=True)

    import time

    for k in keys:
        captured.clear()
        t0 = time.monotonic()
        df = QUERIES[k](spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        wall = time.monotonic() - t0
        print(f"\n=== {k}  wall={wall:.2f}s  streams={len(captured)}")
        for si, progs in enumerate(captured):
            rows = []
            for p in progs:
                d = p.get("durationMs", {})
                rows.append(
                    (
                        p.get("batchId"),
                        d.get("triggerExecution"),
                        d.get("queryPlanning"),
                        d.get("addBatch"),
                        d.get("walCommit"),
                        d.get("commitOffsets"),
                        d.get("getBatch"),
                        p.get("numInputRows"),
                    )
                )
            print(
                f"  stream {si}: {len(progs)} batches "
                "(batchId, trigger, plan, addBatch, wal, commit, getBatch, rows)"
            )
            for r in rows:
                print(f"    {r}")


if __name__ == "__main__":
    main()
