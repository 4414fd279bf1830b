"""Diagnose the in-session degradation of codegen-heavy keys.

Hypothesis (r15 opt round): the driver JVM's default 240 MB
ReservedCodeCacheSize fills during a long bench session (140+ distinct
queries x 2-3 passes, each generating fresh whole-stage-codegen
classes), after which the JIT flushes/declines compilation and the
biggest generated methods (polygon ray-cast, centroid banks, ppl
buckets) run interpreted -- 5-30x slower, while I/O- or
shuffle-bound keys barely notice.

Protocol: time the suspect keys cold (fresh session), run one full
headline pass, re-time the suspects, and dump `jcmd Compiler.codecache`
at each checkpoint.

Usage: python tools/diag_codecache.py [extra_java_opts]
"""
from __future__ import annotations

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SUSPECTS = [
    "join_point_in_polygon",
    "text_ppl_buckets",
    "dedup_embedding_ann_trained",
    "dedup_embedding_ann",
    "similarity_ann_imi",
]


def _own_jvm_pid() -> int:
    """The java child of THIS python process (not some other session's)."""
    me = os.getpid()
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/stat") as f:
                parts = f.read().split()
            with open(f"/proc/{pid}/comm") as f:
                comm = f.read().strip()
        except OSError:
            continue
        if comm == "java" and int(parts[3]) == me:
            return int(pid)
    raise RuntimeError("no child JVM found")


def codecache(tag: str) -> None:
    pid = _own_jvm_pid()
    out = subprocess.run(
        ["jcmd", str(pid), "Compiler.codecache"], capture_output=True, text=True
    )
    q = subprocess.run(
        ["jcmd", str(pid), "Compiler.queue"], capture_output=True, text=True
    )
    qlines = q.stdout.splitlines()
    print(
        f"--- codecache [{tag}] jvm={pid} compile_queue_lines={len(qlines)} ---\n"
        f"{out.stdout}{out.stderr}",
        flush=True,
    )


def main() -> None:
    extra = sys.argv[1] if len(sys.argv) > 1 else None
    from kafka_parquet_writer_spark import get_spark
    from kafka_parquet_writer_spark.registry import QUERIES, load_all_operators
    import bench

    load_all_operators()
    conf = {"spark.driver.extraJavaOptions": extra} if extra else None
    spark = get_spark("diag_codecache", extra_conf=conf)

    def run(name: str) -> float:
        spark.catalog.clearCache()
        t0 = time.time()
        QUERIES[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        spark.catalog.clearCache()
        return dt

    run("agg_hash")  # warm-up
    codecache("fresh")
    for s in SUSPECTS:
        print(f"COLD {s}: {run(s):.2f}s", flush=True)
    codecache("after-cold-suspects")

    t0 = time.time()
    for name in bench.HEADLINE:
        if name in SUSPECTS:
            continue
        try:
            dt = run(name)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {e}", flush=True)
            continue
        print(f"pass1 {name}: {dt:.2f}s", flush=True)
    print(f"one pass done in {time.time()-t0:.0f}s", flush=True)
    codecache("after-pass")

    for s in SUSPECTS:
        print(f"WARM-SESSION {s}: {run(s):.2f}s", flush=True)
    codecache("end")


if __name__ == "__main__":
    main()
