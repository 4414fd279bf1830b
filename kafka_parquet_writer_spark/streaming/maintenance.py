"""Table maintenance: small-file compaction for parquet directories.

A continuously-ingesting pipeline (streaming/ingest.py, mirroring the
reference's rolling writer) inevitably produces files far below the
1 GiB design target (`KafkaProtoParquetWriter.java:465`) whenever a
time-based rotation fires on a trickle (`:296-302`). At 100 TB, small
files are the top operational killer: NameNode/object-store metadata
pressure, per-file task overhead, broken scan vectorization. The
reference has no compactor — files are final once renamed (`:356-380`).
This job is the missing half of its rotation story.

Strategy: size the output file count from actual input bytes
(Σ file sizes / target), then rewrite with that many tasks.
``repartition(n)`` (round-robin) gives uniformly-sized outputs;
per-partition-value compaction preserves Hive partitioning by
compacting within each partition directory independently.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import SparkSession

#: the reference's maxFileSize default (KafkaProtoParquetWriter.java:465)
DEFAULT_TARGET_FILE_BYTES = 1 << 30


def dir_parquet_bytes(path: str) -> int:
    """Total bytes of parquet data files under ``path`` (recursive,
    skipping hidden/metadata entries)."""
    total = 0
    for root, dirs, files in os.walk(path):
        dirs[:] = [d for d in dirs if not d.startswith((".", "_"))]
        for f in files:
            if f.endswith(".parquet") and not f.startswith((".", "_")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def plan_output_files(total_bytes: int, target_file_bytes: int) -> int:
    """ceil(total/target), minimum 1 — the task count for the rewrite."""
    if target_file_bytes <= 0:
        raise ValueError("target_file_bytes must be positive")
    return max(1, math.ceil(total_bytes / target_file_bytes))


def compact_parquet_dir(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
    partition_by: list[str] | None = None,
    compression: str = "snappy",
) -> int:
    """Rewrite ``src_dir`` into ``dst_dir`` with ≈target-sized files.

    Returns the number of output files planned. With ``partition_by``
    the data is repartitioned on the partition columns first so each
    Hive partition is written by as few tasks as possible (one file per
    partition per task); without it, round-robin repartition yields
    uniformly sized files. Compaction is a full rewrite into a NEW
    directory — the atomic-swap (rename dst over src) is left to the
    caller's orchestration, mirroring the invisible-until-committed
    rule the reference enforces via tmp+rename
    (KafkaProtoParquetWriter.java:236-241,313-346).
    """
    total = dir_parquet_bytes(src_dir)
    # parquet re-encodes (dictionary/RLE) — planned count is based on
    # at-rest bytes, which is the stable estimator across rewrites
    n_files = plan_output_files(total, target_file_bytes)
    df = spark.read.parquet(src_dir)
    writer_df = (
        df.repartition(*partition_by) if partition_by else df.repartition(n_files)
    )
    writer = writer_df.write.mode("overwrite").option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(dst_dir)
    return n_files


def upsert_parquet(
    spark: SparkSession,
    existing_dir: str | None,
    updates,
    keys: list[str],
    dst_dir: str,
    order_col: str | None = None,
    compression: str = "snappy",
) -> None:
    """Merge-by-key refresh (the CDC/refeed pattern): rows from
    ``updates`` replace same-key rows in ``existing_dir``; the result is
    written to ``dst_dir`` (a NEW directory — same invisible-until-
    swapped discipline as compaction).

    Winner per key: the updates side; within a side, the greatest
    ``order_col`` if given (e.g. an event timestamp), else an arbitrary
    single row (documented nondeterminism, same as dropDuplicates).
    Shape: one shuffle on the key, window row_number streams per group —
    no collect, no broadcast of either side, so both sides scale.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    upd = updates.withColumn("_src", F.lit(1))
    if existing_dir is not None:
        old = spark.read.parquet(existing_dir).withColumn("_src", F.lit(0))
        merged = upd.unionByName(old)
    else:
        merged = upd
    order = [F.col("_src").desc()]
    if order_col is not None:
        order.append(F.col(order_col).desc())
    w = Window.partitionBy(*keys).orderBy(*order)
    result = (
        merged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_src")
    )
    result.write.mode("overwrite").option("compression", compression).parquet(
        dst_dir
    )
