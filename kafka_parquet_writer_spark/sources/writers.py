"""Batch parquet writer with size-targeted output files.

The reference rotates files at ``maxFileSize`` bytes (default 1 GiB,
`KafkaProtoParquetWriter.java:465`, checked post-write at `:282-286` so
files may slightly overshoot). Spark has no byte-threshold trigger; the
faithful Spark-side approximation is ``maxRecordsPerFile`` with the
record count derived from a MEASURED bytes-per-row — a small sample is
encoded to parquet first, because at-rest size depends on encoding and
compression and cannot be derived from the logical schema. Same
philosophy as the reference's accuracy contract (its own test accepts
(0.9×, 1.01×) of the target, `KafkaProtoParquetWriterTest.java:181-187`);
the sampling estimate is looser but scale-free: one tiny extra job,
regardless of input size.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame

from kafka_parquet_writer_spark.streaming.maintenance import dir_parquet_bytes

#: reference maxFileSize default (KafkaProtoParquetWriter.java:465)
DEFAULT_TARGET_FILE_BYTES = 1 << 30
SAMPLE_ROWS = 10_000


def measure_row_bytes(
    df: DataFrame, sample_rows: int = SAMPLE_ROWS, compression: str = "snappy"
) -> float:
    """At-rest parquet bytes per row, measured by encoding a sample.

    Uses ``limit`` (first rows, no shuffle) — biased if early rows are
    atypical, which is the accepted tradeoff for not scanning the
    input twice."""
    d = tempfile.mkdtemp(prefix="kpws_rowprobe_")
    sample = df.limit(sample_rows)
    sample.write.mode("overwrite").option("compression", compression).parquet(d)
    n = sample.count()
    if n == 0:
        return 1.0
    return max(1.0, dir_parquet_bytes(d) / n)


def write_parquet_sized(
    df: DataFrame,
    path: str,
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
    partition_by: list[str] | None = None,
    compression: str = "snappy",
    row_bytes: float | None = None,
) -> int:
    """Write ``df`` as parquet with files of ≈``target_file_bytes``.

    Returns the ``maxRecordsPerFile`` used. Pass ``row_bytes`` to skip
    the sampling job when the caller already knows the encoding rate
    (e.g. from a previous run's metrics)."""
    if target_file_bytes <= 0:
        raise ValueError("target_file_bytes must be positive")
    if row_bytes is None:
        row_bytes = measure_row_bytes(df, compression=compression)
    max_records = max(1, int(target_file_bytes / row_bytes))
    writer = (
        df.write.mode("overwrite")
        .option("compression", compression)
        .option("maxRecordsPerFile", str(max_records))
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
    return max_records
