"""Bucketed table layout + shuffle-free sort-merge-bucket (SMB) joins.

The reference writes plain date directories with no table metadata
(`KafkaProtoParquetWriter.java:362-380`); recurring downstream joins on
the same key then re-shuffle both fact tables on every run. Bucketing
is the Spark-native fix this engine adds: pay the shuffle ONCE at write
time (`bucketBy` hashes rows into a fixed number of bucket files per
partition, `sortBy` pre-sorts within each bucket), and every subsequent
equi-join or aggregation on the bucket key plans with ZERO exchanges —
Catalyst sees `HashPartitioning(bucket_cols, n)` as the table's output
partitioning and elides both the shuffle and (with sortBy) the sort.

100 TB shape: for a daily fact⋈fact join (e.g. orders⋈lineitem on
orderkey), bucketing turns an every-run 2×full-shuffle into a one-time
write cost. Bucket count is a capacity decision: target ≤ a few hundred
MB per bucket file so a single task streams one bucket pair;
`suggest_bucket_count` derives it from measured at-rest bytes the same
way the batch writer calibrates file sizes. Both sides MUST agree on
the bucket count (Spark only elides the shuffle when the partitionings
match; a 4-bucket ⋈ 8-bucket join re-shuffles the 4-bucket side) —
`smb_join` enforces compatibility loudly instead of silently planning
a shuffle.

Requires a metastore-backed table (`saveAsTable`): bucketing metadata
lives in the catalog, not in parquet footers — `spark.read.parquet` on
the same files would forget the layout. The session helper pins a
per-pid /tmp warehouse (session.py) so tests are hermetic.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession

from kafka_parquet_writer_spark.sources.writers import measure_row_bytes

#: ≲256 MB per bucket file keeps one bucket pair comfortably in a task
DEFAULT_TARGET_BUCKET_BYTES = 256 << 20


def suggest_bucket_count(
    df: DataFrame,
    target_bucket_bytes: int = DEFAULT_TARGET_BUCKET_BYTES,
    sample_rows: int = 10_000,
) -> int:
    """Bucket count sized so each bucket's at-rest bytes ≈ target.

    Measures real encoded bytes-per-row on a sample (compression-aware,
    like the file-size calibration in writers.py), scales by the row
    count, rounds up to a power of two — power-of-two counts let a
    future 2× re-bucketing split buckets locally instead of full
    re-shuffling, and make count-compatibility between tables likely.
    """
    bpr = measure_row_bytes(df, sample_rows=sample_rows)
    total = bpr * df.count()
    raw = max(1, math.ceil(total / target_bucket_bytes))
    return 1 << max(0, (raw - 1).bit_length())


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str] | str,
    n_buckets: int,
    sort_cols: list[str] | str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) table.

    ``sort_cols`` defaults to the bucket columns — pre-sorted buckets
    let SMB joins skip the per-task sort too, leaving a pure merge.
    """
    bucket_cols = [bucket_cols] if isinstance(bucket_cols, str) else bucket_cols
    if sort_cols is None:
        sort_cols = bucket_cols
    sort_cols = [sort_cols] if isinstance(sort_cols, str) else sort_cols
    if n_buckets < 1:
        raise ValueError(f"write_bucketed: n_buckets must be >= 1, got {n_buckets}")
    (
        df.write.bucketBy(n_buckets, *bucket_cols)
        .sortBy(*sort_cols)
        .mode(mode)
        .saveAsTable(table)
    )


def bucket_spec(spark: SparkSession, table: str) -> tuple[list[str], int] | None:
    """(bucket columns, bucket count) for a catalog table, or None if
    the table is unbucketed. Read from DESCRIBE EXTENDED — the same
    metadata Catalyst consults when planning the join."""
    rows = spark.sql(f"DESCRIBE EXTENDED {table}").collect()
    info = {r["col_name"]: r["data_type"] for r in rows}
    if "Num Buckets" not in info:
        return None
    n = int(info["Num Buckets"])
    # rendered as: [`col_a`, `col_b`]
    cols = [
        c.strip(" `") for c in info["Bucket Columns"].strip("[]").split(",")
    ]
    return cols, n


def smb_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    left_on: list[str] | str,
    right_on: list[str] | str,
    how: str = "inner",
) -> DataFrame:
    """Join two bucketed tables on their bucket keys, shuffle-free.

    Refuses (raises ValueError) when the layouts cannot co-locate:
    either side unbucketed, bucketed on different columns than the join
    keys, or mismatched bucket counts. The caller then knows to
    re-bucket ONCE rather than silently paying a shuffle on every run.
    Disables auto-broadcast for this plan so Catalyst actually picks
    the sort-merge-bucket strategy even for small test tables (at
    production scale both sides exceed the broadcast threshold anyway).
    """
    left_on = [left_on] if isinstance(left_on, str) else left_on
    right_on = [right_on] if isinstance(right_on, str) else right_on

    specs = {}
    for side, table, keys in (
        ("left", left_table, left_on),
        ("right", right_table, right_on),
    ):
        spec = bucket_spec(spark, table)
        if spec is None:
            raise ValueError(f"smb_join: {side} table {table!r} is not bucketed")
        cols, n = spec
        if cols != keys:
            raise ValueError(
                f"smb_join: {side} table {table!r} is bucketed on {cols}, "
                f"join keys are {keys} — co-location requires they match"
            )
        specs[side] = n
    if specs["left"] != specs["right"]:
        raise ValueError(
            f"smb_join: bucket counts differ ({left_table!r}={specs['left']}, "
            f"{right_table!r}={specs['right']}) — Spark would re-shuffle one "
            f"side; re-bucket to a common count once instead"
        )

    l, r = spark.table(left_table), spark.table(right_table)
    cond = None
    for lk, rk in zip(left_on, right_on):
        c = l[lk] == r[rk]
        cond = c if cond is None else cond & c
    return l.hint("merge").join(r, cond, how)
