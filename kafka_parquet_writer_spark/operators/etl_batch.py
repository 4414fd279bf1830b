"""Reference-faithful ETL semantics, formulated as batch queries so the
DuckDB oracle can check them (SURVEY.md §2B "reference-faithful batch
formulations").

- ``etl_partition_layout`` mirrors inventory #6
  (`KafkaProtoParquetWriter.java:362-380`): the yyyy/MM/dd directory
  layout, derived here from event time (the reference uses finalize
  wall-clock, `:367` — event time is the deployable choice and the
  streaming layer does the same, streaming/ingest.py).
- ``etl_rotation_binning`` mirrors inventory #4/#5 (`:282-310`): size-
  and time-based file rotation, simulated as a windowed cumulative-sum
  assignment of records to file bins per writer shard (the reference's
  `threadCount` worker shards, `:93-94,172-182`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from kafka_parquet_writer_spark.catalog import load_table
from kafka_parquet_writer_spark.registry import query

N_SHARDS = 4  # reference threadCount analogue
MAX_FILE_BYTES = 4096  # test-scale maxFileSize analogue
RECORD_OVERHEAD = 16
TIME_BIN_SECONDS = 900  # reference maxFileOpenDurationSeconds default


@query(
    "etl_partition_layout",
    oracle="""
    SELECT event_id,
           strftime(ts, '%Y/%m/%d') AS dt,
           strftime(ts, '%Y-%m-%d-%H') AS hour_dir
    FROM events
    """,
)
def etl_partition_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-partitioned directory layout: every record maps to exactly
    one partition directory (totality is property-tested)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.date_format("ts", "yyyy/MM/dd").alias("dt"),
        F.date_format("ts", "yyyy-MM-dd-HH").alias("hour_dir"),
    )


@query(
    "etl_rotation_binning",
    oracle=f"""
    WITH sized AS (
      SELECT event_id, ts,
             CAST(user_id % {N_SHARDS} AS INTEGER)             AS shard,
             CAST({RECORD_OVERHEAD} + octet_length(encode(props)) AS BIGINT)
                                                               AS rec_bytes
      FROM events
    ),
    cum AS (
      SELECT event_id, shard, ts, rec_bytes,
             coalesce(sum(rec_bytes) OVER (
               PARTITION BY shard ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bytes_before
      FROM sized
    )
    SELECT event_id, shard,
           CAST(floor(CAST(bytes_before AS DOUBLE) / {MAX_FILE_BYTES}) AS BIGINT)
                                                               AS size_bin,
           CAST(floor(epoch(ts) / {TIME_BIN_SECONDS}) AS BIGINT) AS time_bin
    FROM cum
    """,
)
def etl_rotation_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Size/time rotation as a query: records are assigned to file bins
    by the running byte total per shard (size rotation, reference #4)
    and to 900 s buckets (time rotation, reference #5).

    Scale: the cumulative sum is windowed per shard — shard count is
    the write-parallelism knob exactly as the reference's threadCount;
    no global ordering exists anywhere.
    """
    ev = load_table(spark, sf_dir, "events")
    sized = ev.select(
        "event_id",
        "ts",
        (F.col("user_id") % N_SHARDS).cast("int").alias("shard"),
        (F.lit(RECORD_OVERHEAD) + F.octet_length("props")).cast("long").alias(
            "rec_bytes"
        ),
    )
    w = (
        W.partitionBy("shard")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    cum = sized.withColumn(
        "bytes_before", F.coalesce(F.sum("rec_bytes").over(w), F.lit(0))
    )
    return cum.select(
        "event_id",
        "shard",
        F.floor(F.col("bytes_before").cast("double") / MAX_FILE_BYTES)
        .cast("long")
        .alias("size_bin"),
        F.floor(F.unix_timestamp("ts") / TIME_BIN_SECONDS).cast("long").alias(
            "time_bin"
        ),
    )
