"""Catalog: named access to the at-rest Parquet tables.

Mirrors the reference's "table" notion — a directory of Parquet files
(`KafkaProtoParquetWriter.java:81-82,362-380`) — as Spark-readable paths.
Reads are plain ``spark.read.parquet`` so Catalyst gets predicate
pushdown + column pruning on every downstream query for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

#: dimension tables small enough to broadcast at any realistic scale
#: (region=5 rows fixed, nation=25 rows fixed; supplier scales but slowly)
BROADCASTABLE = {"region", "nation", "supplier"}

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def ensure_nanos_readable(spark: SparkSession) -> None:
    """Make INT64 TIMESTAMP(NANOS) parquet columns readable on *any*
    session, not just the one built by session.get_spark.

    ``spark.sql.legacy.parquet.nanosAsLong`` is a runtime-settable SQL
    conf; without it `spark.read.parquet` on events.parquet throws
    PARQUET_TYPE_ILLEGAL. The driver constructs its own SparkSession,
    so this must be applied at read time, not session-build time.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def normalize_nanos(df: DataFrame) -> DataFrame:
    """Normalize the ``ts`` column to a proper ``TIMESTAMP`` regardless of
    how the fixture materializes it:

    - INT64 TIMESTAMP(NANOS) read under ``nanosAsLong`` → LongType; convert
      with truncating ns→µs division (matches DuckDB's read behavior).
    - parquet ``timestamp[us]`` without timezone → TimestampNTZType; the
      session timezone is pinned UTC, so a plain cast to TIMESTAMP preserves
      the wall-clock values and matches DuckDB.

    The fixture has changed shape between rounds; this normalizer is total
    over every form observed so downstream ``unix_micros``/``withWatermark``
    usage never sees a non-TIMESTAMP event-time column.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    for field in df.schema.fields:
        if field.name == "ts":
            if isinstance(field.dataType, LongType):
                df = df.withColumn(
                    "ts", F.timestamp_micros(F.expr("ts div 1000"))
                )
            elif isinstance(field.dataType, TimestampNTZType):
                df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    ensure_nanos_readable(spark)
    return normalize_nanos(spark.read.parquet(table_path(sf_dir, name)))


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view (for the SQL API)."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
