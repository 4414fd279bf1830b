"""Driver contract for the spark-graft builder (PySpark target).

entry()      — flagship query (TPC-H Q1 shape) on sf0.001.
queries()    — every declared operator from SURVEY.md §2B/§2C, keyed by
               name; implemented in kafka_parquet_writer_spark.operators.*.
oracle_sql() — matching DuckDB ANSI SQL; keys without an oracle get the
               driver's weaker rows-only check (approximate operators).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from kafka_parquet_writer_spark.registry import QUERIES, ORACLES, load_all_operators

load_all_operators()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["agg_hash"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query key (subset of queries())."""
    return dict(ORACLES)
