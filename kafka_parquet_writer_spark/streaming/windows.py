"""Event-time streaming operators (SURVEY.md §2C) — capabilities the
reference lacks entirely (its only time logic is wall-clock file
rotation, `KafkaProtoParquetWriter.java:299-302`).

Thin, typed wrappers over Structured Streaming's window/session/dedup
primitives; operators/streaming_queries.py runs them through the
correctness gate, tests/test_streaming.py exercises them directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    keys: list[str],
    aggs: list,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Tumbling event-time window aggregation with late-data watermark."""
    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, duration), *keys)
        .agg(*aggs)
    )


def sliding_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    keys: list[str],
    aggs: list,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Sliding window: each event lands in duration/slide windows."""
    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, duration, slide), *keys)
        .agg(*aggs)
    )


def sessionize(
    df: DataFrame,
    ts_col: str,
    gap: str,
    keys: list[str],
    aggs: list,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Session windows: merge events whose gaps are < ``gap``."""
    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap), *keys)
        .agg(*aggs)
    )


def dedup_within_watermark(
    df: DataFrame, keys: list[str], ts_col: str, delay: str = "10 minutes"
) -> DataFrame:
    """Streaming dedup whose state is bounded by the watermark horizon —
    the scalable form (plain dropDuplicates keeps state forever)."""
    return df.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(keys)
