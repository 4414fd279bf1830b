"""Reference-faithful ETL tests (SURVEY.md §5.2), adopting the
reference's own test strategy: round-trip multiset equality
(`KafkaProtoParquetWriterTest.java:134-136` containsInAnyOrder),
directory-layout assertions (`:194-227`), and rotation bounds
(`:139-188`) — re-expressed for the Structured Streaming pipeline.
"""

import glob
import os
import tempfile

import pytest
from pyspark.sql import functions as F

from kafka_parquet_writer_spark.catalog import (
    load_table,
    normalize_nanos,
    table_path,
)
from kafka_parquet_writer_spark.sources.decoders import (
    encode_wire_format,
    parse_wire_format,
    wire_format_decoder,
)
from kafka_parquet_writer_spark.streaming.ingest import (
    IngestConfig,
    build_pipeline,
    ingest_once,
)


def _staged_events_dir(spark, sf_dir):
    src = table_path(sf_dir, "events")
    d = tempfile.mkdtemp(prefix="ingest_src_")
    os.symlink(src, os.path.join(d, "events.parquet"))
    schema = spark.read.parquet(src).schema
    return d, schema


def _cfg(spark, sf_dir, **over):
    src_dir, schema = _staged_events_dir(spark, sf_dir)
    base = dict(
        target_dir=tempfile.mkdtemp(prefix="ingest_out_"),
        checkpoint_dir=tempfile.mkdtemp(prefix="ingest_ckpt_"),
        source_format="file",
        source_path=src_dir,
        source_schema=schema,
        trigger_seconds=None,
        directory_datetime_pattern=None,
    )
    base.update(over)
    return IngestConfig(**base)


def test_roundtrip_multiset_equality(spark, sf_dir):
    """Everything sent comes back, order-insensitive — the reference's
    core invariant (containsInAnyOrder, :136)."""
    cfg = _cfg(spark, sf_dir)
    ingest_once(spark, cfg)
    src = load_table(spark, sf_dir, "events")
    out = spark.read.parquet(cfg.target_dir)
    # ts was written as raw nanos long (nanosAsLong read) — compare on
    # the stable columns plus row count
    cols = ["event_id", "user_id", "event_type", "value", "props"]
    assert out.count() == src.count()
    assert src.select(*cols).exceptAll(out.select(*cols)).count() == 0
    assert out.select(*cols).exceptAll(src.select(*cols)).count() == 0


def test_partitioned_directory_layout(spark, sf_dir):
    """Date-partitioned layout from event time (reference #6, :362-380,
    Hive-style here); every row lands in exactly one partition whose
    value matches its own timestamp (totality)."""
    cfg = _cfg(
        spark,
        sf_dir,
        directory_datetime_pattern="yyyy/MM/dd",
        partition_time_column="ts_event",
    )

    # pre-decode step: normalize ts (fixture-form-agnostic: long-nanos
    # or TIMESTAMP_NTZ) and expose it as the partition-time column
    def decode(df):
        return normalize_nanos(df).withColumn("ts_event", F.col("ts"))

    cfg.decoder = decode
    ingest_once(spark, cfg)

    part_dirs = glob.glob(os.path.join(cfg.target_dir, "year=*/month=*/day=*"))
    assert part_dirs, "expected Hive-style date partitions"
    out = spark.read.parquet(cfg.target_dir)
    src_n = load_table(spark, sf_dir, "events").count()
    assert out.count() == src_n
    # partition directory values come back type-inferred (ints)
    mismatch = out.filter(
        (F.year("ts_event") != F.col("year").cast("int"))
        | (F.month("ts_event") != F.col("month").cast("int"))
        | (F.dayofmonth("ts_event") != F.col("day").cast("int"))
    ).count()
    assert mismatch == 0


def test_metrics_file_size_histogram(spark, sf_dir):
    """Reference metric parity (KafkaProtoParquetWriter.java:110-121):
    the flushed-file-size histogram must see every committed data file
    and its true byte size."""
    from kafka_parquet_writer_spark.streaming.ingest import IngestMetrics

    cfg = _cfg(spark, sf_dir)
    m = IngestMetrics(spark, target_dir=cfg.target_dir)
    try:
        ingest_once(spark, cfg)
        h = m.file_size_histogram()
        files = [
            p
            for p in glob.glob(
                os.path.join(cfg.target_dir, "**", "*.parquet"), recursive=True
            )
            if "_spark_metadata" not in p
        ]
        assert h["count"] == len(files) > 0
        assert h["min"] > 0 and h["max"] >= h["p95"] >= h["p50"] >= h["min"]
        assert sum(m.file_sizes) == sum(os.path.getsize(p) for p in files)
    finally:
        m.remove(spark)


def test_rotation_max_records_per_file(spark, sf_dir):
    """Size-rotation analogue (reference #4, :282-310): no output file
    exceeds the per-file record cap."""
    cfg = _cfg(spark, sf_dir, max_records_per_file=200, num_shards=2)
    ingest_once(spark, cfg)
    files = glob.glob(os.path.join(cfg.target_dir, "*.parquet"))
    assert len(files) >= 5  # 1000 rows / 200 cap / 2 shards ⇒ ≥5 files
    for f in files:
        assert spark.read.parquet(f).count() <= 200, f


def test_config_validation():
    """Builder-style validation (reference #14, :453-751)."""
    with pytest.raises(ValueError, match="target_dir"):
        IngestConfig(target_dir="", checkpoint_dir="x").validate()
    with pytest.raises(ValueError, match="kafka"):
        IngestConfig(
            target_dir="a", checkpoint_dir="b", source_format="kafka"
        ).validate()
    with pytest.raises(ValueError, match="max_records_per_file"):
        IngestConfig(
            target_dir="a",
            checkpoint_dir="b",
            source_format="file",
            source_path="p",
            source_schema="not-none",
            max_records_per_file=5,
        ).validate()


def test_wire_format_roundtrip_and_dlq(spark):
    """Binary decode path (reference #2, :269-277): reference-shaped
    messages (test-message.proto:5-10 — string query, int64 timestamp,
    int32 pgsize, int32 offset) encoded → decoded; malformed bytes
    yield a null row instead of crashing the worker (the DLQ the
    reference left as TODO, :272-277)."""
    msgs = [
        {1: f"query-{i}", 2: 1700000000000 + i, 3: i % 7, 4: i} for i in range(50)
    ]
    payloads = [(encode_wire_format(m),) for m in msgs]
    payloads.append((b"\xff\xff\xff",))  # truncated varint → malformed
    df = spark.createDataFrame(payloads, "value binary")
    decoder = wire_format_decoder(
        {
            "query": (1, "string"),
            "timestamp": (2, "long"),
            "pgsize": (3, "int"),
            "offset": (4, "int"),
        }
    )
    out = decoder(df).collect()
    assert len(out) == 51
    good = sorted(
        (r for r in out if r.query is not None), key=lambda r: r.offset
    )
    assert len(good) == 50
    assert good[7].query == "query-7" and good[7].timestamp == 1700000000007
    bad = [r for r in out if r.query is None]
    assert len(bad) == 1 and bad[0].timestamp is None


def test_wire_format_negative_ints(spark):
    """Negative proto int32/int64 arrive as 10-byte two's-complement
    varints; the decoder must re-sign them (parser.parseFrom semantics)
    instead of emitting huge unsigned values that overflow Arrow int64."""
    msgs = [{1: "neg", 2: -1700000000000, 3: -7, 4: 0},
            {1: "pos", 2: 1700000000000, 3: 7, 4: 1}]
    df = spark.createDataFrame(
        [(encode_wire_format(m),) for m in msgs], "value binary"
    )
    decoder = wire_format_decoder(
        {"query": (1, "string"), "timestamp": (2, "long"),
         "pgsize": (3, "int"), "offset": (4, "int")}
    )
    out = {r.query: r for r in decoder(df).collect()}
    assert out["neg"].timestamp == -1700000000000
    assert out["neg"].pgsize == -7
    assert out["pos"].timestamp == 1700000000000


def test_wire_format_parser_units():
    enc = encode_wire_format({1: "héllo", 2: 2**45, 3: 0})
    parsed = parse_wire_format(enc)
    assert parsed[1][0].decode() == "héllo"
    assert parsed[2][0] == 2**45
    assert parsed[3][0] == 0
    with pytest.raises(ValueError):
        parse_wire_format(b"\x0a\xff")  # length-delimited, truncated body


def test_pipeline_is_inert_until_started(spark, sf_dir):
    """Mirrors the reference's inert construction (§3.1: no I/O or
    threads before start(), :131-166)."""
    cfg = _cfg(spark, sf_dir)
    df = build_pipeline(spark, cfg)
    assert df.isStreaming
    assert not glob.glob(os.path.join(cfg.target_dir, "*"))
