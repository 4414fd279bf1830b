"""Streaming window/state operators (SURVEY.md §2C) verified against
batch equivalents computed by Spark itself."""

import tempfile

from pyspark.sql import functions as F

from kafka_parquet_writer_spark.catalog import load_table
from kafka_parquet_writer_spark.operators.streaming_queries import _events_stream
from kafka_parquet_writer_spark.streaming.windows import (
    dedup_within_watermark,
    sessionize,
    sliding_agg,
    tumbling_agg,
)

_n = iter(range(10_000))


def _run(stream_df, mode):
    name = f"test_stream_{next(_n)}"
    q = (
        stream_df.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="wck_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(name)


def test_tumbling_matches_batch(spark, sf_dir):
    stream = _events_stream(spark, sf_dir)
    out = _run(
        tumbling_agg(stream, "ts", "5 minutes", ["event_type"], [F.count("*").alias("n")]),
        "complete",
    )
    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.window("ts", "5 minutes"), "event_type")
        .agg(F.count("*").alias("n"))
    )
    assert out.count() == batch.count()
    assert out.agg(F.sum("n")).first()[0] == batch.agg(F.sum("n")).first()[0]


def test_sliding_window_multiplicity(spark, sf_dir):
    """Each event falls in duration/slide windows: total count across
    sliding windows = rows × (duration/slide)."""
    stream = _events_stream(spark, sf_dir)
    out = _run(
        sliding_agg(stream, "ts", "10 minutes", "5 minutes", [], [F.count("*").alias("n")]),
        "complete",
    )
    rows = load_table(spark, sf_dir, "events").count()
    assert out.agg(F.sum("n")).first()[0] == rows * 2


def test_sessionize_matches_lag_formulation(spark, sf_dir):
    from pyspark.sql.window import Window as W

    stream = _events_stream(spark, sf_dir)
    out = _run(
        sessionize(stream, "ts", "30 minutes", ["user_id"], [F.count("*").alias("n")]),
        "complete",
    )
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts")
    gap_us = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    sessions = (
        ev.withColumn(
            "new_sess",
            F.when(gap_us.isNull() | (gap_us >= 1800 * 1_000_000), 1).otherwise(0),
        )
        .withColumn("sid", F.sum("new_sess").over(w.rowsBetween(W.unboundedPreceding, 0)))
        .groupBy("user_id", "sid")
        .agg(F.count("*").alias("n"))
    )
    assert out.count() == sessions.count()
    assert sorted(r.n for r in out.collect()) == sorted(
        r.n for r in sessions.collect()
    )


def test_streaming_dedup_within_watermark(spark, sf_dir):
    stream = _events_stream(spark, sf_dir)
    out = _run(
        dedup_within_watermark(stream, ["user_id", "event_type"], "ts", "1 hour"),
        "append",
    )
    distinct = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_type")
        .distinct()
        .count()
    )
    # within one availableNow batch all duplicates are in horizon
    assert out.select("user_id", "event_type").distinct().count() == distinct
    assert out.count() == distinct


def test_tws_totals_gated(spark):
    """transformWithStateInPandas operator — runs only where the
    google.protobuf Python package exists (the TWS state protocol
    imports StateMessage_pb2 in the driver worker). Absent here; the
    operator is exercised end-to-end wherever protobuf is installed."""
    import pytest

    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError:
        pytest.skip("google.protobuf not installed — TWS driver worker "
                    "cannot start (same environment gap as spark-protobuf)")

    from kafka_parquet_writer_spark.operators.streaming_queries import (
        stream_tws_totals,
    )
    from tests.conftest import SF_SMOKE

    out = stream_tws_totals(spark, SF_SMOKE)
    rows = {r["user_id"]: r for r in out.collect()}
    from kafka_parquet_writer_spark.catalog import load_table
    from pyspark.sql import functions as F

    exp = {
        r["user_id"]: r
        for r in load_table(spark, SF_SMOKE, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"),
             F.countDistinct("event_type").alias("n_types"))
        .collect()
    }
    assert set(rows) == set(exp)
    for k in rows:
        assert rows[k]["n"] == exp[k]["n"]
        assert rows[k]["n_types"] == exp[k]["n_types"]


def test_stream_dedup_minhash_kept_set_properties(spark):
    """The incremental stream keeps exactly the docs with no smaller
    same-bucket partner; spot-check invariants beyond the oracle gate:
    monotone doc_id coverage and first-batch doc 0 always kept."""
    import __spark_entry__ as E

    kept = sorted(
        r.doc_id
        for r in E.queries()["stream_dedup_minhash"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    )
    assert kept, "kept set must be non-empty"
    assert kept[0] == 0  # smallest doc can never collide with a smaller one
    assert len(kept) == len(set(kept))  # no doc emitted twice (idempotence)


def test_stream_decontaminate_equals_batch(spark):
    """The streaming scrub over ordered micro-batches must produce
    exactly the one-shot batch result — the equivalence that makes
    continuous decontamination trustworthy (same contract the driver's
    oracle checks, pinned here at smoke scale with direct comparison)."""
    from kafka_parquet_writer_spark.operators.llm_prep import (
        decontaminate_ngram,
    )
    from kafka_parquet_writer_spark.operators.streaming_queries import (
        stream_decontaminate,
    )

    sf = "/root/testdata/sf0.001"
    batch = sorted(
        (r["doc_id"], r["n_shared"])
        for r in decontaminate_ngram(spark, sf).collect()
    )
    streamed = sorted(
        (r["doc_id"], r["n_shared"])
        for r in stream_decontaminate(spark, sf).collect()
    )
    assert streamed == batch
    assert batch, "fixture must produce a non-empty contaminated set"


def test_staged_dir_stages_directory_tables(spark, tmp_path):
    """A multi-file table arrives as a DIRECTORY; the file-stream
    source does not recurse, so _staged_dir must stage the part files
    themselves — symlinking the directory streamed ZERO rows (caught
    by bench_scale's streaming lane)."""
    import glob
    import os

    from kafka_parquet_writer_spark.operators.streaming_queries import (
        _staged_dir,
    )

    d = str(tmp_path / "multi.parquet")
    spark.range(100).repartition(4).write.parquet(d)
    staged = _staged_dir(d)
    parts = glob.glob(os.path.join(staged, "*.parquet"))
    assert len(parts) == 4
    assert all(os.path.isfile(p) for p in parts)
    n = (
        spark.readStream.schema("id long")
        .parquet(staged)
        .groupBy()
        .count()
    )
    from kafka_parquet_writer_spark.operators.streaming_queries import (
        _run_to_memory,
    )

    out = _run_to_memory(n, "complete")
    assert out.collect()[0][0] == 100
