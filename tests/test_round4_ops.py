"""Metamorphic properties of the round-4 operators — invariants the
DuckDB value oracles do NOT express (they prove engine-equality, not
these)."""

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as E
from tests.conftest import SF_SMOKE


def test_url_canonicalization_idempotent(spark):
    """canon(canon(u)) == canon(u): a canonical URL must survive its
    own normalization, else two passes over a corpus disagree."""
    from kafka_parquet_writer_spark.operators.web_curation import (
        _canon_col,
        _synth_url_col,
    )
    from kafka_parquet_writer_spark.catalog import load_table

    docs = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", "source", _synth_url_col().alias("url")
    )
    once = docs.select("doc_id", _canon_col(F.col("url")).alias("c1"))
    twice = once.select(
        "doc_id", "c1", _canon_col(F.col("c1")).alias("c2")
    )
    assert twice.filter(F.col("c1") != F.col("c2")).count() == 0


def test_sample_weighted_exact_k_and_deterministic(spark):
    """The weighted sample is exactly K rows and bit-identical across
    runs (audit batches must be reproducible)."""
    from kafka_parquet_writer_spark.operators.governance import SAMPLE_K

    a = E.queries()["sample_weighted"](spark, SF_SMOKE).collect()
    b = E.queries()["sample_weighted"](spark, SF_SMOKE).collect()
    assert len(a) == SAMPLE_K
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_phash_pairs_ordered_and_within_threshold(spark):
    from kafka_parquet_writer_spark.operators.multimodal import (
        PHASH_MAX_HAMMING,
    )

    rows = E.queries()["multimodal_phash_dedup"](spark, SF_SMOKE).collect()
    assert rows, "fixture must contain near-dup pairs"
    for r in rows:
        assert r.d1 < r.d2
        assert 0 <= r.hamming <= PHASH_MAX_HAMMING


def test_containment_within_unit_interval(spark):
    from kafka_parquet_writer_spark.operators.dedup import CONTAIN_T

    rows = E.queries()["dedup_containment"](spark, SF_SMOKE).collect()
    for r in rows:
        assert CONTAIN_T <= r.cont <= 1.0


def test_cdc_apply_tombstones_absent(spark):
    from kafka_parquet_writer_spark.operators.streaming_queries import (
        CDC_DELETE_TYPE,
    )
    from kafka_parquet_writer_spark.catalog import load_table

    final = E.queries()["stream_cdc_apply"](spark, SF_SMOKE)
    ev = load_table(spark, SF_SMOKE, "events")
    # users whose LAST event is a tombstone must be absent
    from pyspark.sql.window import Window as W

    w = W.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    last = (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type")
    )
    deleted = {
        r.user_id
        for r in last.filter(
            F.col("event_type") == CDC_DELETE_TYPE
        ).collect()
    }
    surviving = {r.user_id for r in final.collect()}
    assert deleted.isdisjoint(surviving)
    assert surviving, "non-tombstoned users must survive"
