"""Round-12 regression tests: the r11 ADVICE fixes and the round's
new operators (RAG query-router fan-out, streaming passage windows)."""

import pytest

from pyspark.sql import functions as F


def test_approx_quantile_null_values_do_not_inflate_rank_target(
    spark, tmp_path
):
    """r11 ADVICE low: n counted ROWS (count(1)) while the percentile
    sketches and the lt/le rank sums all ignore NULL values, so a
    null-heavy group's p·n rank target was inflated far beyond the
    attainable rank interval and the gate flipped false on a correct
    sketch answer. 90 NULLs beside 10 values made the p95 target 95
    against a max attainable rank of 10 — reproduced before the
    F.count("value") fix."""
    from kafka_parquet_writer_spark.operators.governance import (
        agg_approx_quantile,
    )

    rows = [("nully", float(i * i)) for i in range(1, 11)]
    rows += [("nully", None)] * 90
    rows += [("clean", float(i)) for i in range(1, 21)]
    df = spark.createDataFrame(rows, "event_type string, value double")
    df.write.parquet(str(tmp_path / "events.parquet"))
    out = {
        r.event_type: r
        for r in agg_approx_quantile(spark, str(tmp_path)).collect()
    }
    assert set(out) == {"nully", "clean"}
    assert all(r.approx_in_rank_band for r in out.values()), out
    # the exact percentiles also ignore NULLs — p50 of the 10 values
    assert out["nully"].p50_exact == pytest.approx(30.5)


def test_stream_passage_windows_incremental_equals_batch(spark):
    """The streaming windower is rag_prep.passage_frame — the same
    function the batch key runs (so the 1..130-token boundary sweep
    covers both) — executed once per micro-batch over the doc_id-
    ranged staging. Stateless map ⇒ the union of per-batch outputs
    must equal the batch result row-for-row."""
    from kafka_parquet_writer_spark.registry import QUERIES

    sf = "/root/testdata/sf0.001"
    batch = {
        tuple(r) for r in QUERIES["rag_passage_windows"](spark, sf).collect()
    }
    stream = {
        tuple(r)
        for r in QUERIES["stream_passage_windows"](spark, sf).collect()
    }
    assert stream == batch
    assert len(batch) > 0
