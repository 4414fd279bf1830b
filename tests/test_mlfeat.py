"""Plan-shape and semantic properties of the ML feature operators
(mlfeat.py) beyond what the DuckDB value oracle pins down."""

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from kafka_parquet_writer_spark.operators.mlfeat import (
    BIN_N,
    RESERVOIR_K,
    anomaly_mad,
    feature_binning,
    sample_reservoir_group,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_anomaly_mad_broadcasts_stats(spark):
    """The per-type median/MAD tables are tiny; they must come back to
    the fact scan as broadcasts — shuffling events to meet them would
    be the 100 TB scale-killer."""
    plan = _plan(anomaly_mad(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_feature_binning_bins_are_equal_frequency(spark):
    out = feature_binning(spark, SF_SMOKE).collect()
    by_type: dict = {}
    for r in out:
        by_type.setdefault(r["event_type"], []).append(r)
    for rows in by_type.values():
        assert len(rows) == BIN_N
        counts = [r["n"] for r in rows]
        assert max(counts) - min(counts) <= 1  # ntile's balance contract
        # bins tile the value range in order without overlap
        rows.sort(key=lambda r: r["bin"])
        for a, b in zip(rows, rows[1:]):
            assert a["hi"] <= b["lo"] + 1e-9


def test_reservoir_exact_k_and_deterministic(spark):
    a = sample_reservoir_group(spark, SF_SMOKE)
    counts = {
        r["event_type"]: r["n"]
        for r in a.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    assert all(n == RESERVOIR_K for n in counts.values()), counts
    ids1 = sorted(r["event_id"] for r in a.collect())
    ids2 = sorted(
        r["event_id"] for r in sample_reservoir_group(spark, SF_SMOKE).collect()
    )
    assert ids1 == ids2


def test_reservoir_uses_window_group_limit(spark):
    """rank<=k must push a per-partition top-k (WindowGroupLimit) below
    the shuffle so a giant group never sorts fully in one task."""
    plan = _plan(sample_reservoir_group(spark, SF_SMOKE))
    assert "WindowGroupLimit" in plan, plan[:2000]
