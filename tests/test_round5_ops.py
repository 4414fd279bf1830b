"""Metamorphic properties of the round-5 operators — invariants the
DuckDB value oracles do NOT express (they prove engine-equality, not
these)."""

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as E
from tests.conftest import SF_ORACLE, SF_SMOKE


def test_theta_sketch_set_algebra_bounds(spark):
    """Sketch estimates must obey set algebra regardless of accuracy:
    inter ≤ min(|A|,|B|)-ish bounds via union ≥ inter, diff ≥ 0,
    union ≥ max-side estimate implied by inter+diff; exact-mode sets
    (smaller than K) must estimate EXACTLY."""
    rows = E.queries()["agg_theta_sketch"](spark, SF_SMOKE).collect()
    assert len(rows) == 23
    for r in rows:
        assert r["est_union"] >= r["est_inter"] >= 0
        assert r["est_diff"] >= 0
        # smoke SF: every hourly audience < K=64 → exact mode
        assert r["est_union"] == r["n_union"]
        assert r["est_inter"] == r["n_inter"]
        assert r["close_union"] and r["close_inter"]

    # oracle SF: real estimation regime — gates must hold
    rows = E.queries()["agg_theta_sketch"](spark, SF_ORACLE).collect()
    assert len(rows) == 23
    for r in rows:
        assert r["close_union"], (r["h"], r["est_union"], r["n_union"])
        assert r["close_inter"], (r["h"], r["est_inter"], r["n_inter"])


def test_kmeans_partitions_corpus_deterministically(spark):
    """Every vector gets exactly one cluster, all K clusters are
    non-empty on the fixture, and a second run reproduces the exact
    assignment (integer arithmetic → no float drift)."""
    from kafka_parquet_writer_spark.operators.mlfeat import KM_K

    q = E.queries()["embedding_cluster_kmeans"]
    a = {r["vec_id"]: r["cluster"] for r in q(spark, SF_SMOKE).collect()}
    assert len(a) == 500  # one row per vector
    assert set(a.values()) == set(range(KM_K))
    b = {r["vec_id"]: r["cluster"] for r in q(spark, SF_SMOKE).collect()}
    assert a == b
