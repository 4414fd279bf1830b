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


def test_span_dedup_finds_shared_paragraph(spark, tmp_path):
    """Two docs share an exact 15-token paragraph embedded in unique
    text: both docs must report exactly one maximal duplicated span of
    exactly 15 tokens (the merge step must fuse the 6 overlapping
    10-grams, not report them separately); a doc with no repeats must
    be absent."""
    from kafka_parquet_writer_spark.operators.llm_prep import (
        SPAN_L,
        dedup_span_exact,
    )

    shared = " ".join(f"boiler{i}" for i in range(15))
    docs = spark.createDataFrame(
        [
            (1, f"alpha bravo charlie {shared} delta echo", "en", "w", 0),
            (2, f"zulu yankee {shared} xray whiskey victor uniq", "en", "w", 0),
            (3, "totally unique words nothing repeated here at all "
                "more unique filler tokens beyond the gram width okay",
             "en", "w", 0),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    rows = {r["doc_id"]: r for r in dedup_span_exact(spark, str(tmp_path)).collect()}
    assert set(rows) == {1, 2}
    for d in (1, 2):
        assert rows[d]["n_spans"] == 1
        assert rows[d]["dup_tokens"] == 15
        assert rows[d]["dup_tokens"] >= SPAN_L
    assert rows[1]["total_tokens"] == 20


def test_quality_classifier_scores_every_doc_and_splits(spark):
    """Every doc gets exactly one score; the fixed weight table must
    actually split the corpus (both classes present) — a degenerate
    all-keep/all-drop table would make the filter vacuous; keep is
    exactly the sign of the (un-normalized) score sum."""
    rows = E.queries()["text_quality_classifier"](spark, SF_SMOKE).collect()
    assert len(rows) == 500
    kept = sum(1 for r in rows if r["keep"])
    assert 0 < kept < 500
    # sign consistency where per-token normalization cannot mask it
    # (a small negative sum truncates to 0 milli, so only |milli| > 1
    # pins the class)
    for r in rows:
        if r["score_milli"] > 0:
            assert r["keep"]
        if r["score_milli"] < -1:
            assert not r["keep"]
