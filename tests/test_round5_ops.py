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


def test_session_features_cross_batch_tail_merge():
    """Drive the PRODUCTION sessionize closure (module-level
    make_sessionizer) across two 'batches': the second batch's head
    must MERGE into the stored open-session tail (no break), continuing
    seq/count/cents, while a purchase in batch 1 closes its session so
    the next event opens a new one."""
    import pandas as pd

    from kafka_parquet_writer_spark.operators.streaming_queries import (
        SESS_GAP_S,
        make_sessionizer,
    )

    class FakeState:
        def __init__(self):
            self.exists = False
            self._v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v
            self.exists = True

    sess = make_sessionizer(SESS_GAP_S)

    def mk(ts_s, eid, et, v):
        return {
            "ts": pd.Timestamp(ts_s, unit="s"),
            "event_id": eid,
            "event_type": et,
            "value": v,
        }

    def run(batch, st):
        out = pd.concat(list(sess((7,), [batch], st)), ignore_index=True)
        return list(
            zip(
                out["sess_seq"], out["n_events"], out["cents_sum"],
                out["converted"],
            )
        )

    st = FakeState()
    b1 = pd.DataFrame(
        [mk(1000, 1, "view", 1.0), mk(1100, 2, "purchase", 2.0),
         mk(1200, 3, "view", 3.0)]
    )
    out1 = run(b1, st)
    # purchase at t=1100 closes session 1; t=1200 opens session 2
    assert [(s, n, conv) for s, n, _, conv in out1] == [
        (1, 2, True), (2, 1, False),
    ]
    b2 = pd.DataFrame(
        [mk(1300, 4, "click", 4.0), mk(9999, 5, "view", 5.0)]
    )
    out2 = run(b2, st)
    # t=1300 merges into open session 2 (gap 100 < 1800): count 1+1,
    # cents 300+400; t=9999 is a gap break -> session 3
    assert [(s, n, c) for s, n, c, _ in out2] == [
        (2, 2, 700), (3, 1, 500),
    ]


def test_sessionizer_same_second_order_matches_oracle():
    """Two same-user events inside ONE floored second whose event_id
    order OPPOSES their sub-second ts order must replay in (es,
    event_id) order — the oracle's window order — not raw-ns order.
    Regression for the r5 advisor finding: sorting by raw ns ts put
    event_id 2 (at .900s) after event_id 1 (at .100s) only by luck of
    the fixture; here ids are swapped so raw-ts order would flip the
    purchase-terminated session split."""
    import pandas as pd

    from kafka_parquet_writer_spark.operators.streaming_queries import (
        SESS_GAP_S,
        make_sessionizer,
    )

    class FakeState:
        exists = False

        def update(self, v):
            self._v = v
            self.exists = True

        @property
        def get(self):
            return self._v

    sess = make_sessionizer(SESS_GAP_S)
    # event_id 1 is LATER in ns time (.900) than event_id 2 (.100);
    # both floor to second 1000. Oracle order: (1000, 1), (1000, 2) —
    # purchase FIRST, so the view opens session 2.
    b = pd.DataFrame(
        [
            {"ts": pd.Timestamp(1000_900_000_000), "event_id": 1,
             "event_type": "purchase", "value": 1.0},
            {"ts": pd.Timestamp(1000_100_000_000), "event_id": 2,
             "event_type": "view", "value": 2.0},
        ]
    )
    out = pd.concat(list(sess((7,), [b], FakeState())), ignore_index=True)
    assert list(zip(out["sess_seq"], out["n_events"], out["converted"])) == [
        (1, 1, True), (2, 1, False),
    ]


def test_mmr_rerank_invariants(spark):
    """5 distinct results, rank 1 is the pure-cosine argmax (its mmr
    carries no diversity term), and the greedy walk is deterministic.
    NOTE: mmr ≤ 7·simq does NOT hold in general — cosine is signed,
    so a candidate anti-correlated with the whole slate gets a
    diversity BONUS (−3·maxsim > 0); that is correct MMR behavior on
    isotropic vectors, and the oracle pins the exact trajectory."""
    from kafka_parquet_writer_spark.operators.similarity import (
        MMR_K,
        MMR_REL,
    )

    q = E.queries()["similarity_rerank_mmr"]
    rows = sorted(q(spark, SF_SMOKE).collect(), key=lambda r: r["rnk"])
    assert [r["rnk"] for r in rows] == list(range(1, MMR_K + 1))
    assert len({r["vec_id"] for r in rows}) == MMR_K
    assert rows[0]["mmr"] == MMR_REL * rows[0]["simq"]
    assert rows[0]["simq"] == max(r["simq"] for r in rows)
    again = sorted(q(spark, SF_SMOKE).collect(), key=lambda r: r["rnk"])
    assert [tuple(r) for r in rows] == [tuple(r) for r in again]
