"""Behavior + plan gates for the corpus-preparation operators
(operators/corpus_prep.py): chunking overlap invariants, packing
budget/prefix-sum invariants, SCD2 validity-chain invariants, and the
physical-plan shapes that make each survive 100 TB."""

import __spark_entry__ as E
from kafka_parquet_writer_spark.operators.corpus_prep import (
    CHUNK_STRIDE,
    CHUNK_TOKENS,
    PACK_BUDGET,
)
from kafka_parquet_writer_spark.plans.inspect import (
    count_exchanges,
    simple_plan,
)


def test_text_chunk_covers_every_token(spark, sf_dir):
    rows = E.queries()["text_chunk"](spark, sf_dir).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc, chunks in by_doc.items():
        chunks.sort(key=lambda r: r.chunk_seq)
        # consecutive chunk_seq from 0
        assert [c.chunk_seq for c in chunks] == list(range(len(chunks)))
        # reconstruct the doc's token count from the tail chunk, then
        # every chunk size is exactly min(CHUNK, total - start)
        n_total = CHUNK_STRIDE * (len(chunks) - 1) + chunks[-1].n_tokens
        for c in chunks:
            start = c.chunk_seq * CHUNK_STRIDE
            assert c.n_tokens == min(CHUNK_TOKENS, n_total - start)
            assert c.n_tokens >= 1


def test_text_chunk_is_map_only(spark, sf_dir):
    df = E.queries()["text_chunk"](spark, sf_dir)
    assert count_exchanges(df) == 0  # chunking never shuffles


def test_pack_sequences_is_a_partition_of_docs(spark, sf_dir):
    import duckdb

    bins = E.queries()["pack_sequences"](spark, sf_dir).collect()
    n_docs = duckdb.sql(
        f"SELECT count(*) FROM '{sf_dir}/documents.parquet'"
    ).fetchone()[0]
    assert sum(r.n_docs for r in bins) == n_docs
    bins.sort(key=lambda r: r.bin_id)
    # bins tile the doc_id axis in order: contiguous, non-overlapping
    for a, b in zip(bins, bins[1:]):
        assert a.last_doc < b.first_doc
    # every bin starts within budget (overflow ≤ the straddling doc):
    # cum_before of first_doc is inside [bin_id*B, (bin_id+1)*B)
    for r in bins:
        assert r.n_docs >= 1
        assert r.tok_sum >= 0


def test_pack_sequences_has_no_single_partition_global_window(spark, sf_dir):
    plan = simple_plan(E.queries()["pack_sequences"](spark, sf_dir))
    # the corpus-wide window must run per-shard (partitionBy shard);
    # the only SinglePartition window is over the tiny shard-totals side
    corpus_windows = [
        ln
        for ln in plan.splitlines()
        if "Window [" in ln and "doc_id" in ln
    ]
    assert corpus_windows, "expected a per-shard window over doc_id"
    for ln in corpus_windows:
        assert "shard" in ln  # partitioned, not global


def test_dim_scd2_validity_chains(spark, sf_dir):
    rows = E.queries()["dim_scd2"](spark, sf_dir).collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for user, versions in by_user.items():
        versions.sort(key=lambda r: r.version_seq)
        assert [v.version_seq for v in versions] == list(
            range(1, len(versions) + 1)
        )
        # exactly one open (current) version, and it is the last
        currents = [v for v in versions if v.is_current == 1]
        assert len(currents) == 1 and currents[0] is versions[-1]
        assert versions[-1].valid_to_us is None
        # closed versions chain: valid_to == next valid_from, no overlap
        for a, b in zip(versions, versions[1:]):
            assert a.valid_to_us == b.valid_from_us
            assert a.valid_from_us < a.valid_to_us
            # consecutive versions differ (that's what made them versions)
            assert a.event_type != b.event_type


def test_heavy_hitters_threshold_is_exact(spark, sf_dir):
    rows = E.queries()["text_heavy_hitters"](spark, sf_dir).collect()
    import duckdb

    n_docs = duckdb.sql(
        f"SELECT count(*) FROM '{sf_dir}/documents.parquet'"
    ).fetchone()[0]
    assert rows  # stopwords guarantee hits
    for r in rows:
        assert r.doc_freq * 100 >= n_docs * 5


def test_profile_columns_counts(spark, sf_dir):
    import duckdb

    rows = {r.col_name: r for r in E.queries()["profile_columns"](spark, sf_dir).collect()}
    n = duckdb.sql(f"SELECT count(*) FROM '{sf_dir}/orders.parquet'").fetchone()[0]
    assert set(rows) == {
        "o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority",
        "o_orderdate", "o_totalprice_cents",
    }
    for r in rows.values():
        assert r.n_rows == n
        assert 0 < r.n_distinct <= r.n_nonnull <= r.n_rows
    # primary key is unique
    assert rows["o_orderkey"].n_distinct == n


def test_embedding_pq_shape_and_plan(spark, sf_dir):
    df = E.queries()["embedding_pq"](spark, sf_dir)
    assert count_exchanges(df) == 0  # pure per-row expressions
    rows = df.collect()
    from kafka_parquet_writer_spark.operators.similarity import PQ_K, PQ_M

    assert all(0 <= r.pq_code < PQ_K**PQ_M for r in rows)
    assert all(r.err6 >= 0 for r in rows)


def test_winsorized_bounds(spark, sf_dir):
    rows = E.queries()["agg_winsorized"](spark, sf_dir).collect()
    for r in rows:
        assert r.lo_cents <= r.hi_cents
        assert r.lo_cents / 100.0 <= r.win_avg <= r.hi_cents / 100.0


def test_inverted_index_postings_sorted(spark, sf_dir):
    rows = E.queries()["text_inverted_index"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        ids = [int(x) for x in r.postings_head.split(",") if x]
        assert ids == sorted(ids)
        assert len(ids) <= 64
        assert r.df >= len(ids)


def test_range_binned_join_is_equi_not_nlj(spark, sf_dir):
    plan = simple_plan(E.queries()["join_range_binned"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_er_fuzzy_is_blocked_equi_join(spark, sf_dir):
    df = E.queries()["er_fuzzy_name_match"](spark, sf_dir)
    plan = simple_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    for r in df.collect():
        assert r.name_a < r.name_b
        assert 0 < r.dist <= 2
        assert r.name_a.split(" ")[-1] == r.name_b.split(" ")[-1]


def test_histogram_tiles_range(spark, sf_dir):
    import duckdb

    rows = sorted(
        E.queries()["agg_histogram"](spark, sf_dir).collect(),
        key=lambda r: r.bucket,
    )
    n = duckdb.sql(f"SELECT count(*) FROM '{sf_dir}/orders.parquet'").fetchone()[0]
    assert sum(r.n for r in rows) == n
    assert all(0 <= r.bucket < 16 for r in rows)
    assert abs(sum(r.pct for r in rows) - 100.0) < 0.5
