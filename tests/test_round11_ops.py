"""Round-11 regression tests.

Covers the round-10 VERDICT/ADVICE items:
  - tier-2 wire decoder: an absent repeated field is [] (proto3
    repeated fields are never null), matching tier-1 from_protobuf —
    the tiers demonstrably disagreed on identical input (ADVICE medium),
  - unsupported field types are rejected at decoder CONSTRUCTION
    instead of misdecoding as raw varints (ADVICE low),
  - make_subseq_matcher requires length >= 2 (length 1 passed the
    power-of-two assert but kept the ENTIRE series in state via the
    vc[-0:] slice — ADVICE low),
  - the BPE drift state ceiling is code, not prose: _drift_state_guard
    raises loudly on a decorrelated state blow-up (VERDICT item 6),
plus the round-11 RAG-prep keys' non-oracle invariants: end-anchored
passage-window geometry and exact vocabulary partitioning of the
shard manifests (the DuckDB oracle checks values; these pin the
CONTRACT the values encode).
"""

import pytest
from pyspark.sql import functions as F

from kafka_parquet_writer_spark.sources.decoders import (
    encode_wire_format,
    wire_format_decoder,
)
from kafka_parquet_writer_spark.operators.streaming_queries import (
    _drift_state_guard,
    make_subseq_matcher,
)


def test_tier2_empty_repeated_decodes_to_empty_list(spark):
    """Mirror of the tier-1 assertion (test_proto_tier1 checks
    list(rows[1].tags) == [] for from_protobuf): zero occurrences of a
    repeated field must decode to the EMPTY LIST, not NULL, so a
    tier-1 -> tier-2 fallback cannot silently flip null semantics
    downstream (filters like `tags IS NULL` / `size(tags) = 0` would
    partition the same data differently across tiers)."""
    msgs = [
        {1: "has-tags", 5: ["a", "b"], 6: [3, 1, 2]},
        {1: "no-tags"},  # fields 5 and 6 entirely absent on the wire
    ]
    df = spark.createDataFrame(
        [(encode_wire_format(m),) for m in msgs], "value binary"
    )
    decoder = wire_format_decoder(
        {
            "query": (1, "string"),
            "tags": (5, "array<string>"),
            "nums": (6, "array<long>"),
        }
    )
    out = {r.query: r for r in decoder(df).collect()}
    assert list(out["has-tags"].tags) == ["a", "b"]
    assert list(out["has-tags"].nums) == [3, 1, 2]
    assert out["no-tags"].tags is not None
    assert list(out["no-tags"].tags) == []
    assert out["no-tags"].nums is not None
    assert list(out["no-tags"].nums) == []
    # the DLQ path is unchanged: a MALFORMED record still yields an
    # all-null row (the whole message is unreadable — that is not the
    # "absent repeated field" case)
    bad = decoder(
        spark.createDataFrame([(b"\xff\xff\xff",)], "value binary")
    ).collect()
    assert bad[0].tags is None and bad[0].query is None


def test_wire_decoder_rejects_unsupported_types():
    """array<float> / array<boolean> used to fall through to
    _varints_of and decode to raw bit-pattern garbage; now the
    whitelist is checked when the decoder is BUILT — errors surface at
    pipeline-construction time, not as silent data corruption on
    executors."""
    with pytest.raises(ValueError, match="array element 'float'"):
        wire_format_decoder({"xs": (1, "array<float>")})
    with pytest.raises(ValueError, match="array element 'boolean'"):
        wire_format_decoder({"xs": (1, "array<boolean>")})
    with pytest.raises(ValueError, match="unsupported scalar"):
        wire_format_decoder({"x": (1, "decimal(10,2)")})
    # nested field maps are validated recursively
    with pytest.raises(ValueError, match="array element 'float'"):
        wire_format_decoder({"m": (1, {"xs": (2, "array<float>")})})
    # the full supported surface still constructs
    wire_format_decoder(
        {
            "a": (1, "string"),
            "b": (2, "long"),
            "c": (3, "int"),
            "d": (4, "double"),
            "e": (5, "float"),
            "f": (6, "boolean"),
            "g": (7, "binary"),
            "h": (8, "array<string>"),
            "i": (9, "array<long>"),
            "j": (10, "array<int>"),
            "k": (11, "array<double>"),
            "m": (12, {"x": (1, "long")}),
        }
    )


def test_subseq_matcher_rejects_length_one():
    """length=1 is a power of two but degenerate twice over: every
    1-window has std 0 (can never match), and the state slice
    vc[-(1-1):] == vc[-0:] is the WHOLE series — unbounded state that
    violates the documented 'last length-1 values' contract."""
    with pytest.raises(AssertionError, match="length 1 is"):
        make_subseq_matcher(1, [0.0], 1e9)
    # the smallest legal window still constructs
    make_subseq_matcher(2, [0.0, 0.0], 1e9)


def test_drift_state_guard_loud_on_decorrelated_blowup(spark):
    """Drive the cap path on a decorrelated corpus shape: per-epoch
    DISJOINT vocabularies make state rows = epochs x pairs-per-epoch
    (nothing shared to bound it). The guard must raise loudly, naming
    the hand-offs, never silently truncate; under the ceiling it is a
    pass-through."""
    rows = [
        (epoch, f"e{epoch}_w{i}", f"e{epoch}_w{i + 1}", 1)
        for epoch in range(4)
        for i in range(8)
    ]
    state = spark.createDataFrame(
        rows, "epoch long, a string, b string, n long"
    )
    with pytest.raises(ValueError, match="ceiling"):
        _drift_state_guard(state, max_rows=16)
    assert _drift_state_guard(state, max_rows=32) is state


def test_clean_corpus_drop_list_carries_no_broadcast_hint(spark, sf_dir):
    """pipeline_clean_corpus's drop list is corpus-shaped on real
    crawls (30-60% near-dup rates), so the anti-join must NOT force a
    broadcast — AQE decides from the measured size at runtime (r10
    VERDICT item 2). Pin it at the logical-plan level: a broadcast()
    hint survives analysis as ResolvedHint/UnresolvedHint nodes, and
    the plan must carry none."""
    from kafka_parquet_writer_spark.operators.pipeline import (
        pipeline_clean_corpus,
    )

    df = pipeline_clean_corpus(spark, sf_dir)
    logical = df._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in logical and "UnresolvedHint" not in logical


def test_rag_passage_window_geometry(spark, sf_dir):
    """Pin the end-anchored windowing contract on the real fixture:
    per document — contiguous passage_seq from 0; start 0 first;
    strictly increasing starts; every passage exactly min(W, n)
    tokens (the retrieval-shaped property text_chunk does NOT have);
    middle starts stride-aligned; the last window ends at the
    document's final token (full coverage, no tail fragment)."""
    from kafka_parquet_writer_spark.functions import texthash as TH
    from kafka_parquet_writer_spark.operators.rag_prep import (
        PASSAGE_STRIDE as S,
        PASSAGE_TOKENS as W,
        rag_passage_windows,
    )
    from kafka_parquet_writer_spark.catalog import load_table

    out = rag_passage_windows(spark, sf_dir).collect()
    lens = {
        r["doc_id"]: r["n"]
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", F.size(TH.words_expr("text")).alias("n"))
        .collect()
    }
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert by_doc, "fixture produced no passages"
    for doc_id, rows in by_doc.items():
        n = lens[doc_id]
        rows.sort(key=lambda r: r.passage_seq)
        assert [r.passage_seq for r in rows] == list(range(len(rows)))
        starts = [r.start_tok for r in rows]
        assert starts[0] == 0
        assert starts == sorted(set(starts)), "start collision"
        assert all(r.n_tok == min(W, n) for r in rows)
        # middle windows stride-aligned; last end-anchored
        for k, st in enumerate(starts[:-1]):
            assert st == k * S
        assert starts[-1] + rows[-1].n_tok == n or (
            n <= W and starts == [0]
        )


def test_rag_shard_manifest_accounts_for_whole_vocabulary(spark, sf_dir):
    """The shard manifests must partition the vocabulary exactly:
    shard term counts sum to the distinct-token count, postings sum
    to the distinct (doc, token) pair count, and every shard id is in
    [0, RAG_INDEX_SHARDS)."""
    from kafka_parquet_writer_spark.functions import texthash as TH
    from kafka_parquet_writer_spark.operators.rag_prep import (
        RAG_INDEX_SHARDS,
        rag_shard_manifest,
    )
    from kafka_parquet_writer_spark.catalog import load_table

    man = rag_shard_manifest(spark, sf_dir).collect()
    dt = (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.explode(F.array_distinct(TH.words_expr("text"))).alias("t"),
        )
    )
    n_vocab = dt.select("t").distinct().count()
    n_pairs = dt.count()
    assert sum(r.n_terms for r in man) == n_vocab
    assert sum(r.n_postings for r in man) == n_pairs
    assert all(0 <= r.shard_id < RAG_INDEX_SHARDS for r in man)
    assert all(r.min_token <= r.max_token for r in man)


def test_rag_passage_windows_exhaustive_boundary_lengths(spark, tmp_path):
    """Boundary-length sweep the fixture cannot supply: one document
    of EVERY token count n = 1..130 — covering n < W, n == W, the
    n−W ≡ 0 (mod S) zone where the end-anchored last start lands
    exactly on a stride boundary (the collision the (n_pass−2)·S <
    n−W argument rules out), and 3-window documents — run through the
    REAL Spark plan and compared exactly against a five-line Python
    model of the arithmetic. The DuckDB oracle checks fixture
    lengths; this pins the branches the fixture happens not to
    contain."""
    from kafka_parquet_writer_spark.operators.rag_prep import (
        PASSAGE_STRIDE as S,
        PASSAGE_TOKENS as W,
        rag_passage_windows,
    )

    rows = [(n, " ".join(f"w{i}" for i in range(n))) for n in range(1, 131)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.write.parquet(str(tmp_path / "documents.parquet"))
    out = rag_passage_windows(spark, str(tmp_path)).collect()
    got: dict[int, list] = {}
    for r in out:
        got.setdefault(r.doc_id, []).append(
            (r.passage_seq, r.start_tok, r.n_tok)
        )
    for n in range(1, 131):
        n_pass = 1 + (-(-(n - W) // S) if n > W else 0)
        starts = [k * S for k in range(n_pass - 1)] + [max(n - W, 0)]
        # model self-checks: strictly increasing starts (no
        # collisions even when S divides n−W) and end-anchoring
        assert starts == sorted(set(starts)), f"model collision n={n}"
        assert starts[-1] + min(W, n) == n
        want = [(k, st, min(W, n)) for k, st in enumerate(starts)]
        assert sorted(got[n]) == want, f"n={n}"


def test_approx_quantile_rank_gate_holds_at_tiny_n(spark, tmp_path):
    """The r11 review's live repro, pinned: at n = 50 with distinct
    values (i²) the interpolated p±0.01 band edges are narrower than
    one element gap, so the previous interpolated-band gate flipped
    false on a RANK-EXACT sketch answer; n = 10 flipped both gates.
    The rank-interval gate must hold at every group size, including
    the degenerate n = 2."""
    from kafka_parquet_writer_spark.operators.governance import (
        agg_approx_quantile,
    )

    rows = [("g50", float(i * i)) for i in range(1, 51)]
    rows += [("g10", float(i * i)) for i in range(1, 11)]
    rows += [("g2", 1.0), ("g2", 2.0)]
    df = spark.createDataFrame(rows, "event_type string, value double")
    df.write.parquet(str(tmp_path / "events.parquet"))
    out = {
        r.event_type: r
        for r in agg_approx_quantile(spark, str(tmp_path)).collect()
    }
    assert set(out) == {"g50", "g10", "g2"}
    assert all(r.approx_in_rank_band for r in out.values()), out


def test_subseq_matcher_chunking_invariance_property():
    """Micro-batch boundaries must NEVER change what the stateful
    matcher emits: for random in-order series and random chunkings,
    the concatenated per-batch emissions equal the single-batch run.
    Generalizes test_round10_ops' fixed two-batch agreement into a
    property — the state hand-off (tail carry + tail-window
    exclusion) is exactly what varies with the chunking."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from test_round10_ops import _rows, _run
    from kafka_parquet_writer_spark.operators.streaming_queries import (
        make_subseq_matcher,
    )

    L = 4
    q = [-0.57735, 1.732051, -0.57735, -0.57735]

    @settings(max_examples=60, deadline=None)
    @given(
        st.lists(
            st.floats(
                min_value=-100, max_value=100,
                allow_nan=False, allow_infinity=False,
            ),
            min_size=L,
            max_size=24,
        ),
        st.data(),
    )
    def prop(series, data):
        rows = _rows(series)
        cuts = data.draw(
            st.lists(
                st.integers(min_value=1, max_value=len(rows) - 1),
                max_size=4,
                unique=True,
            ).map(sorted)
        )
        bounds = [0] + cuts + [len(rows)]
        batches = [
            rows[a:b] for a, b in zip(bounds, bounds[1:]) if a < b
        ]
        single, _ = _run(make_subseq_matcher(L, q, 1e9), (1,), [rows])
        chunked, _ = _run(make_subseq_matcher(L, q, 1e9), (1,), batches)
        assert sum(chunked, []) == single[0]

    prop()


def test_train_corpus_flagged_list_no_broadcast_but_rates_hinted(spark, sf_dir):
    """pipeline_train_corpus's decontamination flag list is
    corpus-derived (1-10% contamination rates are routine on large
    crawls), so its anti-join must NOT force a broadcast — the same
    class as clean_corpus's drop list. The mixture RATE table the
    pipeline also joins IS legitimately hinted (|langs| rows), so the
    assertion counts hint nodes rather than banning them outright:
    every surviving hint must be on a grouped-aggregate input, never
    on the flagged doc list."""
    from kafka_parquet_writer_spark.operators.pipeline import (
        pipeline_train_corpus,
    )

    df = pipeline_train_corpus(spark, sf_dir)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    anti = analyzed.split("LeftAnti")
    assert len(anti) >= 2, "expected the decontamination anti-join"
    # a broadcast() on the flag list would surface as a ResolvedHint
    # heading the anti-join's right child — the text immediately after
    # the join header
    assert "ResolvedHint" not in anti[1][:400]
