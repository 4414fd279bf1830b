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
    raises loudly on a decorrelated state blow-up (VERDICT item 6).
"""

import pytest

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
