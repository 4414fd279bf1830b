"""Adversarial wire-format bytes against the tier-2 decoder's DLQ
contract: a malformed OR schema-mismatched record must land as an
all-null row — never crash the executor, never silently misdecode.

Before the r11 hardening, four mismatch shapes escaped the wrapper's
``except ValueError``:
  - varint occurrence for a declared string  → AttributeError
    (``int.decode``),
  - varint occurrence for a declared nested message / binary →
    ``bytes(huge_int)`` ALLOCATES that many zero bytes (a 10-byte
    varint can demand a terabyte → MemoryError),
  - LEN occurrence of digit bytes for a declared double →
    ``int(b"123")`` parses and reinterprets as IEEE bits (silent
    garbage, no exception at all),
  - numeric occurrence ≥ 2^32 for a declared float →
    OverflowError from ``to_bytes(4)``;
and un-masked 10-byte varints could exceed 64 bits (the spec drops
the 10th byte's overflow bits) and crash Arrow int64 conversion.
"""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kafka_parquet_writer_spark.sources.decoders import (
    _extract,
    parse_wire_format,
    wire_format_decoder,
)

SCHEMA = {
    "s": (1, "string"),
    "n": (2, "long"),
    "d": (3, "double"),
    "f": (4, "float"),
    "b": (5, "boolean"),
    "raw": (6, "binary"),
    "tags": (7, "array<string>"),
    "xs": (8, "array<long>"),
    "ds": (9, "array<double>"),
    "sub": (10, {"a": (1, "long")}),
    # r12: declared int32 columns — the r11 ADVICE hole: a varint
    # outside int32 range passed _want_word(v, 64) and crashed Arrow
    # conversion instead of truncating (parseFrom `(int)` cast) and
    # the fuzz SCHEMA had no int column to catch it
    "i": (11, "int"),
    "ns": (12, "array<int>"),
}


def _decode_row(data: bytes):
    parsed = parse_wire_format(data)
    return {
        name: _extract(parsed, fnum, ftype)
        for name, (fnum, ftype) in SCHEMA.items()
    }


# ---------------------------------------------------- targeted mismatches

#: canonical max varint: ten bytes, all continuation bits set
TEN_FF = bytes.fromhex("ffffffffffffffffff7f")


@pytest.mark.parametrize(
    "hexdata",
    [
        "0801",  # varint where field 1 is declared string
        "52ffffffffffffffffff7f",  # max ten-byte varint for field 10
        # (nested message): bytes(huge) would allocate
        "1a03313233",  # LEN b"123" where field 3 is declared double:
        # int(b"123") parses — the silent-garbage path
        "20ffffffffff07",  # varint 2^39-ish for field 4 (float):
        # to_bytes(4) would raise OverflowError
        "3001",  # varint for field 6 (binary)
        "3803",  # varint for field 7 (array<string>)
        # r12 (ADVICE low): wire-width mismatches for float/double —
        # each previously reinterpreted bits silently
        "1801",  # varint 1 for field 3 (double): would decode 5e-324
        "1d00000040",  # I32 for field 3 (double): 4-byte denormal
        "2001",  # small varint for field 4 (float): garbage bits
        "210000000000000040",  # I64 for field 4 (float)
        "4d0000803f",  # unpacked I32 occurrence for field 9
        # (array<double>)
    ],
)
def test_mismatch_raises_value_error_only(hexdata):
    with pytest.raises(ValueError):
        _decode_row(bytes.fromhex(hexdata))


def test_int32_truncates_like_parsefrom():
    """Declared int32: parseFrom reads the 64-bit varint then keeps
    the low 32 bits signed (the Java `(int)` cast). 2^40 must land as
    0 in the row — before r12 it crashed Arrow int32 conversion
    (ArrowInvalid is not ValueError → executor crash, r11 ADVICE)."""
    # field 11 (int), varint 2^40 = hex 80 80 80 80 80 20
    assert _decode_row(bytes.fromhex("58808080808020"))["i"] == 0
    # 2^40 + 5 → low 32 bits = 5
    assert _decode_row(bytes.fromhex("58858080808020"))["i"] == 5
    # 0xFFFFFFFF → -1; 2^31 → INT_MIN
    assert _decode_row(bytes.fromhex("58ffffffff0f"))["i"] == -1
    assert _decode_row(bytes.fromhex("588080808008"))["i"] == -(1 << 31)
    # negative int32 on the wire is the 10-byte 64-bit form
    assert _decode_row(bytes.fromhex("58feffffffffffffffff01"))["i"] == -2
    # array<int> (field 12), packed: [2^40+5, 0xFFFFFFFF] → [5, -1]
    payload = bytes.fromhex("858080808020") + bytes.fromhex("ffffffff0f")
    packed = bytes.fromhex("62") + bytes([len(payload)]) + payload
    assert _decode_row(packed)["ns"] == [5, -1]


def test_mismatched_rows_land_in_dlq_not_crash(spark):
    """End-to-end through mapInPandas: one good row, one wire-type-
    mismatched row (varint where string is declared), one huge-varint
    nested-field row. The mismatches must be all-null rows beside the
    good row — the executor must survive."""
    good = bytes.fromhex("0a0268691002")  # s="hi", n=2
    bad_string = bytes.fromhex("0801")
    bad_nested = bytes.fromhex("52") + TEN_FF
    df = spark.createDataFrame(
        [(good,), (bad_string,), (bad_nested,)], "value binary"
    )
    decoder = wire_format_decoder(SCHEMA)
    rows = decoder(df).collect()
    assert len(rows) == 3
    by_s = {r.s: r for r in rows}
    assert by_s["hi"].n == 2
    nulls = [r for r in rows if r.s is None]
    assert len(nulls) == 2
    assert all(r.n is None and r.sub is None for r in nulls)


def test_ten_byte_varint_masks_to_64_bits():
    """The spec: overflow bits of the 10th byte are DROPPED. The
    all-ones ten-byte varint is exactly uint64 max → int64 -1; before
    the mask it decoded to a ~2^70 python int that Arrow cannot hold."""
    data = bytes.fromhex("10") + TEN_FF  # field 2 (long)
    assert _decode_row(data)["n"] == -1
    packed = bytes.fromhex("420a") + TEN_FF  # field 8 array<long>, packed
    assert _decode_row(packed)["xs"] == [-1]


# ------------------------------------------------------------ fuzz sweep


@settings(max_examples=300, deadline=None)
@given(st.binary(min_size=0, max_size=64))
def test_arbitrary_bytes_decode_or_value_error(data):
    """The DLQ dichotomy, fuzzed: any byte string either decodes to a
    typed row or raises ValueError — no other exception type may
    escape (anything else is an executor crash in production)."""
    try:
        row = _decode_row(data)
    except ValueError:
        return
    assert set(row) == set(SCHEMA)
    n = row["n"]
    if n is not None:
        assert -(1 << 63) <= n < (1 << 63)
    for x in row["xs"]:
        assert -(1 << 63) <= x < (1 << 63)
    i = row["i"]
    if i is not None:
        assert -(1 << 31) <= i < (1 << 31)
    for x in row["ns"]:
        assert -(1 << 31) <= x < (1 << 31)


# ------------------------------------------------- structured round-trip


@settings(max_examples=200, deadline=None)
@given(
    s=st.text(max_size=12),
    n=st.integers(min_value=-(1 << 63), max_value=(1 << 63) - 1),
    i=st.integers(min_value=-(1 << 31), max_value=(1 << 31) - 1),
    d=st.floats(allow_nan=False),
    b=st.booleans(),
    raw=st.binary(max_size=16),
    tags=st.lists(st.text(max_size=6), max_size=4),
    xs=st.lists(
        st.integers(min_value=-(1 << 63), max_value=(1 << 63) - 1),
        max_size=4,
    ),
    ds=st.lists(st.floats(allow_nan=False), max_size=4),
    sub=st.integers(min_value=-(1 << 63), max_value=(1 << 63) - 1),
)
def test_structured_round_trip(s, n, i, d, b, raw, tags, xs, ds, sub):
    """Well-formed messages must decode EXACTLY — the complement of
    the adversarial sweep above and of the spec-byte-vector pins:
    random in-range values per declared type, through our own encoder
    (its conventions match the spec forms the vectors pin: 64-bit
    two's-complement varints, I64 doubles, packed repeated scalars,
    repeated LEN strings, nested LEN messages). Guards the mismatch
    hardening against over-rejection: tightening the wire-type checks
    must never start DLQ-ing valid rows."""
    from kafka_parquet_writer_spark.sources.decoders import (
        encode_wire_format,
    )

    fields = {1: s, 2: n, 3: float(d), 5: int(b), 6: raw,
              7: tags, 8: xs, 9: [float(x) for x in ds],
              10: {1: sub}, 11: i}
    # the encoder skips empty strings/bytes/lists at the occurrence
    # level only for lists; scalar empties still encode as LEN 0
    row = _decode_row(encode_wire_format(fields))
    assert row["s"] == s
    assert row["n"] == n
    assert row["i"] == i
    assert row["d"] == d or (row["d"] != row["d"]) == (d != d)
    assert row["b"] is b
    assert row["raw"] == raw
    assert row["tags"] == tags
    assert row["xs"] == xs
    assert row["ds"] == [float(x) for x in ds]
    assert row["sub"] == {"a": sub}
