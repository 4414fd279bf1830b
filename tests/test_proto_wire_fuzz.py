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
    ],
)
def test_mismatch_raises_value_error_only(hexdata):
    with pytest.raises(ValueError):
        _decode_row(bytes.fromhex(hexdata))


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
