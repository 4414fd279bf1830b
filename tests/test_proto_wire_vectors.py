"""Known-answer vectors from the PUBLIC protobuf encoding spec
(protobuf.dev/programming-guides/encoding — the same byte examples the
reference's parquet-proto stack is written against).

Every pre-existing tier-2 test round-trips through our own
encode_wire_format, so a SYMMETRIC codec bug (both sides wrong the
same way) would pass them all while disagreeing with every real
protobuf producer — exactly the reference's input
(`KafkaProtoParquetWriter.java:271` parses real parser.parseFrom
bytes). These vectors pin both directions against byte sequences
published in the spec itself; no Spark session needed.
"""

import struct

from kafka_parquet_writer_spark.sources.decoders import (
    _extract,
    encode_wire_format,
    parse_wire_format,
)


def _one(data: bytes, fnum: int, ftype):
    return _extract(parse_wire_format(data), fnum, ftype)


def test_varint_150_canonical():
    # the spec's `Test1` walkthrough: field 1 varint 150 -> 08 96 01
    data = bytes.fromhex("089601")
    assert _one(data, 1, "long") == 150
    assert _one(data, 1, "int") == 150
    assert encode_wire_format({1: 150}) == data


def test_string_testing_canonical():
    # `Test2`: field 2 string "testing" -> 12 07 74 65 73 74 69 6e 67
    data = bytes.fromhex("120774657374696e67")
    assert _one(data, 2, "string") == "testing"
    assert encode_wire_format({2: "testing"}) == data


def test_nested_message_canonical():
    # `Test3`: field 3 = submessage{field 1 varint 150} -> 1a 03 08 96 01
    data = bytes.fromhex("1a03089601")
    assert _one(data, 3, {"a": (1, "long")}) == {"a": 150}
    assert encode_wire_format({3: {1: 150}}) == data


def test_packed_repeated_canonical():
    # the spec's packed example: field 6 repeated int32 [3, 270, 86942]
    # -> 32 06 03 8e 02 9e a7 05
    data = bytes.fromhex("3206038e029ea705")
    assert _one(data, 6, "array<long>") == [3, 270, 86942]
    assert encode_wire_format({6: [3, 270, 86942]}) == data


def test_unpacked_repeated_same_values():
    # the same field as three bare varint occurrences (proto2 unpacked
    # form; the spec requires parsers to accept both encodings)
    data = bytes.fromhex("3003308e02309ea705")
    assert _one(data, 6, "array<long>") == [3, 270, 86942]


def test_negative_int64_ten_byte_varint():
    # the spec: negative int32/int64 encode as 64-bit two's complement,
    # always 10 bytes -> field 1 value -2 is 08 fe ff ff ff ff ff ff ff ff 01
    data = bytes.fromhex("08feffffffffffffffff01")
    assert _one(data, 1, "long") == -2
    assert encode_wire_format({1: -2}) == data


def test_bool_true_canonical():
    # bool is a varint 0/1: field 1 true -> 08 01
    assert _one(bytes.fromhex("0801"), 1, "boolean") is True
    assert _one(bytes.fromhex("0800"), 1, "boolean") is False


def test_double_ieee_bits_canonical():
    # double is wire type 1 (I64), little-endian IEEE-754:
    # field 1 = 1.0 -> 09 00 00 00 00 00 00 f0 3f
    data = bytes.fromhex("09000000000000f03f")
    assert _one(data, 1, "double") == 1.0
    assert encode_wire_format({1: 1.0}) == data
    # and a non-trivial value, bytes built independently via struct
    bits = struct.pack("<d", -2.5).hex()
    assert _one(bytes.fromhex("09" + bits), 1, "double") == -2.5


def test_float_ieee_bits_canonical():
    # float is wire type 5 (I32): field 1 = 1.0 -> 0d 00 00 80 3f
    assert _one(bytes.fromhex("0d0000803f"), 1, "float") == 1.0


def test_bytes_field_canonical():
    # bytes shares the LEN wire type with string: field 2 = 00 ff
    data = bytes.fromhex("120200ff")
    assert _one(data, 2, "binary") == b"\x00\xff"


def test_field_order_independence():
    # the spec: fields may appear in any order; last occurrence wins
    # for singular scalars. field 1 appears twice around field 2.
    data = bytes.fromhex("0801") + bytes.fromhex("120774657374696e67")
    data += bytes.fromhex("089601")
    parsed = parse_wire_format(data)
    assert _extract(parsed, 1, "long") == 150
    assert _extract(parsed, 2, "string") == "testing"
