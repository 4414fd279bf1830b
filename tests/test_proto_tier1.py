"""Tier-1 protobuf decode (from_protobuf + descriptor set).

The reference decodes every record with a compiled proto parser
(`KafkaProtoParquetWriter.java:269-277`). Tier 1 here is spark-protobuf,
whose jar is not in this image — so the end-to-end test self-skips on
the PROTOBUF_NOT_LOADED error and runs for real wherever the jar is
present (e.g. `--packages org.apache.spark:spark-protobuf_2.13:...`).
The descriptor-set builder itself (no protoc needed) is validated
unconditionally with the in-repo wire-format parser.
"""

import os
import tempfile

import pytest

from kafka_parquet_writer_spark.sources.decoders import (
    build_file_descriptor_set,
    encode_wire_format,
    parse_wire_format,
    proto_decoder,
)

REF_FIELDS = [
    # the reference test schema (src/test/resources/test-message.proto:5-10)
    ("query", 1, "string"),
    ("timestamp", 2, "int64"),
    ("pgsize", 3, "int32"),
    ("offset", 4, "int32"),
]


def test_descriptor_set_structure_parses():
    """The hand-built FileDescriptorSet must be structurally valid
    protobuf: outer file entry, package/name/syntax strings, one
    message with the four fields at the right numbers/types."""
    blob = build_file_descriptor_set("TestMessage", REF_FIELDS)
    fds = parse_wire_format(blob)
    assert list(fds) == [1]  # FileDescriptorSet.file
    fdp = parse_wire_format(fds[1][0])
    assert fdp[2][0] == b"kpws"  # package
    assert fdp[12][0] == b"proto3"  # syntax
    msg = parse_wire_format(fdp[4][0])  # message_type
    assert msg[1][0] == b"TestMessage"
    got_fields = [parse_wire_format(f) for f in msg[2]]
    assert [(f[1][0].decode(), f[3][0]) for f in got_fields] == [
        (name, num) for name, num, _ in REF_FIELDS
    ]
    # string=9, int64=3, int32=5
    assert [f[5][0] for f in got_fields] == [9, 3, 5, 5]


def test_from_protobuf_roundtrip_when_jar_present(spark):
    """End-to-end tier-1 decode of reference-shaped messages. Skips
    (does not silently pass) when the spark-protobuf jar is absent."""
    desc = build_file_descriptor_set("TestMessage", REF_FIELDS)
    path = os.path.join(tempfile.mkdtemp(prefix="kpws_desc_"), "desc.bin")
    with open(path, "wb") as f:
        f.write(desc)
    msgs = [
        {1: "q-0", 2: 1_700_000_000_000, 3: 7, 4: 0},
        {1: "q-1", 2: -5, 3: -1, 4: 1},  # negative int64/int32
    ]
    df = spark.createDataFrame(
        [(encode_wire_format(m),) for m in msgs], "value binary"
    )
    decode = proto_decoder(path, "kpws.TestMessage")
    try:
        rows = sorted(decode(df).collect(), key=lambda r: r.offset)
    except Exception as e:  # noqa: BLE001
        if "PROTOBUF_NOT_LOADED" in str(e):
            pytest.skip("spark-protobuf jar not on the classpath")
        raise
    assert [(r.query, r.timestamp, r.pgsize) for r in rows] == [
        ("q-0", 1_700_000_000_000, 7),
        ("q-1", -5, -1),
    ]
