"""Binary-value decoders: the Spark equivalents of the reference's one
per-record transform, ``parser.parseFrom(record.value())``
(`KafkaProtoParquetWriter.java:269-277`).

Three tiers, best available wins:

1. ``proto_decoder`` — `from_protobuf` (pyspark.sql.protobuf): JVM-side,
   codegen-friendly. Needs the spark-protobuf jar + a compiled
   descriptor set; this container has neither, so it raises a clear
   error at call time and exists for real deployments.
2. ``wire_format_decoder`` — a minimal pure-Python protobuf wire-format
   reader (varints + length-delimited fields — the public wire spec)
   run through Arrow-batched ``mapInPandas``. Dependency-free and fully
   tested here; handles the reference test schema shape
   (`src/test/resources/test-message.proto:5-10`: string/int64/int32s).
3. ``json_decoder`` — `from_json` for JSON-encoded values (JVM-side).

Malformed-record policy: the reference CRASHES the worker on a parse
error with an acknowledged TODO for a dead-letter queue (:272-277).
Here malformed records decode to null fields and can be routed with a
``decoded IS NULL`` filter — the DLQ the reference never built.

Tier-1/tier-2 divergence on wire-type-vs-schema mismatches (r13
ADVICE, documented as the contract rather than papered over): tier-2
DLQs the WHOLE ROW (all declared fields null) when ANY occurrence's
wire type contradicts the declared schema — a LEN payload on a numeric
field, a fixed32/fixed64 occurrence on a varint-family field, a
varint where LEN is declared. protobuf-java (tier-1 ``from_protobuf``)
instead treats a wire-type-mismatched occurrence as an UNKNOWN FIELD:
it is skipped and the siblings still decode. The tier-2 choice is
deliberate: a type confusion on one field is evidence the bytes are
not the declared message at all (another schema, corruption, a
producer bug), and silently shipping the sibling fields would launder
half-decoded garbage past the ``decoded IS NULL`` DLQ filter. Inputs
whose occurrences all match the declared wire types decode
identically on both tiers (spec-vector + fuzz pinned); inputs that
differ are exactly the rows tier-2 routes to the DLQ and tier-1
partially decodes.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

# --- tier 1: spark-protobuf (gated) ---------------------------------------


def proto_decoder(
    descriptor_file: str, message_name: str, value_col: str = "value"
):
    """from_protobuf-based decoder factory. Raises at call time if the
    spark-protobuf jar isn't on the classpath (it is not in this image).
    """

    def decode(df: DataFrame) -> DataFrame:
        from pyspark.sql.protobuf.functions import from_protobuf

        decoded = from_protobuf(
            F.col(value_col), message_name, descFilePath=descriptor_file
        )
        return df.withColumn("decoded", decoded).select("decoded.*")

    return decode


#: FieldDescriptorProto.Type values (descriptor.proto, public spec)
_PROTO_FIELD_TYPES = {
    "double": 1,
    "int64": 3,
    "int32": 5,
    "bool": 8,
    "string": 9,
    "bytes": 12,
}


def build_file_descriptor_set(
    message_name: str,
    fields: list[tuple[str, int, str]],
    package: str = "kpws",
    filename: str = "kpws_generated.proto",
    nested: dict[str, list[tuple[str, int, str]]] | None = None,
) -> bytes:
    """Hand-encode a ``FileDescriptorSet`` for one proto3 message —
    the descriptor input ``from_protobuf`` needs — without protoc.

    ``fields``: [(field_name, field_number, type)]; type is a scalar
    from ``_PROTO_FIELD_TYPES``, optionally prefixed ``repeated ``
    (LABEL_REPEATED), or ``message:<Name>`` referencing an entry in
    ``nested`` (a two-level message — the reference's own test schema
    is flat scalars only, `src/test/resources/test-message.proto:5-10`,
    but parquet-protobuf passes nested groups straight through,
    `ParquetFile.java:97-99`, so the decode path must cover them).
    ``nested``: {NestedName: fields} — emitted as
    ``DescriptorProto.nested_type``; message-typed fields get
    ``type_name = .<package>.<message_name>.<NestedName>``.

    descriptor.proto's own wire layout is the stable public protobuf
    spec, so emitting it with the same varint / length-delimited
    primitives the tier-2 reader uses is ~40 lines. The resulting
    message's full name is ``<package>.<message_name>``.
    """

    def varint(v: int) -> bytes:
        out = bytearray()
        while True:
            b = v & 0x7F
            v >>= 7
            if v:
                out.append(b | 0x80)
            else:
                out.append(b)
                return bytes(out)

    def ld(fnum: int, payload: bytes) -> bytes:  # length-delimited field
        return varint((fnum << 3) | _LEN) + varint(len(payload)) + payload

    def vint(fnum: int, v: int) -> bytes:  # varint field
        return varint((fnum << 3) | _VARINT) + varint(v)

    def field_proto(name: str, number: int, ftype: str) -> bytes:
        label = 1  # LABEL_OPTIONAL
        if ftype.startswith("repeated "):
            label = 3  # LABEL_REPEATED
            ftype = ftype[len("repeated "):]
        body = (
            ld(1, name.encode())  # FieldDescriptorProto.name
            + vint(3, number)  # .number
            + vint(4, label)  # .label
        )
        if ftype.startswith("message:"):
            tname = f".{package}.{message_name}.{ftype[len('message:'):]}"
            body += vint(5, 11)  # .type = TYPE_MESSAGE
            body += ld(6, tname.encode())  # .type_name (fully qualified)
        else:
            body += vint(5, _PROTO_FIELD_TYPES[ftype])  # .type
        return ld(2, body)  # DescriptorProto.field

    field_protos = b"".join(field_proto(*f) for f in fields)
    nested_protos = b""
    for nname, nfields in (nested or {}).items():
        nested_protos += ld(  # DescriptorProto.nested_type
            3,
            ld(1, nname.encode())
            + b"".join(field_proto(*f) for f in nfields),
        )
    message_type = ld(1, message_name.encode()) + field_protos + nested_protos
    file_proto = (
        ld(1, filename.encode())  # FileDescriptorProto.name
        + ld(2, package.encode())  # .package
        + ld(4, message_type)  # .message_type
        + ld(12, b"proto3")  # .syntax
    )
    return ld(1, file_proto)  # FileDescriptorSet.file


# --- tier 2: pure-Python wire-format reader --------------------------------

#: wire types of the protobuf encoding (public spec)
_VARINT, _I64, _LEN, _I32 = 0, 1, 2, 5


class _Fixed32(int):
    """An I32 occurrence, tagged with its wire type. Plain ``int``
    everywhere ints are accepted, but lets declared float/double
    reject cross-width occurrences (a 4-byte int reinterpreted as an
    8-byte IEEE double is silent garbage — r11 ADVICE) the way real
    parsers treat a wire-type mismatch: not as the declared field."""

    __slots__ = ()


class _Fixed64(int):
    """An I64 occurrence, tagged with its wire type (see _Fixed32)."""

    __slots__ = ()


def parse_wire_format(data: bytes) -> dict[int, list]:
    """Parse top-level protobuf fields → {field_number: [raw values]}.

    varint fields decode to int; length-delimited to bytes; fixed32/64
    to _Fixed32/_Fixed64 (int subclasses tagging the wire type,
    little-endian). Raises ValueError on truncation — callers map
    that to null rows (DLQ policy).
    """
    out: dict[int, list] = {}
    i, n = 0, len(data)

    def varint() -> int:
        nonlocal i
        shift = result = 0
        while True:
            if i >= n:
                raise ValueError("truncated varint")
            b = data[i]
            i += 1
            result |= (b & 0x7F) << shift
            if not b & 0x80:
                # mask to 64 bits: the 10th byte's high bits overflow
                # the word and real parsers DROP them — without this,
                # a hostile 10-byte varint yields an int up to ~2^70
                # that crashes to_bytes(8)/Arrow int64 downstream
                # instead of landing in the DLQ null row
                return result & 0xFFFFFFFFFFFFFFFF
            shift += 7
            if shift > 63:
                raise ValueError("varint too long")

    while i < n:
        tag = varint()
        fnum, wtype = tag >> 3, tag & 7
        if wtype == _VARINT:
            val = varint()
        elif wtype == _LEN:
            ln = varint()
            if i + ln > n:
                raise ValueError("truncated bytes field")
            val = data[i : i + ln]
            i += ln
        elif wtype == _I64:
            if i + 8 > n:
                raise ValueError("truncated fixed64")
            val = _Fixed64(int.from_bytes(data[i : i + 8], "little"))
            i += 8
        elif wtype == _I32:
            if i + 4 > n:
                raise ValueError("truncated fixed32")
            val = _Fixed32(int.from_bytes(data[i : i + 4], "little"))
            i += 4
        else:
            raise ValueError(f"unsupported wire type {wtype}")
        out.setdefault(fnum, []).append(val)
    return out


def encode_wire_format(fields: dict[int, object]) -> bytes:
    """Inverse of parse_wire_format — used by tests to produce
    reference-shaped messages without protoc. Beyond ints/strings/
    bytes: a ``dict`` value encodes as a nested sub-message (LEN), a
    ``list`` of ints as a PACKED repeated field (proto3's default
    scalar encoding), and a ``list`` of strings as repeated LEN
    occurrences."""
    out = bytearray()

    def put_varint(v: int) -> None:
        while True:
            b = v & 0x7F
            v >>= 7
            if v:
                out.append(b | 0x80)
            else:
                out.append(b)
                return

    def put_len(fnum: int, raw: bytes) -> None:
        put_varint((fnum << 3) | _LEN)
        put_varint(len(raw))
        out.extend(raw)

    import struct

    for fnum, val in fields.items():
        if isinstance(val, bool):
            raise TypeError("encode bools as ints explicitly")
        if isinstance(val, float):
            # proto double: I64 wire type, little-endian IEEE bits
            put_varint((fnum << 3) | _I64)
            out.extend(struct.pack("<d", val))
        elif isinstance(val, int):
            put_varint((fnum << 3) | _VARINT)
            # proto int32/int64 encode negatives as 64-bit
            # two's-complement (always 10 bytes on the wire)
            put_varint(val & 0xFFFFFFFFFFFFFFFF)
        elif isinstance(val, dict):
            put_len(fnum, encode_wire_format(val))
        elif isinstance(val, list):
            if val and isinstance(val[0], float):
                put_len(fnum, struct.pack(f"<{len(val)}d", *val))
            elif val and isinstance(val[0], int):
                packed = bytearray()
                for v in val:
                    x = v & 0xFFFFFFFFFFFFFFFF
                    while True:
                        b = x & 0x7F
                        x >>= 7
                        if x:
                            packed.append(b | 0x80)
                        else:
                            packed.append(b)
                            break
                put_len(fnum, bytes(packed))
            else:
                for v in val:
                    put_len(
                        fnum,
                        v.encode() if isinstance(v, str) else bytes(v),
                    )
        else:
            raw = val.encode() if isinstance(val, str) else bytes(val)
            put_len(fnum, raw)
    return bytes(out)


def _signed(v: int) -> int:
    # varints are unsigned on the wire; proto int32/int64 negatives
    # arrive as 64-bit two's-complement (parser.parseFrom semantics;
    # without this they'd overflow Arrow int64)
    return v - (1 << 64) if v > 0x7FFFFFFFFFFFFFFF else v


def _int32(v: int) -> int:
    # declared int32: parseFrom reads the full 64-bit varint then
    # keeps the low 32 bits as a signed int (the Java `(int)` cast).
    # Without this, a hostile varint outside int32 range (e.g. 2^40)
    # passes the 64-bit check and crashes Arrow's int32 conversion —
    # an executor crash instead of a decoded row (r11 ADVICE medium).
    v &= 0xFFFFFFFF
    return v - (1 << 32) if v > 0x7FFFFFFF else v


def _varints_of(vals: list) -> list[int]:
    """Flatten repeated-varint occurrences: each occurrence is either a
    bare varint (unpacked) or a LEN payload of concatenated varints
    (packed — proto3's default for repeated scalars). Parsers must
    accept BOTH forms regardless of the declared packedness (public
    encoding spec), so this does."""
    out: list[int] = []
    for v in vals:
        if isinstance(v, (_Fixed32, _Fixed64)):
            # an unpacked fixed-width occurrence in a varint-declared
            # repeated field is a wire-type mismatch, same as the
            # singular path — treating its little-endian int as a
            # varint value silently misdecodes (r12 ADVICE)
            raise ValueError(
                "wire type mismatch: fixed32/fixed64 in repeated varint"
            )
        if isinstance(v, int):
            out.append(_signed(v))
            continue
        i, n = 0, len(v)
        while i < n:
            shift = result = 0
            while True:
                if i >= n:
                    raise ValueError("truncated packed varint")
                b = v[i]
                i += 1
                result |= (b & 0x7F) << shift
                if not b & 0x80:
                    break
                shift += 7
                if shift > 63:
                    raise ValueError("varint too long")
            # same 64-bit mask as the top-level parser: the 10th
            # byte's high bits overflow the word and must be dropped,
            # not handed to Arrow as a >int64 python int
            out.append(_signed(result & 0xFFFFFFFFFFFFFFFF))
    return out


def _doubles_of(vals: list) -> list[float]:
    """Flatten repeated-double occurrences: I64 occurrences arrive as
    raw bit-pattern ints (unpacked), LEN payloads as concatenated
    8-byte IEEE chunks (packed — proto3's default)."""
    import struct

    out: list[float] = []
    for v in vals:
        if isinstance(v, int):
            # only a true I64 occurrence carries double bits: a varint
            # or I32 occurrence reinterpreted here is silent garbage
            # (denormal from 4 bytes) — wire-type mismatch → DLQ
            if not isinstance(v, _Fixed64):
                raise ValueError(
                    "wire type mismatch: double requires I64 occurrence"
                )
            out.append(struct.unpack("<d", v.to_bytes(8, "little"))[0])
        else:
            if len(v) % 8:
                raise ValueError("truncated packed double")
            out.extend(struct.unpack(f"<{len(v) // 8}d", bytes(v)))
    return out


def _want_len(v) -> bytes:
    """Require a length-delimited occurrence (bytes). A varint/fixed
    occurrence where the schema declares string/bytes/message is a
    wire-type mismatch — raise ValueError so the row lands in the DLQ
    as all-null instead of crashing the executor: ``bytes(huge_int)``
    would try to ALLOCATE that many zero bytes (a 10-byte varint can
    demand a terabyte), and ``int.decode`` is an AttributeError the
    row wrapper does not (and should not) catch."""
    if isinstance(v, int):
        raise ValueError("wire type mismatch: varint/fixed where LEN expected")
    return bytes(v)


def _want_word(v, bits: int) -> int:
    """Require a VARINT occurrence that fits ``bits``. A LEN
    occurrence where the schema declares a numeric scalar is a
    mismatch (``int(b"123")`` would silently misdecode digit bytes),
    and so is a fixed-width I32/I64 occurrence: every type the tier-2
    table maps to this path (long/int/boolean → proto int64/int32/
    bool) is varint-encoded on the wire — the table has no fixed64/
    fixed32 entry, so a 4- or 8-byte occurrence here is another
    message's field, not a width-flexible encoding of ours, and
    reinterpreting its little-endian int is silent garbage (r12
    ADVICE: the float/double tag check left this family open).
    float/double demand the exact _Fixed32/_Fixed64 tag in _extract
    and never route through here."""
    if isinstance(v, (_Fixed32, _Fixed64)):
        raise ValueError(
            "wire type mismatch: fixed32/fixed64 where varint expected"
        )
    if not isinstance(v, int):
        raise ValueError("wire type mismatch: LEN where numeric expected")
    if v >> bits:
        raise ValueError(f"numeric occurrence exceeds {bits} bits")
    return v


def _extract(parsed: dict[int, list], fnum: int, ftype) -> object:
    """One typed column value from parsed wire fields. ``ftype`` is a
    scalar name, an ``array<...>`` of scalars, or a nested field_map
    dict (→ struct as a python dict; singular message fields take the
    LAST occurrence — the proto3 merge rule collapsed to last-wins for
    the scalar-leaf schemas this tier covers). Wire-type-vs-schema
    mismatches raise ValueError (→ DLQ null row), never executor-
    crashing exception types — pinned by the r11 fuzz tests."""
    vals = parsed.get(fnum)
    if isinstance(ftype, dict):
        if not vals:
            return None
        sub = parse_wire_format(_want_len(vals[-1]))
        return {
            name: _extract(sub, sfnum, sftype)
            for name, (sfnum, sftype) in ftype.items()
        }
    if ftype.startswith("array<"):
        if not vals:
            # proto3 repeated fields are NEVER null: zero occurrences
            # decode to the empty list, matching tier-1 from_protobuf
            # (tests assert list == [] on both tiers — an r10 ADVICE
            # divergence: tier fallback must not flip NULL semantics)
            return []
        elem = ftype[len("array<"):-1]
        if elem == "string":
            return [_want_len(v).decode("utf-8", "replace") for v in vals]
        if elem == "double":
            return _doubles_of(vals)
        if elem == "int":
            # per-element int32 truncation, same parseFrom cast as the
            # singular path (r11 ADVICE: 2^40 must not reach Arrow)
            return [_int32(x) for x in _varints_of(vals)]
        return _varints_of(vals)
    if not vals:
        return None
    if ftype == "string":
        return _want_len(vals[-1]).decode("utf-8", "replace")
    if ftype == "boolean":
        return bool(_want_word(vals[-1], 64))
    if ftype == "binary":
        return _want_len(vals[-1])
    if ftype == "double":
        # only an I64 occurrence carries double bits; a varint or I32
        # occurrence is a wire-type mismatch — real parsers treat it
        # as unknown, we DLQ the row (r11 ADVICE: the 4-byte-denormal
        # silent-misdecode path)
        import struct

        v = vals[-1]
        if not isinstance(v, _Fixed64):
            raise ValueError(
                "wire type mismatch: double requires I64 occurrence"
            )
        return struct.unpack("<d", v.to_bytes(8, "little"))[0]
    if ftype == "float":
        import struct

        v = vals[-1]
        if not isinstance(v, _Fixed32):
            raise ValueError(
                "wire type mismatch: float requires I32 occurrence"
            )
        return struct.unpack("<f", v.to_bytes(4, "little"))[0]
    if ftype == "int":
        return _int32(_want_word(vals[-1], 64))
    return _signed(_want_word(vals[-1], 64))


def _sql_type(ftype) -> str:
    if isinstance(ftype, dict):
        inner = ", ".join(
            f"{n}: {_sql_type(t)}" for n, (_, t) in ftype.items()
        )
        return f"struct<{inner}>"
    return ftype


#: scalar types the tier-2 wire reader decodes (the descriptor
#: builder's full table); array elements are the subset whose repeated
#: wire forms _extract actually distinguishes — anything else would
#: fall through to _varints_of and yield raw bit-pattern garbage
#: (r10 ADVICE), so construction rejects it instead.
_WIRE_SCALARS = frozenset(
    {"string", "long", "int", "double", "float", "boolean", "binary"}
)
_WIRE_ARRAY_ELEMS = frozenset({"string", "long", "int", "double"})


def _validate_field_map(field_map: dict[str, tuple[int, object]]) -> None:
    for name, (_, ftype) in field_map.items():
        if isinstance(ftype, dict):
            _validate_field_map(ftype)
            continue
        if ftype.startswith("array<"):
            elem = ftype[len("array<"):-1]
            if elem not in _WIRE_ARRAY_ELEMS:
                raise ValueError(
                    f"wire_format_decoder: unsupported array element "
                    f"{elem!r} for field {name!r} — supported: "
                    f"{sorted(_WIRE_ARRAY_ELEMS)} (others would "
                    f"misdecode as raw varints, never silently)"
                )
        elif ftype not in _WIRE_SCALARS:
            raise ValueError(
                f"wire_format_decoder: unsupported scalar type "
                f"{ftype!r} for field {name!r} — supported: "
                f"{sorted(_WIRE_SCALARS)}"
            )


def wire_format_decoder(
    field_map: dict[str, tuple[int, object]], value_col: str = "value"
):
    """mapInPandas decoder factory for proto messages.

    ``field_map``: output column → (proto field number, type). Type is
    "string" / "long" / "int" (the reference test schema,
    `test-message.proto:5-10`), "double" / "float" / "boolean" /
    "binary" (completing the descriptor builder's scalar table),
    "array<long|int|string|double>" for repeated fields (packed AND
    unpacked accepted; absent → [] — proto3 repeated fields are never
    null, matching tier-1 from_protobuf), or a nested field_map dict
    for a two-level message (→ struct column) — the shapes
    parquet-protobuf would pass through (`ParquetFile.java:97-99`).
    Unsupported types raise at construction time; malformed values
    yield all-null rows (vs reference crash, :272-277).
    """
    import pandas as pd

    _validate_field_map(field_map)
    names = list(field_map)
    schema = ", ".join(
        f"{name} {_sql_type(ftype)}"
        for name, (_, ftype) in field_map.items()
    )

    def decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            cols: dict[str, list] = {name: [] for name in names}
            for raw in pdf[value_col]:
                try:
                    parsed = parse_wire_format(bytes(raw))
                    row = {
                        name: _extract(parsed, fnum, ftype)
                        for name, (fnum, ftype) in field_map.items()
                    }
                except ValueError:
                    row = {name: None for name in names}
                for name in names:
                    cols[name].append(row[name])
            yield pd.DataFrame(cols)

    def apply(df: DataFrame) -> DataFrame:
        return df.mapInPandas(decode, schema=schema)

    return apply


# --- tier 3: JSON ----------------------------------------------------------


def json_decoder(schema: StructType | str, value_col: str = "value"):
    """JSON-value decoder (JVM-side from_json; malformed → null struct)."""

    def decode(df: DataFrame) -> DataFrame:
        val: Column = F.col(value_col).cast("string")
        return df.withColumn("decoded", F.from_json(val, schema)).select("decoded.*")

    return decode
