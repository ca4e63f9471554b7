"""Pure-Python protobuf wire-format codec (flat-message subset).

Reference surface: flink-formats/flink-protobuf (factory ID "protobuf").
Spark's native path is `from_protobuf`/`to_protobuf` (spark-protobuf jar,
absent here) — this fallback implements the public protobuf wire format
(https://protobuf.dev/programming-guides/encoding/) for flat messages:

- varint fields (int32/int64/bool, two's-complement 64-bit negatives;
  sint32/sint64 zigzag),
- 64-bit (double) and 32-bit (float) fixed fields, little-endian,
- length-delimited string/bytes,
- nested messages: type ("message", [subfields]) — length-delimited
  submessage payloads, recursive,
- repeated fields: type ("repeated", inner) — numeric inners use proto3
  packed encoding on write and accept both packed and expanded on read;
  string/bytes/message inners repeat their tag per element,
- map fields: type ("map", key, value) — wire-identical to a repeated
  entry message {key = 1; value = 2} per the spec,
- tag = (field_number << 3) | wire_type; proto3 default-value omission on
  encode, defaults restored on decode (null ≡ default, repeated ≡ [],
  map ≡ {}, absent message ≡ null, per proto3); unknown field numbers are
  skipped by wire type.

Schema shape: ordered field specs (name, number, type). DataFrame
integration mirrors formats/avro_py.py (Arrow-batched mapInPandas);
messages map to StructType, repeated to ArrayType, map to MapType.
"""

from __future__ import annotations

import struct
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import types as T

_WIRE = {
    "int32": 0, "int64": 0, "sint32": 0, "sint64": 0, "bool": 0,
    "double": 1, "string": 2, "bytes": 2, "float": 5,
}

_DEFAULTS = {
    "int32": 0, "int64": 0, "sint32": 0, "sint64": 0, "bool": False,
    "double": 0.0, "float": 0.0, "string": "", "bytes": b"",
}


def varint_encode(n: int) -> bytes:
    """Unsigned base-128 varint (negatives enter as 64-bit two's complement)."""
    n &= (1 << 64) - 1
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def varint_decode(buf: bytes, pos: int) -> tuple[int, int]:
    shift = acc = 0
    end = pos + 10  # a valid varint is at most 10 bytes (70 bits > 64)
    while True:
        if pos >= len(buf):
            raise ValueError("truncated varint")
        if pos >= end:
            raise ValueError("malformed varint exceeds 10 bytes")
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not (b & 0x80):
            return acc, pos
        shift += 7


def _to_signed64(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


_PACKABLE = ("int32", "int64", "sint32", "sint64", "bool", "double", "float")


def _encode_scalar(typ: str, v: Any) -> bytes:
    if typ in ("int32", "int64"):
        return varint_encode(int(v))
    if typ in ("sint32", "sint64"):
        return varint_encode((int(v) << 1) ^ (int(v) >> 63))
    if typ == "bool":
        return varint_encode(1 if v else 0)
    if typ == "double":
        return struct.pack("<d", float(v))
    if typ == "float":
        return struct.pack("<f", float(v))
    raise ValueError(f"not a scalar numeric type {typ!r}")


def encode_message(fields: list[tuple[str, int, Any]], row: dict) -> bytes:
    """Encode one message; proto3 semantics (defaults/None/[] omitted)."""
    out = bytearray()
    row = row or {}
    for name, number, typ in fields:
        v = row.get(name)
        if isinstance(typ, tuple) and typ[0] == "message":
            if v is None:
                continue
            sub = encode_message(typ[1], v)
            out += varint_encode((number << 3) | 2)
            out += varint_encode(len(sub)) + sub
            continue
        if isinstance(typ, tuple) and typ[0] == "map":
            # proto map<K,V> ≡ repeated message { K key = 1; V value = 2; }
            pairs = (
                list(v.items()) if isinstance(v, dict)
                else [tuple(p) for p in v] if v is not None
                else []
            )
            entry = _map_entry_fields(typ)
            for k, val in pairs:
                sub = encode_message(entry, {"key": k, "value": val})
                out += varint_encode((number << 3) | 2)
                out += varint_encode(len(sub)) + sub
            continue
        if isinstance(typ, tuple) and typ[0] == "repeated":
            items = list(v) if v is not None else []
            if not items:
                continue
            inner = typ[1]
            if isinstance(inner, tuple) and inner[0] == "message":
                for it in items:
                    sub = encode_message(inner[1], it)
                    out += varint_encode((number << 3) | 2)
                    out += varint_encode(len(sub)) + sub
            elif inner in _PACKABLE:
                payload = b"".join(_encode_scalar(inner, it) for it in items)
                out += varint_encode((number << 3) | 2)
                out += varint_encode(len(payload)) + payload
            else:  # string / bytes repeat their tag
                for it in items:
                    b = (
                        str(it).encode("utf-8")
                        if inner == "string"
                        else bytes(it)
                    )
                    out += varint_encode((number << 3) | 2)
                    out += varint_encode(len(b)) + b
            continue
        if v is None or v == _DEFAULTS[typ]:
            continue
        out += varint_encode((number << 3) | _WIRE[typ])
        if typ in ("string", "bytes"):
            b = str(v).encode("utf-8") if typ == "string" else bytes(v)
            out += varint_encode(len(b)) + b
        else:
            out += _encode_scalar(typ, v)
    return bytes(out)


def _decode_scalar_at(typ: str, buf: bytes, pos: int) -> tuple[Any, int]:
    if typ == "double":
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if typ == "float":
        return struct.unpack_from("<f", buf, pos)[0], pos + 4
    u, pos = varint_decode(buf, pos)
    if typ in ("sint32", "sint64"):
        return (u >> 1) ^ -(u & 1), pos
    if typ == "bool":
        return u == 1, pos
    return _to_signed64(u), pos


def _default_for(typ: Any) -> Any:
    if isinstance(typ, tuple):
        if typ[0] == "repeated":
            return []
        if typ[0] == "map":
            return {}
        return None  # message
    return _DEFAULTS[typ]


def _map_entry_fields(typ: tuple) -> list[tuple[str, int, Any]]:
    """The synthetic entry message of a ("map", K, V) field (spec: maps are
    wire-identical to repeated entry messages with key=1, value=2)."""
    return [("key", 1, typ[1]), ("value", 2, typ[2])]


def decode_message(fields: list[tuple[str, int, Any]], buf: bytes) -> dict:
    by_number = {number: (name, typ) for name, number, typ in fields}
    row = {name: _default_for(typ) for name, _n, typ in fields}
    pos, n = 0, len(buf)
    while pos < n:
        tag, pos = varint_decode(buf, pos)
        number, wire = tag >> 3, tag & 7
        if number not in by_number:
            # unknown field (writer schema ahead of ours): skip the value
            # per wire type, as the protobuf spec requires, instead of
            # failing the whole message
            if wire == 0:
                _u, pos = varint_decode(buf, pos)
            elif wire == 1:
                pos += 8
            elif wire == 5:
                pos += 4
            elif wire == 2:
                ln, pos = varint_decode(buf, pos)
                pos += ln
            else:
                raise ValueError(f"unsupported wire type {wire}")
            continue
        name, typ = by_number[number]
        if isinstance(typ, tuple) and typ[0] == "map":
            if wire != 2:
                raise ValueError(f"map field {name} with wire {wire}")
            ln, pos = varint_decode(buf, pos)
            entry = decode_message(_map_entry_fields(typ), buf[pos : pos + ln])
            row[name][entry["key"]] = entry["value"]
            pos += ln
            continue
        if isinstance(typ, tuple) and typ[0] == "message":
            if wire != 2:
                raise ValueError(f"message field {name} with wire {wire}")
            ln, pos = varint_decode(buf, pos)
            row[name] = decode_message(typ[1], buf[pos : pos + ln])
            pos += ln
            continue
        if isinstance(typ, tuple) and typ[0] == "repeated":
            inner = typ[1]
            if isinstance(inner, tuple) and inner[0] == "message":
                if wire != 2:
                    raise ValueError(f"repeated message {name} wire {wire}")
                ln, pos = varint_decode(buf, pos)
                row[name].append(decode_message(inner[1], buf[pos : pos + ln]))
                pos += ln
            elif inner in ("string", "bytes"):
                if wire != 2:
                    raise ValueError(f"repeated {inner} {name} wire {wire}")
                ln, pos = varint_decode(buf, pos)
                raw = buf[pos : pos + ln]
                pos += ln
                row[name].append(
                    raw.decode("utf-8") if inner == "string" else raw
                )
            elif wire == 2:  # packed numerics
                ln, pos = varint_decode(buf, pos)
                end = pos + ln
                while pos < end:
                    v, pos = _decode_scalar_at(inner, buf, pos)
                    row[name].append(v)
            else:  # expanded numeric element
                v, pos = _decode_scalar_at(inner, buf, pos)
                row[name].append(v)
            continue
        if wire == 2:
            ln, pos = varint_decode(buf, pos)
            raw = buf[pos : pos + ln]
            pos += ln
            row[name] = raw.decode("utf-8") if typ == "string" else raw
        elif wire in (0, 1, 5):
            row[name], pos = _decode_scalar_at(typ, buf, pos)
        else:
            raise ValueError(f"unsupported wire type {wire}")
    return row


_PB_TO_SPARK = {
    "int32": T.IntegerType(), "int64": T.LongType(),
    "sint32": T.IntegerType(), "sint64": T.LongType(),
    "bool": T.BooleanType(), "double": T.DoubleType(),
    "float": T.FloatType(), "string": T.StringType(),
    "bytes": T.BinaryType(),
}


def _pb_spark_type(typ: Any) -> T.DataType:
    if isinstance(typ, tuple):
        if typ[0] == "message":
            return fields_to_struct(typ[1])
        if typ[0] == "repeated":
            return T.ArrayType(_pb_spark_type(typ[1]))
        if typ[0] == "map":
            return T.MapType(_pb_spark_type(typ[1]), _pb_spark_type(typ[2]))
        raise ValueError(f"unsupported protobuf type {typ!r}")
    return _PB_TO_SPARK[typ]


def fields_to_struct(fields: list[tuple[str, int, Any]]) -> T.StructType:
    return T.StructType(
        [T.StructField(name, _pb_spark_type(typ), True) for name, _n, typ in fields]
    )


def to_protobuf_py(
    df: DataFrame, fields: list[tuple[str, int, str]], *, out_col: str = "proto"
) -> DataFrame:
    cols = [name for name, _n, _t in fields]

    def run(batches):
        import pandas as pd

        from flink_psl_spark.formats.avro_py import _clean_cell

        for pdf in batches:
            yield pd.DataFrame(
                {
                    out_col: [
                        encode_message(
                            fields,
                            {c: _clean_cell(r[c]) for c in cols},
                        )
                        for r in pdf.to_dict("records")
                    ]
                }
            )

    return df.select(*cols).mapInPandas(
        run, T.StructType([T.StructField(out_col, T.BinaryType(), False)])
    )


def from_protobuf_py(
    df: DataFrame, fields: list[tuple[str, int, str]], *, in_col: str = "proto"
) -> DataFrame:
    out_schema = fields_to_struct(fields)

    def run(batches):
        import pandas as pd

        for pdf in batches:
            rows = [decode_message(fields, bytes(b)) for b in pdf[in_col]]
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return df.select(in_col).mapInPandas(run, out_schema)
