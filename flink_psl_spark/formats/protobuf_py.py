"""Pure-Python protobuf wire-format codec (flat-message subset).

Reference surface: flink-formats/flink-protobuf (factory ID "protobuf").
Spark's native path is `from_protobuf`/`to_protobuf` (spark-protobuf jar,
absent here) — this fallback implements the public protobuf wire format
(https://protobuf.dev/programming-guides/encoding/) for flat messages:

- varint fields (int32/int64/bool, two's-complement 64-bit negatives;
  sint32/sint64 zigzag),
- 64-bit (double) and 32-bit (float) fixed fields, little-endian,
- length-delimited string/bytes,
- tag = (field_number << 3) | wire_type; proto3 default-value omission on
  encode, defaults restored on decode (null ≡ default, per proto3).

Schema shape: ordered field specs (name, number, type). DataFrame
integration mirrors formats/avro_py.py (Arrow-batched mapInPandas).
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


def encode_message(fields: list[tuple[str, int, str]], row: dict) -> bytes:
    """Encode one flat message; proto3 semantics (defaults/None omitted)."""
    out = bytearray()
    for name, number, typ in fields:
        v = row.get(name)
        if v is None or v == _DEFAULTS[typ]:
            continue
        out += varint_encode((number << 3) | _WIRE[typ])
        if typ in ("int32", "int64"):
            out += varint_encode(int(v))
        elif typ in ("sint32", "sint64"):
            out += varint_encode((int(v) << 1) ^ (int(v) >> 63))
        elif typ == "bool":
            out += varint_encode(1)
        elif typ == "double":
            out += struct.pack("<d", float(v))
        elif typ == "float":
            out += struct.pack("<f", float(v))
        elif typ in ("string", "bytes"):
            b = str(v).encode("utf-8") if typ == "string" else bytes(v)
            out += varint_encode(len(b)) + b
    return bytes(out)


def decode_message(fields: list[tuple[str, int, str]], buf: bytes) -> dict:
    by_number = {number: (name, typ) for name, number, typ in fields}
    row = {name: _DEFAULTS[typ] for name, _n, typ in fields}
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
        if wire == 0:
            u, pos = varint_decode(buf, pos)
            if typ in ("sint32", "sint64"):
                row[name] = (u >> 1) ^ -(u & 1)
            elif typ == "bool":
                row[name] = u == 1
            else:
                row[name] = _to_signed64(u)
        elif wire == 1:
            row[name] = struct.unpack_from("<d", buf, pos)[0]
            pos += 8
        elif wire == 5:
            row[name] = struct.unpack_from("<f", buf, pos)[0]
            pos += 4
        elif wire == 2:
            ln, pos = varint_decode(buf, pos)
            raw = buf[pos : pos + ln]
            pos += ln
            row[name] = raw.decode("utf-8") if typ == "string" else raw
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


def fields_to_struct(fields: list[tuple[str, int, str]]) -> T.StructType:
    return T.StructType(
        [T.StructField(name, _PB_TO_SPARK[typ], True) for name, _n, typ in fields]
    )


def to_protobuf_py(
    df: DataFrame, fields: list[tuple[str, int, str]], *, out_col: str = "proto"
) -> DataFrame:
    cols = [name for name, _n, _t in fields]

    def run(batches):
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    out_col: [
                        encode_message(
                            fields,
                            {c: (None if pd.isna(r[c]) else r[c]) for c in cols},
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
