"""Pure-Python Avro binary codec (record-of-primitives subset).

Reference surface: flink-formats/flink-avro (AvroRowDataDeserializationSchema
/ factory ID "avro"). Spark's native path is `from_avro`/`to_avro`
(spark-avro jar, absent in this environment — see ARCHITECTURE gaps), so
this module provides a dependency-free fallback implementing the Avro
BINARY ENCODING from the public specification
(https://avro.apache.org/docs/1.11.1/specification/#binary-encoding):

- int/long: zigzag-encoded variable-length integers,
- float/double: little-endian IEEE-754,
- boolean: single byte, null: zero bytes,
- string/bytes: long-prefixed payloads,
- unions: zigzag branch index + value (the common ["null", T] nullable),
- records: field-order concatenation (nested records supported),
- arrays/maps: block encoding (count-prefixed blocks, zero terminator;
  negative block counts with byte sizes accepted on read per the spec),
- enums: zigzag symbol index; fixed: raw size bytes.

DataFrame integration is Arrow-batched mapInPandas — bytes move once per
batch; nested values map to Spark StructType/ArrayType/MapType columns.
With the spark-avro jar present, `from_avro`/`to_avro` drop in with no
schema changes.
"""

from __future__ import annotations

import struct
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# spec primitives
# ---------------------------------------------------------------------------


def zigzag_encode(n: int) -> bytes:
    """Avro long: zigzag then base-128 varint, little-endian groups."""
    z = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def zigzag_decode(buf: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    acc = 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not (b & 0x80):
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1), pos


def _encode_value(typ: Any, v: Any, out: bytearray) -> None:
    if isinstance(typ, list):  # union — branch index, then value
        if v is None and "null" in typ:
            out += zigzag_encode(typ.index("null"))
            return
        branch = next(i for i, t in enumerate(typ) if t != "null")
        out += zigzag_encode(branch)
        _encode_value(typ[branch], v, out)
        return
    if isinstance(typ, dict):  # complex types
        t = typ["type"]
        if t == "record":
            out += encode_record(typ, v if v is not None else {})
            return
        if t == "array":
            items = list(v) if v is not None else []
            if items:
                out += zigzag_encode(len(items))
                for it in items:
                    _encode_value(typ["items"], it, out)
            out += zigzag_encode(0)
            return
        if t == "map":
            pairs = (
                list(v.items()) if isinstance(v, dict)
                else [tuple(p) for p in v] if v is not None
                else []
            )
            if pairs:
                out += zigzag_encode(len(pairs))
                for k, val in pairs:
                    kb = str(k).encode("utf-8")
                    out += zigzag_encode(len(kb)) + kb
                    _encode_value(typ["values"], val, out)
            out += zigzag_encode(0)
            return
        if t == "enum":
            out += zigzag_encode(typ["symbols"].index(v))
            return
        if t == "fixed":
            b = bytes(v)
            if len(b) != typ["size"]:
                raise ValueError(
                    f"fixed {typ.get('name', '')} expects {typ['size']} "
                    f"bytes, got {len(b)}"
                )
            out += b
            return
        raise ValueError(f"unsupported avro complex type {t!r}")
    if typ == "null":
        return
    if typ == "boolean":
        out.append(1 if v else 0)
    elif typ in ("int", "long"):
        out += zigzag_encode(int(v))
    elif typ == "float":
        out += struct.pack("<f", float(v))
    elif typ == "double":
        out += struct.pack("<d", float(v))
    elif typ == "string":
        b = str(v).encode("utf-8")
        out += zigzag_encode(len(b)) + b
    elif typ == "bytes":
        b = bytes(v)
        out += zigzag_encode(len(b)) + b
    else:
        raise ValueError(f"unsupported avro type {typ!r}")


def _decode_value(typ: Any, buf: bytes, pos: int) -> tuple[Any, int]:
    if isinstance(typ, list):
        branch, pos = zigzag_decode(buf, pos)
        return _decode_value(typ[branch], buf, pos)
    if isinstance(typ, dict):
        t = typ["type"]
        if t == "record":
            row = {}
            for f in typ["fields"]:
                row[f["name"]], pos = _decode_value(f["type"], buf, pos)
            return row, pos
        if t == "array":
            items = []
            while True:
                count, pos = zigzag_decode(buf, pos)
                if count == 0:
                    return items, pos
                if count < 0:  # spec: |count| items preceded by byte size
                    _size, pos = zigzag_decode(buf, pos)
                    count = -count
                for _ in range(count):
                    it, pos = _decode_value(typ["items"], buf, pos)
                    items.append(it)
        if t == "map":
            m = {}
            while True:
                count, pos = zigzag_decode(buf, pos)
                if count == 0:
                    return m, pos
                if count < 0:
                    _size, pos = zigzag_decode(buf, pos)
                    count = -count
                for _ in range(count):
                    kl, pos = zigzag_decode(buf, pos)
                    k = buf[pos : pos + kl].decode("utf-8")
                    pos += kl
                    m[k], pos = _decode_value(typ["values"], buf, pos)
        if t == "enum":
            idx, pos = zigzag_decode(buf, pos)
            return typ["symbols"][idx], pos
        if t == "fixed":
            n = typ["size"]
            return buf[pos : pos + n], pos + n
        raise ValueError(f"unsupported avro complex type {t!r}")
    if typ == "null":
        return None, pos
    if typ == "boolean":
        return buf[pos] == 1, pos + 1
    if typ in ("int", "long"):
        return zigzag_decode(buf, pos)
    if typ == "float":
        return struct.unpack_from("<f", buf, pos)[0], pos + 4
    if typ == "double":
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if typ in ("string", "bytes"):
        n, pos = zigzag_decode(buf, pos)
        raw = buf[pos : pos + n]
        return (raw.decode("utf-8") if typ == "string" else raw), pos + n
    raise ValueError(f"unsupported avro type {typ!r}")


def encode_record(schema: dict, row: dict) -> bytes:
    """Binary-encode one record per the writer schema (field order)."""
    out = bytearray()
    for f in schema["fields"]:
        _encode_value(f["type"], row.get(f["name"]), out)
    return bytes(out)


def decode_record(schema: dict, buf: bytes, reader_schema: dict | None = None) -> dict:
    if reader_schema is not None and reader_schema is not schema:
        row, _pos = _resolve_value(schema, reader_schema, buf, 0)
        return row
    pos = 0
    row = {}
    for f in schema["fields"]:
        row[f["name"]], pos = _decode_value(f["type"], buf, pos)
    return row


# ---------------------------------------------------------------------------
# schema resolution (reader != writer — Avro spec "Schema Resolution")
# ---------------------------------------------------------------------------

# writer type -> reader types it may be promoted to
_PROMOTIONS = {
    "int": {"long", "float", "double"},
    "long": {"float", "double"},
    "float": {"double"},
    "string": {"bytes"},
    "bytes": {"string"},
}


def _type_tag(typ: Any) -> str:
    if isinstance(typ, list):
        return "union"
    if isinstance(typ, dict):
        return typ["type"]
    return typ


def _names(typ: Any) -> set[str]:
    """Record/enum/fixed full-name set: name + aliases."""
    if not isinstance(typ, dict):
        return set()
    return {typ.get("name", "")} | set(typ.get("aliases", []))


def _compatible(writer: Any, reader: Any) -> bool:
    """May a value written as ``writer`` be read as ``reader``? (Used for
    union branch matching; shallow per the spec — nested mismatches still
    raise during resolution.)"""
    wt, rt = _type_tag(writer), _type_tag(reader)
    if rt == "union":
        return any(_compatible(writer, r) for r in reader)
    if wt == "union":
        return True  # branch checked at read time against the reader
    if wt == rt:
        if wt in ("record", "enum", "fixed"):
            return bool(_names(writer) & _names(reader)) or not _names(reader)
        return True
    return rt in _PROMOTIONS.get(wt, ())


def _skip_value(typ: Any, buf: bytes, pos: int) -> int:
    """Advance past a value of ``typ`` without materializing it (spec: a
    writer field absent from the reader record is ignored)."""
    _v, pos = _decode_value(typ, buf, pos)
    return pos


def _promote(v: Any, wt: str, rt: str) -> Any:
    if wt == rt:
        return v
    if rt in ("long",):
        return int(v)
    if rt in ("float", "double"):
        return float(v)
    if wt == "string" and rt == "bytes":
        return v.encode("utf-8") if isinstance(v, str) else bytes(v)
    if wt == "bytes" and rt == "string":
        return v.decode("utf-8") if isinstance(v, (bytes, bytearray)) else str(v)
    raise ValueError(f"cannot promote {wt!r} to {rt!r}")


def _resolve_value(writer: Any, reader: Any, buf: bytes, pos: int) -> tuple[Any, int]:
    """Decode per the writer schema while coercing into the reader schema
    (Avro spec schema-resolution rules: name matching with aliases, reader
    defaults, primitive promotions, union re-matching)."""
    if isinstance(writer, list):  # writer union: decode branch, re-resolve
        branch, pos = zigzag_decode(buf, pos)
        return _resolve_value(writer[branch], reader, buf, pos)
    if isinstance(reader, list):  # reader union: first matching branch
        for r in reader:
            if _compatible(writer, r):
                return _resolve_value(writer, r, buf, pos)
        raise ValueError(
            f"writer type {_type_tag(writer)!r} matches no reader union branch"
        )
    wt, rt = _type_tag(writer), _type_tag(reader)
    if wt == "record" and rt == "record":
        if _names(reader) and _names(writer) and not (
            _names(writer) & _names(reader)
        ):
            raise ValueError(
                f"record name mismatch: {writer.get('name')} vs {reader.get('name')}"
            )
        by_name: dict[str, dict] = {}
        for rf in reader["fields"]:
            by_name[rf["name"]] = rf
            for a in rf.get("aliases", []):
                by_name[a] = rf
        row: dict[str, Any] = {}
        seen: set[str] = set()
        for wf in writer["fields"]:
            rf = by_name.get(wf["name"])
            if rf is None:
                pos = _skip_value(wf["type"], buf, pos)  # ignored field
                continue
            row[rf["name"]], pos = _resolve_value(wf["type"], rf["type"], buf, pos)
            seen.add(rf["name"])
        for rf in reader["fields"]:  # reader-only fields take defaults
            if rf["name"] in seen:
                continue
            if "default" not in rf:
                raise ValueError(
                    f"reader field {rf['name']!r} absent from writer and has "
                    "no default"
                )
            row[rf["name"]] = rf["default"]
        return row, pos
    if wt == "array" and rt == "array":
        items = []
        while True:
            count, pos = zigzag_decode(buf, pos)
            if count == 0:
                return items, pos
            if count < 0:
                _size, pos = zigzag_decode(buf, pos)
                count = -count
            for _ in range(count):
                it, pos = _resolve_value(writer["items"], reader["items"], buf, pos)
                items.append(it)
    if wt == "map" and rt == "map":
        m: dict[str, Any] = {}
        while True:
            count, pos = zigzag_decode(buf, pos)
            if count == 0:
                return m, pos
            if count < 0:
                _size, pos = zigzag_decode(buf, pos)
                count = -count
            for _ in range(count):
                kl, pos = zigzag_decode(buf, pos)
                k = buf[pos : pos + kl].decode("utf-8")
                pos += kl
                m[k], pos = _resolve_value(
                    writer["values"], reader["values"], buf, pos
                )
    if wt == "enum" and rt == "enum":
        idx, pos = zigzag_decode(buf, pos)
        sym = writer["symbols"][idx]
        if sym in reader["symbols"]:
            return sym, pos
        if "default" in reader:
            return reader["default"], pos
        raise ValueError(f"enum symbol {sym!r} not in reader schema, no default")
    if wt == "fixed" and rt == "fixed":
        if writer["size"] != reader["size"]:
            raise ValueError("fixed size mismatch")
        return _decode_value(writer, buf, pos)
    if wt == rt or rt in _PROMOTIONS.get(wt, ()):
        v, pos = _decode_value(writer, buf, pos)
        return _promote(v, wt, rt), pos
    raise ValueError(f"cannot resolve writer {wt!r} against reader {rt!r}")


# ---------------------------------------------------------------------------
# DataFrame integration
# ---------------------------------------------------------------------------

_AVRO_TO_SPARK = {
    "boolean": T.BooleanType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "string": T.StringType(),
    "bytes": T.BinaryType(),
}


def _spark_type(typ: Any) -> T.DataType:
    if isinstance(typ, list):  # nullable union
        inner = next(t for t in typ if t != "null")
        return _spark_type(inner)
    if isinstance(typ, dict):
        t = typ["type"]
        if t == "record":
            return T.StructType(
                [
                    T.StructField(f["name"], _spark_type(f["type"]), True)
                    for f in typ["fields"]
                ]
            )
        if t == "array":
            return T.ArrayType(_spark_type(typ["items"]))
        if t == "map":
            return T.MapType(T.StringType(), _spark_type(typ["values"]))
        if t == "enum":
            return T.StringType()
        if t == "fixed":
            return T.BinaryType()
        raise ValueError(f"unsupported avro complex type {t!r}")
    return _AVRO_TO_SPARK[typ]


def _clean_cell(v: Any) -> Any:
    """Arrow->pandas cells to plain python: numpy scalars/arrays unwrap,
    NaN -> None, struct dicts / map pairs recurse."""
    import math

    import numpy as np

    if v is None:
        return None
    if isinstance(v, float) and math.isnan(v):
        return None
    if isinstance(v, np.generic):
        return v.item()
    if isinstance(v, np.ndarray):
        return [_clean_cell(x) for x in v.tolist()]
    if isinstance(v, (list, tuple)):
        return [_clean_cell(x) for x in v]
    if isinstance(v, dict):
        return {k: _clean_cell(x) for k, x in v.items()}
    return v


def schema_to_struct(schema: dict) -> T.StructType:
    return T.StructType(
        [
            T.StructField(f["name"], _spark_type(f["type"]), True)
            for f in schema["fields"]
        ]
    )


def to_avro_py(df: DataFrame, schema: dict, *, out_col: str = "avro") -> DataFrame:
    """Encode each row to Avro binary → (out_col binary). mapInPandas —
    one Arrow hop, constant memory."""
    cols = [f["name"] for f in schema["fields"]]

    def run(batches):
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    out_col: [
                        encode_record(
                            schema, {c: _clean_cell(r[c]) for c in cols}
                        )
                        for r in pdf.to_dict("records")
                    ]
                }
            )

    return df.select(*cols).mapInPandas(
        run, T.StructType([T.StructField(out_col, T.BinaryType(), False)])
    )


def from_avro_py(
    df: DataFrame,
    schema: dict,
    *,
    in_col: str = "avro",
    reader_schema: dict | None = None,
) -> DataFrame:
    """Decode an Avro-binary column back to typed columns.

    With ``reader_schema``, full spec schema resolution applies (evolution:
    added fields take reader defaults, removed fields are skipped, fields
    match by name/alias regardless of order, int→long→float→double and
    string↔bytes promotions, union re-matching, enum defaults) — the same
    contract the reference's Avro format honors via the Avro library."""
    out = reader_schema if reader_schema is not None else schema
    out_schema = schema_to_struct(out)

    def run(batches):
        import pandas as pd

        for pdf in batches:
            rows = [
                decode_record(schema, bytes(b), reader_schema=reader_schema)
                for b in pdf[in_col]
            ]
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return df.select(in_col).mapInPandas(run, out_schema)
