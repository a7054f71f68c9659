"""Pure-Python Avro *binary* codec — a jar-free ``from_avro``/``to_avro``
for record schemas, implementing the public Avro 1.11 wire format
(specification: https://avro.apache.org/docs/1.11.1/specification/):

- int/long: zigzag-encoded variable-length integers
- float/double: 4/8-byte little-endian IEEE 754
- boolean: one byte (0/1); null: zero bytes
- bytes/string: varint byte-length prefix + raw bytes (UTF-8)
- record: field values in schema order, no tags or delimiters
- union: varint index of the branch schema, then the value
- array: varint block count, items, ... , zero terminator

Why this exists: the reference's transport is Kafka values in Avro with
Schema-Registry schemas (/root/reference/README.md:389-427), and the
spark-avro datasource is an external jar this container does not ship —
so the jar-gated wrappers in ``avro.py`` could only ever skip.  The
wire format itself is a page of spec, and a pure-Python implementation
lets the Avro path EXECUTE: envelopes round-trip through real Avro
binary bytes in tests and in the ``avro_roundtrip`` registry entry,
with the byte layout pinned against hand-computed spec fixtures (a
roundtrip alone can't catch a self-consistent-but-wrong codec).

On a cluster the decode stage is the same ``mapInPandas`` shape with
``from_avro`` substituting for the Python codec — or this codec as-is:
it is Arrow-batched and touches only the value column.
"""

from __future__ import annotations

import json
import struct
from typing import Any

from pyspark.sql import DataFrame

# --------------------------------------------------------------------------
# primitive encoders/decoders
# --------------------------------------------------------------------------


def _zigzag_encode(n: int) -> bytes:
    z = (n << 1) ^ (n >> 63) if n < 0 else n << 1
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag_decode(buf: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    acc = 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1), pos


def _norm(schema: Any) -> Any:
    """Collapse {"type": "string"}-style wrappers to the bare name (but
    keep records/arrays/maps/logical types as dicts)."""
    if isinstance(schema, dict) and set(schema) == {"type"}:
        return schema["type"]
    if isinstance(schema, dict) and "logicalType" in schema:
        return schema["type"]  # logical types ride their base encoding
    return schema


def _encode(value: Any, schema: Any, out: bytearray) -> None:
    schema = _norm(schema)
    if isinstance(schema, list):  # union: varint branch index + value
        for i, branch in enumerate(schema):
            bn = _norm(branch)
            if value is None and bn == "null":
                out += _zigzag_encode(i)
                return
            if value is not None and bn != "null":
                out += _zigzag_encode(i)
                _encode(value, branch, out)
                return
        raise ValueError(f"no union branch for {value!r} in {schema!r}")
    if schema == "null":
        return
    if schema == "boolean":
        out.append(1 if value else 0)
        return
    if schema in ("int", "long"):
        out += _zigzag_encode(int(value))
        return
    if schema == "float":
        out += struct.pack("<f", float(value))
        return
    if schema == "double":
        out += struct.pack("<d", float(value))
        return
    if schema in ("bytes", "string"):
        raw = value.encode("utf-8") if schema == "string" else bytes(value)
        out += _zigzag_encode(len(raw))
        out += raw
        return
    if isinstance(schema, dict) and schema.get("type") == "record":
        for f in schema["fields"]:
            _encode(value[f["name"]], f["type"], out)
        return
    if isinstance(schema, dict) and schema.get("type") == "array":
        items = list(value)
        if items:
            out += _zigzag_encode(len(items))
            for it in items:
                _encode(it, schema["items"], out)
        out += _zigzag_encode(0)
        return
    if isinstance(schema, dict) and schema.get("type") == "map":
        kv = dict(value)
        if kv:
            out += _zigzag_encode(len(kv))
            for k, v in kv.items():
                _encode(k, "string", out)
                _encode(v, schema["values"], out)
        out += _zigzag_encode(0)
        return
    raise TypeError(f"unsupported Avro schema {schema!r}")


def _decode(buf: bytes, pos: int, schema: Any) -> tuple[Any, int]:
    schema = _norm(schema)
    if isinstance(schema, list):
        idx, pos = _zigzag_decode(buf, pos)
        return _decode(buf, pos, schema[idx])
    if schema == "null":
        return None, pos
    if schema == "boolean":
        return buf[pos] != 0, pos + 1
    if schema in ("int", "long"):
        return _zigzag_decode(buf, pos)
    if schema == "float":
        return struct.unpack_from("<f", buf, pos)[0], pos + 4
    if schema == "double":
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if schema in ("bytes", "string"):
        n, pos = _zigzag_decode(buf, pos)
        raw = buf[pos:pos + n]
        return (raw.decode("utf-8") if schema == "string" else raw), pos + n
    if isinstance(schema, dict) and schema.get("type") == "record":
        rec = {}
        for f in schema["fields"]:
            rec[f["name"]], pos = _decode(buf, pos, f["type"])
        return rec, pos
    if isinstance(schema, dict) and schema.get("type") == "array":
        items = []
        while True:
            n, pos = _zigzag_decode(buf, pos)
            if n == 0:
                break
            if n < 0:  # block with byte-size prefix (spec-permitted)
                _, pos = _zigzag_decode(buf, pos)
                n = -n
            for _ in range(n):
                it, pos = _decode(buf, pos, schema["items"])
                items.append(it)
        return items, pos
    if isinstance(schema, dict) and schema.get("type") == "map":
        kv = {}
        while True:
            n, pos = _zigzag_decode(buf, pos)
            if n == 0:
                break
            if n < 0:
                _, pos = _zigzag_decode(buf, pos)
                n = -n
            for _ in range(n):
                k, pos = _decode(buf, pos, "string")
                kv[k], pos = _decode(buf, pos, schema["values"])
        return kv, pos
    raise TypeError(f"unsupported Avro schema {schema!r}")


# --------------------------------------------------------------------------
# row-level API (the pure-Python reference codec)
# --------------------------------------------------------------------------


def encode_record(rec: dict, schema_json: str) -> bytes:
    out = bytearray()
    _encode(rec, json.loads(schema_json), out)
    return bytes(out)


def decode_record(buf: bytes, schema_json: str) -> dict:
    rec, pos = _decode(bytes(buf), 0, json.loads(schema_json))
    if pos != len(buf):
        raise ValueError(f"trailing {len(buf) - pos} bytes after record")
    return rec


# --------------------------------------------------------------------------
# DataFrame-level API (the jar-free from_avro / to_avro)
# --------------------------------------------------------------------------


def to_avro_py(
    df: DataFrame, cols: list[str], schema_json: str, out_col: str = "value"
) -> DataFrame:
    """Encode ``cols`` of every row into one Avro binary value column —
    Arrow-batched; only the listed columns cross into Python."""

    def _batches(iterator):
        import pandas as pd

        for pdf in iterator:
            vals = [
                encode_record(
                    {c: (None if pd.isna(rec[c]) else rec[c]) for c in cols},
                    schema_json,
                )
                for rec in pdf[cols].to_dict("records")
            ]
            # drop BEFORE assign: out_col may shadow one of the encoded
            # input columns (e.g. encoding a column literally named
            # "value" into the "value" payload column)
            yield pdf.drop(columns=cols).assign(**{out_col: vals})

    keep = [c for c in df.columns if c not in cols]
    fields = ", ".join(f"{c} {t}" for c, t in df.dtypes if c in keep)
    schema = (fields + ", " if fields else "") + f"{out_col} binary"
    return df.mapInPandas(_batches, schema=schema)


def from_avro_py(
    df: DataFrame,
    value_col: str,
    schema_json: str,
    field_types: str,
) -> DataFrame:
    """Decode an Avro binary value column back into typed columns.
    ``field_types`` is the Spark DDL for the decoded fields (the
    StructType the Schema-Registry schema maps to)."""
    names = [f.split()[0] for f in field_types.split(",")]

    def _batches(iterator):
        import pandas as pd

        for pdf in iterator:
            recs = [
                decode_record(b, schema_json) for b in pdf[value_col]
            ]
            cols = {
                n.strip(): [r[n.strip()] for r in recs] for n in names
            }
            yield pd.DataFrame(cols)

    return df.mapInPandas(_batches, schema=field_types)
