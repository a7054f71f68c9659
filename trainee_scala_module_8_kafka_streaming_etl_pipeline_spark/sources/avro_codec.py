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


def _union_branch_matches(value: Any, branch: Any, lenient: bool) -> bool:
    """Does ``value``'s Python type select this union branch?  Strict
    pass is exact-type; the lenient pass additionally lets ints ride
    float/double branches (Avro's own Python binding allows this)."""
    bn = _norm(branch)
    if bn == "null":
        return value is None
    if value is None:
        return False
    if bn == "boolean":
        return isinstance(value, bool)
    if bn in ("int", "long"):
        return isinstance(value, int) and not isinstance(value, bool)
    if bn in ("float", "double"):
        if isinstance(value, float):
            return True
        return lenient and isinstance(value, int) and not isinstance(value, bool)
    if bn == "string":
        return isinstance(value, str)
    if bn == "bytes":
        return isinstance(value, (bytes, bytearray))
    if isinstance(bn, dict):
        t = bn.get("type")
        if t == "record":
            return isinstance(value, dict)
        if t == "map":
            return isinstance(value, dict)
        if t == "array":
            return isinstance(value, (list, tuple))
    return False


def _encode(value: Any, schema: Any, out: bytearray) -> None:
    schema = _norm(schema)
    if isinstance(schema, list):  # union: varint branch index + value
        # dispatch by the VALUE'S TYPE, not first-non-null: a
        # ["null","long","double"] union must route 2.5 to the double
        # branch, not truncate it through int() on the long branch
        for lenient in (False, True):
            for i, branch in enumerate(schema):
                if _union_branch_matches(value, branch, lenient):
                    out += _zigzag_encode(i)
                    if _norm(branch) != "null":
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
# schema resolution (reader != writer) — Avro 1.11 spec, "Schema
# Resolution": this is the Schema-Registry contract the reference
# depends on (/root/reference/README.md:389, registry service in
# docker-compose.yml:69-80) — a consumer reading records written under
# an OLDER schema.  Rules implemented:
#   - record fields matched BY NAME (writer order on the wire);
#     writer-only fields are decoded and discarded; reader-only fields
#     take their schema default (error if none)
#   - promotions: int -> long/float/double, long -> float/double,
#     float -> double, string <-> bytes
#   - unions on either side: the writer's branch index picks the
#     written schema, which is then resolved against the reader's
#     first structurally-matching branch
#   - arrays/maps resolve their item/value schemas recursively
# --------------------------------------------------------------------------

_PROMOTIONS = {
    "int": {"int", "long", "float", "double"},
    "long": {"long", "float", "double"},
    "float": {"float", "double"},
    "double": {"double"},
    "string": {"string", "bytes"},
    "bytes": {"bytes", "string"},
    "boolean": {"boolean"},
    "null": {"null"},
}


def _resolvable(writer: Any, reader: Any) -> bool:
    """Can data written as ``writer`` be read as ``reader``?  (Shallow
    structural check used to pick a reader-union branch.)"""
    w, r = _norm(writer), _norm(reader)
    if isinstance(r, list):
        return any(_resolvable(w, rb) for rb in r)
    if isinstance(w, list):
        # a writer union resolves if every branch could (spec resolves
        # per-datum, but for branch-picking any-match is enough)
        return any(_resolvable(wb, r) for wb in w)
    if isinstance(w, str) and isinstance(r, str):
        return r in _PROMOTIONS.get(w, set())
    if isinstance(w, dict) and isinstance(r, dict):
        return w.get("type") == r.get("type")
    return False


def _promote(value: Any, writer: str, reader: str) -> Any:
    if writer == reader or value is None:
        return value
    if reader in ("float", "double"):
        return float(value)
    if reader == "long":
        return int(value)
    if writer == "string" and reader == "bytes":
        return value.encode("utf-8")
    if writer == "bytes" and reader == "string":
        return bytes(value).decode("utf-8")
    return value


def _default_value(schema: Any, default: Any) -> Any:
    """Coerce an Avro JSON default to the Python value space (spec: a
    union's default is typed by its FIRST branch; bytes defaults are
    latin-1-escaped JSON strings)."""
    s = _norm(schema)
    if isinstance(s, list):
        return _default_value(s[0], default)
    if s == "bytes" and isinstance(default, str):
        return default.encode("latin-1")
    if s in ("float", "double") and default is not None:
        return float(default)
    return default


def _decode_resolved(
    buf: bytes, pos: int, writer: Any, reader: Any
) -> tuple[Any, int]:
    writer, reader = _norm(writer), _norm(reader)
    if isinstance(writer, list):
        idx, pos = _zigzag_decode(buf, pos)
        return _decode_resolved(buf, pos, writer[idx], reader)
    if isinstance(reader, list):
        for rb in reader:
            if _resolvable(writer, rb):
                return _decode_resolved(buf, pos, writer, rb)
        raise ValueError(
            f"writer schema {writer!r} matches no reader union branch {reader!r}"
        )
    if isinstance(writer, str) and isinstance(reader, str):
        if reader not in _PROMOTIONS.get(writer, set()):
            raise ValueError(f"cannot promote {writer!r} to {reader!r}")
        value, pos = _decode(buf, pos, writer)
        return _promote(value, writer, reader), pos
    if isinstance(writer, dict) and isinstance(reader, dict):
        wt, rt = writer.get("type"), reader.get("type")
        if wt != rt:
            raise ValueError(f"cannot resolve {wt!r} as {rt!r}")
        if wt == "record":
            wfields = {f["name"]: f for f in writer["fields"]}
            rec = {}
            for wf in writer["fields"]:  # wire order = writer order
                name = wf["name"]
                rf = next(
                    (f for f in reader["fields"] if f["name"] == name), None
                )
                if rf is None:  # writer-only: decode and discard
                    _, pos = _decode(buf, pos, wf["type"])
                else:
                    rec[name], pos = _decode_resolved(
                        buf, pos, wf["type"], rf["type"]
                    )
            for rf in reader["fields"]:  # reader-only: defaults
                if rf["name"] in wfields:
                    continue
                if "default" not in rf:
                    raise ValueError(
                        f"reader field {rf['name']!r} absent from writer "
                        "schema and has no default"
                    )
                rec[rf["name"]] = _default_value(rf["type"], rf["default"])
            return rec, pos
        if wt == "array":
            items = []
            while True:
                n, pos = _zigzag_decode(buf, pos)
                if n == 0:
                    break
                if n < 0:
                    _, pos = _zigzag_decode(buf, pos)
                    n = -n
                for _ in range(n):
                    it, pos = _decode_resolved(
                        buf, pos, writer["items"], reader["items"]
                    )
                    items.append(it)
            return items, pos
        if wt == "map":
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
                    kv[k], pos = _decode_resolved(
                        buf, pos, writer["values"], reader["values"]
                    )
            return kv, pos
    raise TypeError(
        f"unsupported resolution: writer={writer!r} reader={reader!r}"
    )


# --------------------------------------------------------------------------
# row-level API (the pure-Python reference codec)
# --------------------------------------------------------------------------


def encode_record(rec: dict, schema_json: str) -> bytes:
    out = bytearray()
    _encode(rec, json.loads(schema_json), out)
    return bytes(out)


def decode_record(
    buf: bytes, schema_json: str, reader_schema_json: str | None = None
) -> dict:
    """Decode one record.  With ``reader_schema_json`` the bytes are
    decoded under the WRITER schema and resolved into the READER's
    field set per the Avro spec's Schema Resolution rules."""
    writer = json.loads(schema_json)
    if reader_schema_json is None:
        rec, pos = _decode(bytes(buf), 0, writer)
    else:
        rec, pos = _decode_resolved(
            bytes(buf), 0, writer, json.loads(reader_schema_json)
        )
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
    reader_schema_json: str | None = None,
) -> DataFrame:
    """Decode an Avro binary value column back into typed columns.
    ``field_types`` is the Spark DDL for the decoded fields (the
    StructType the Schema-Registry schema maps to).  Pass
    ``reader_schema_json`` to read bytes written under an older
    (writer) schema, resolved per the Avro spec — ``field_types`` then
    describes the READER's field set."""
    from pyspark.sql.types import StructType

    # parse the DDL properly: splitting on "," mangles nested types
    # like map<string,int> or decimal(10,2)
    names = [f.name for f in StructType.fromDDL(field_types).fields]

    def _batches(iterator):
        import pandas as pd

        for pdf in iterator:
            recs = [
                decode_record(b, schema_json, reader_schema_json)
                for b in pdf[value_col]
            ]
            yield pd.DataFrame({n: [r[n] for r in recs] for n in names})

    return df.mapInPandas(_batches, schema=field_types)


# --------------------------------------------------------------------------
# Confluent Schema-Registry wire envelope (public format: magic byte 0 +
# 4-byte big-endian schema id + Avro binary).  This is HOW a topic can
# carry records written under different schema versions at once — the
# consumer reads the id per record, fetches that writer schema from the
# registry, and resolves it to its own reader schema.  The reference's
# every stream runs on exactly this envelope
# (/root/reference/README.md:389-427; registry docker-compose.yml:69-80).
# --------------------------------------------------------------------------

_MAGIC = 0


def encode_confluent(rec: dict, schema_json: str, schema_id: int) -> bytes:
    return (
        bytes([_MAGIC])
        + int(schema_id).to_bytes(4, "big")
        + encode_record(rec, schema_json)
    )


def decode_confluent(
    buf: bytes,
    registry: dict[int, str],
    reader_schema_json: str | None = None,
) -> dict:
    """Decode one registry-framed record: writer schema looked up by the
    embedded id, then (optionally) resolved to the reader schema."""
    buf = bytes(buf)
    if len(buf) < 5 or buf[0] != _MAGIC:
        raise ValueError("not a Schema-Registry framed record")
    schema_id = int.from_bytes(buf[1:5], "big")
    writer = registry.get(schema_id)
    if writer is None:
        raise KeyError(f"schema id {schema_id} not in registry")
    return decode_record(buf[5:], writer, reader_schema_json)


def to_avro_confluent_py(
    df: DataFrame,
    cols: list[str],
    schema_json: str,
    schema_id: int,
    out_col: str = "value",
) -> DataFrame:
    """Registry-framed variant of :func:`to_avro_py`."""

    def _batches(iterator):
        import pandas as pd

        for pdf in iterator:
            vals = [
                encode_confluent(
                    {c: (None if pd.isna(rec[c]) else rec[c]) for c in cols},
                    schema_json,
                    schema_id,
                )
                for rec in pdf[cols].to_dict("records")
            ]
            yield pdf.drop(columns=cols).assign(**{out_col: vals})

    keep = [c for c in df.columns if c not in cols]
    fields = ", ".join(f"{c} {t}" for c, t in df.dtypes if c in keep)
    schema = (fields + ", " if fields else "") + f"{out_col} binary"
    return df.mapInPandas(_batches, schema=schema)


def from_avro_confluent_py(
    df: DataFrame,
    value_col: str,
    registry: dict[int, str],
    field_types: str,
    reader_schema_json: str | None = None,
) -> DataFrame:
    """Registry-framed variant of :func:`from_avro_py`: each record's
    writer schema is dispatched PER RECORD by the embedded schema id,
    so one topic can mix records produced before and after a schema
    upgrade — the exact consumer contract Schema Registry provides."""
    from pyspark.sql.types import StructType

    names = [f.name for f in StructType.fromDDL(field_types).fields]

    def _batches(iterator):
        import pandas as pd

        for pdf in iterator:
            recs = [
                decode_confluent(b, registry, reader_schema_json)
                for b in pdf[value_col]
            ]
            yield pd.DataFrame({n: [r[n] for r in recs] for n in names})

    return df.mapInPandas(_batches, schema=field_types)
