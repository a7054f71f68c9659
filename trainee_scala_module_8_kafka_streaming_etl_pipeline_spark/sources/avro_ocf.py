"""Avro Object Container Files (OCF) — the file-at-rest companion to
the topic transport in ``avro_codec.py``, implementing the public
Avro 1.11 "Object Container Files" spec
(https://avro.apache.org/docs/1.11.1/specification/#object-container-files):

    header   = magic 'Obj' 0x01
             + file metadata (an Avro map<bytes>: avro.schema = the
               writer schema JSON, avro.codec = 'null' | 'deflate')
             + 16-byte sync marker
    block    = varint record count
             + varint byte size of the (possibly compressed) payload
             + payload (codec applied to concatenated Avro records)
             + the header's 16-byte sync marker (corruption check)

Why it exists here: the reference moves data over Schema-Registry
topics, but every large-scale ingest pipeline also meets Avro as a
bulk interchange FILE format (Sqoop/NiFi/Connect S3 sink exports,
vendor data drops).  The records inside a block use exactly the
compiled binary codec from ``avro_codec``, including reader!=writer
resolution — the OCF layer adds only framing, metadata, sync-marker
verification, and the deflate codec (raw DEFLATE, zlib wbits=-15).

Spark-first shape: OCF payloads ride a binary DataFrame column (one
file per row — ``spark.read.format("binaryFile")`` at scale) and are
decoded by the same Arrow-batched ``mapInPandas`` pattern as the
topic decode; each file's block chain is sequential, but files are
embarrassingly parallel, which is how a 100 TB lake of OCF exports
actually arrives (many files, bounded file size).  The sync marker is
derived deterministically from the writer schema (md5), keeping
builds reproducible; readers never assume it — they verify whatever
marker the header declares.
"""

from __future__ import annotations

import hashlib
import json
import zlib

from pyspark.sql import DataFrame

from .avro_codec import (
    _NAT_SENTINEL,
    _decoder,
    _encoder,
    _soa_decoder,
    _zigzag_decode,
    _zigzag_encode,
)

_MAGIC = b"Obj\x01"
_CODECS = ("null", "deflate")


def _sync_marker(schema_json: str) -> bytes:
    return hashlib.md5(("ocf-sync:" + schema_json).encode()).digest()


def _write_meta_map(meta: dict[str, bytes], out: bytearray) -> None:
    if meta:
        out += _zigzag_encode(len(meta))
        for k, v in meta.items():
            raw = k.encode("utf-8")
            out += _zigzag_encode(len(raw))
            out += raw
            out += _zigzag_encode(len(v))
            out += v
    out += _zigzag_encode(0)


def _read_meta_map(buf: bytes, pos: int) -> tuple[dict[str, bytes], int]:
    meta: dict[str, bytes] = {}
    while True:
        n, pos = _zigzag_decode(buf, pos)
        if n == 0:
            return meta, pos
        if n < 0:  # block-size-prefixed form, spec-permitted
            _, pos = _zigzag_decode(buf, pos)
            n = -n
        for _ in range(n):
            klen, pos = _zigzag_decode(buf, pos)
            key = buf[pos:pos + klen].decode("utf-8")
            pos += klen
            vlen, pos = _zigzag_decode(buf, pos)
            if vlen < 0 or pos + vlen > len(buf):
                raise ValueError("corrupt OCF metadata value length")
            meta[key] = buf[pos:pos + vlen]
            pos += vlen


def write_ocf(
    records: list[dict],
    schema_json: str,
    codec: str = "null",
    records_per_block: int = 1000,
) -> bytes:
    """Serialize ``records`` into one OCF byte string (header + sync-
    delimited blocks).  ``codec``: 'null' or 'deflate' (raw DEFLATE)."""
    if codec not in _CODECS:
        raise ValueError(f"unsupported OCF codec {codec!r}")
    write = _encoder(schema_json)
    sync = _sync_marker(schema_json)
    out = bytearray(_MAGIC)
    _write_meta_map(
        {
            "avro.schema": schema_json.encode("utf-8"),
            "avro.codec": codec.encode("utf-8"),
        },
        out,
    )
    out += sync
    for i in range(0, len(records), records_per_block):
        chunk = records[i:i + records_per_block]
        payload = bytearray()
        for rec in chunk:
            write(rec, payload)
        body = bytes(payload)
        if codec == "deflate":
            comp = zlib.compressobj(wbits=-15)  # raw DEFLATE per spec
            body = comp.compress(body) + comp.flush()
        out += _zigzag_encode(len(chunk))
        out += _zigzag_encode(len(body))
        out += body
        out += sync
    return bytes(out)


def _ocf_header(buf: bytes) -> tuple[str, str, bytes, int]:
    """(writer schema JSON, codec, sync marker, position after header)."""
    if buf[:4] != _MAGIC:
        raise ValueError("not an Avro Object Container File (bad magic)")
    meta, pos = _read_meta_map(buf, 4)
    schema = meta.get("avro.schema")
    if schema is None:
        raise ValueError("OCF header is missing avro.schema")
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    if codec not in _CODECS:
        raise ValueError(f"unsupported OCF codec {codec!r}")
    sync = buf[pos:pos + 16]
    if len(sync) != 16:
        raise ValueError("truncated OCF header (short sync marker)")
    return schema.decode("utf-8"), codec, sync, pos + 16


def read_ocf(
    buf: bytes, reader_schema_json: str | None = None
) -> list[dict]:
    """Decode every record of one OCF payload, optionally resolving
    the embedded writer schema to ``reader_schema_json`` per the Avro
    spec's Schema Resolution rules (same engine as the topic path)."""
    buf = bytes(buf)
    schema, codec, sync, pos = _ocf_header(buf)
    dec = _decoder(schema, reader_schema_json)
    records: list[dict] = []
    append = records.append
    while pos < len(buf):
        count, pos = _zigzag_decode(buf, pos)
        size, pos = _zigzag_decode(buf, pos)
        if count < 0 or size < 0 or pos + size + 16 > len(buf):
            raise ValueError(f"corrupt OCF block at offset {pos}")
        body = buf[pos:pos + size]
        pos += size
        if buf[pos:pos + 16] != sync:
            raise ValueError(
                f"OCF sync marker mismatch at offset {pos} (corrupt or "
                "misaligned block)"
            )
        pos += 16
        if codec == "deflate":
            body = zlib.decompress(body, wbits=-15)
        bpos = 0
        for _ in range(count):
            rec, bpos = dec(body, bpos)
            append(rec)
        if bpos != len(body):
            raise ValueError(
                f"trailing {len(body) - bpos} bytes in OCF block"
            )
    return records


def from_ocf_py(
    df: DataFrame,
    value_col: str,
    field_types: str,
    reader_schema_json: str | None = None,
    keep: list[str] | None = None,
) -> DataFrame:
    """Decode a binary column of OCF payloads (one FILE per row — the
    ``binaryFile`` datasource shape) into typed rows, one output row
    per contained record.  Arrow-batched; each file's records append
    straight into per-column lists through the same structure-of-
    arrays readers as the topic decode, with the writer schema taken
    from each file's own header (files written under different schema
    versions co-exist, exactly like mixed-id topics)."""
    from pyspark.sql.types import StructType

    names = tuple(f.name for f in StructType.fromDDL(field_types).fields)
    keep = list(keep or [])

    def _batches(iterator):
        import numpy as np
        import pandas as pd

        soa_cache: dict[str, object] = {}
        post_holder: list = [None]
        for pdf in iterator:
            columns: list = [[] for _ in names]
            appends = [c.append for c in columns]
            keep_vals: dict[str, list] = {c: [] for c in keep}
            for idx, b in enumerate(pdf[value_col]):
                buf = bytes(b)
                schema, codec, sync, pos = _ocf_header(buf)
                rr = soa_cache.get(schema)
                if rr is None:
                    rr = _soa_decoder(schema, reader_schema_json, names)
                    post = tuple(getattr(rr, "post", ()))
                    if post_holder[0] is None:
                        post_holder[0] = post
                    elif post_holder[0] != post:
                        raise ValueError(
                            "OCF files disagree on temporal column "
                            "layout; pass reader_schema_json to fix one"
                        )
                    soa_cache[schema] = rr
                n_before = len(columns[0])
                while pos < len(buf):
                    count, pos = _zigzag_decode(buf, pos)
                    size, pos = _zigzag_decode(buf, pos)
                    if count < 0 or size < 0 or pos + size + 16 > len(buf):
                        raise ValueError(
                            f"corrupt OCF block at offset {pos}"
                        )
                    body = buf[pos:pos + size]
                    pos += size
                    if buf[pos:pos + 16] != sync:
                        raise ValueError(
                            f"OCF sync marker mismatch at offset {pos} "
                            "(corrupt or misaligned block)"
                        )
                    pos += 16
                    if codec == "deflate":
                        body = zlib.decompress(body, wbits=-15)
                    bpos = 0
                    for _ in range(count):
                        bpos = rr(body, appends, bpos)
                    if bpos != len(body):
                        raise ValueError(
                            f"trailing {len(body) - bpos} bytes in "
                            "OCF block"
                        )
                n_new = len(columns[0]) - n_before
                for c in keep:
                    keep_vals[c].extend([pdf[c].iloc[idx]] * n_new)
            for slot, unit in post_holder[0] or ():
                columns[slot] = pd.Series(
                    np.array(
                        [
                            _NAT_SENTINEL if v is None else v
                            for v in columns[slot]
                        ],
                        dtype="int64",
                    ).view(f"datetime64[{unit}]")
                )
            data = dict(keep_vals)
            data.update(zip(names, columns))
            yield pd.DataFrame(data)

    dtypes = dict(df.dtypes)
    parts = [f"{c} {dtypes[c]}" for c in keep]
    parts.append(field_types)
    return df.mapInPandas(_batches, schema=", ".join(parts))
