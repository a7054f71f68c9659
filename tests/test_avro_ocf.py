"""Avro Object Container File tests: header layout pinned against the
Avro 1.11 spec's OCF section, null + deflate codecs, schema resolution
through the file header, corruption detection, and the binary-column
DataFrame decode path."""

import json

import pytest

from trainee_scala_module_8_kafka_streaming_etl_pipeline_spark.sources.avro_ocf import (
    from_ocf_py,
    read_ocf,
    write_ocf,
)

SCHEMA = json.dumps({"type": "record", "name": "ev", "fields": [
    {"name": "k", "type": "long"},
    {"name": "name", "type": "string"},
    {"name": "value", "type": ["null", "double"]}]})

ROWS = [
    {"k": 1, "name": "a", "value": 1.5},
    {"k": 2, "name": "b", "value": None},
    {"k": 3, "name": "c", "value": -2.25},
]


def test_ocf_header_layout_matches_spec():
    buf = write_ocf(ROWS, SCHEMA)
    assert buf[:4] == b"Obj\x01"  # magic, spec-pinned
    # metadata map: block count 2 (zigzag 4), then avro.schema first
    assert buf[4] == 0x04
    klen = buf[5] >> 1  # zigzag of len("avro.schema") = 11 -> 0x16
    assert buf[5] == 0x16 and buf[6:6 + klen] == b"avro.schema"
    # sync marker is 16 bytes and every block ends with it
    assert buf.count(buf[-16:]) >= 2  # header copy + last block


def test_ocf_roundtrip_null_and_deflate():
    for codec in ("null", "deflate"):
        buf = write_ocf(ROWS, SCHEMA, codec=codec)
        assert read_ocf(buf) == ROWS
    # deflate actually compresses a repetitive payload
    many = [{"k": i, "name": "x" * 40, "value": 1.0} for i in range(500)]
    raw = write_ocf(many, SCHEMA, codec="null")
    comp = write_ocf(many, SCHEMA, codec="deflate")
    assert len(comp) < len(raw) / 2


def test_ocf_multi_block_and_empty():
    many = [{"k": i, "name": str(i), "value": float(i)} for i in range(25)]
    buf = write_ocf(many, SCHEMA, records_per_block=7)  # 4 blocks
    assert read_ocf(buf) == many
    assert read_ocf(write_ocf([], SCHEMA)) == []


def test_ocf_schema_resolution_via_header():
    """The reader resolves each file's EMBEDDED writer schema — v1
    files remain readable after the schema moves to v2."""
    v2 = json.dumps({"type": "record", "name": "ev", "fields": [
        {"name": "name", "type": "string"},          # reordered
        {"name": "k", "type": "long"},
        {"name": "src", "type": "string", "default": "ocf-v2"}]})
    buf = write_ocf(ROWS, SCHEMA)
    got = read_ocf(buf, reader_schema_json=v2)
    assert got == [{"name": r["name"], "k": r["k"], "src": "ocf-v2"}
                   for r in ROWS]


def test_ocf_corruption_detected():
    buf = bytearray(write_ocf(ROWS, SCHEMA))
    with pytest.raises(ValueError, match="bad magic"):
        read_ocf(b"PAR1" + bytes(buf[4:]))
    # flip a byte inside the trailing sync marker
    buf[-3] ^= 0xFF
    with pytest.raises(ValueError, match="sync marker"):
        read_ocf(bytes(buf))
    # truncated final block
    with pytest.raises(ValueError, match="corrupt OCF block|sync"):
        read_ocf(write_ocf(ROWS, SCHEMA)[:-10])
    with pytest.raises(ValueError, match="unsupported OCF codec"):
        write_ocf(ROWS, SCHEMA, codec="snappy")


def test_from_ocf_py_dataframe_path(spark):
    """Binary-column decode: one OCF file per input row (the
    binaryFile shape), mixed v1/v2 files resolved to one reader,
    keep-columns replicated per contained record, temporal logicals
    vectorized."""
    import datetime as dt

    s_ts = json.dumps({"type": "record", "name": "ev", "fields": [
        {"name": "k", "type": "long"},
        {"name": "ts", "type": {"type": "long",
                                "logicalType": "timestamp-micros"}}]})
    s_ts2 = json.dumps({"type": "record", "name": "ev", "fields": [
        {"name": "ts", "type": {"type": "long",
                                "logicalType": "timestamp-micros"}},
        {"name": "k", "type": "long"},
        {"name": "tag", "type": "string", "default": "v2"}]})
    t = dt.datetime(2024, 5, 1, 8, 30, 0)
    f1 = write_ocf(
        [{"k": 1, "ts": t}, {"k": 2, "ts": t.replace(hour=9)}], s_ts)
    f2 = write_ocf(
        [{"k": 3, "ts": t.replace(hour=10), "tag": "n3"}], s_ts2,
        codec="deflate")
    df = spark.createDataFrame(
        [("file1", bytearray(f1)), ("file2", bytearray(f2))],
        "path string, content binary")
    out = from_ocf_py(
        df, "content", "k long, ts timestamp, tag string",
        reader_schema_json=s_ts2, keep=["path"],
    ).collect()
    got = {r.k: (r.path, r.ts, r.tag) for r in out}
    assert got == {
        1: ("file1", t, "v2"),
        2: ("file1", t.replace(hour=9), "v2"),
        3: ("file2", t.replace(hour=10), "n3"),
    }


# ----- replay property: the "avro_ocf_roundtrip" entry's contract -----------

from hypothesis import given
from hypothesis import strategies as st
from replay_profile import replay_settings

_ETYPES = ("click", "view", "purchase")


@given(
    st.lists(
        st.tuples(
            st.integers(0, 50),                      # user_id
            st.sampled_from(_ETYPES),                # event_type
            st.one_of(st.none(), st.integers(0, 500_000)),  # value micros
        ),
        max_size=60,
    ),
    st.integers(1, 5),   # records per block
    st.sampled_from(("null", "deflate")),
)
@replay_settings(25)
def test_ocf_roundtrip_entry_contract_replay(rows, per_block, codec):
    """Pure-Python replay of the `avro_ocf_roundtrip` registry entry:
    bucket by user_id % 8, pack each bucket into one OCF (random block
    size + codec), decode EVERY file, and compare the per-event_type
    (count, micro-sum) aggregate against direct aggregation of the
    original rows — any framing, compression, block-boundary, or
    record-codec loss shows up as an aggregate mismatch."""
    recs = [
        {"user_id": u, "event_type": t,
         "value": None if v is None else v / 1e6}
        for u, t, v in rows
    ]
    buckets: dict[int, list] = {}
    for r in recs:
        buckets.setdefault(r["user_id"] % 8, []).append(r)
    files = [
        write_ocf(b, SCHEMA_EV, codec=codec, records_per_block=per_block)
        for b in buckets.values()
    ]
    decoded = [r for f in files for r in read_ocf(f)]

    def agg(rs):
        out: dict[str, list] = {}
        for r in rs:
            n, s = out.setdefault(r["event_type"], [0, 0])
            out[r["event_type"]][0] = n + 1
            if r["value"] is not None:
                out[r["event_type"]][1] = s + round(r["value"] * 1e6)
        return {k: tuple(v) for k, v in out.items()}

    assert agg(decoded) == agg(recs)


SCHEMA_EV = json.dumps({"type": "record", "name": "ev", "fields": [
    {"name": "user_id", "type": "long"},
    {"name": "event_type", "type": "string"},
    {"name": "value", "type": ["null", "double"]}]})
