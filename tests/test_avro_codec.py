"""Avro binary wire-format tests for the pure-Python codec.

The golden fixtures are HAND-COMPUTED from the Avro 1.11 specification
(zigzag varints, little-endian IEEE floats, varint-length strings,
union branch indexes) — a roundtrip test alone cannot catch a
self-consistent-but-wrong codec, so the byte layout itself is pinned.
"""

import json

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from trainee_scala_module_8_kafka_streaming_etl_pipeline_spark.sources.avro_codec import (
    decode_record,
    encode_record,
    from_avro_py,
    to_avro_py,
)

ENVELOPE = json.dumps(
    {
        "type": "record",
        "name": "value",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "name", "type": "string"},
            {"name": "value", "type": ["null", "double"]},
        ],
    }
)


def test_golden_wire_format_matches_spec():
    # id=3 -> zigzag 6 -> 0x06; "ab" -> len varint 0x04 + bytes;
    # union branch 1 -> 0x02; 1.5 as little-endian double
    got = encode_record({"id": 3, "name": "ab", "value": 1.5}, ENVELOPE)
    assert got == bytes.fromhex("06" "04 6162" "02" "000000000000f83f")
    # id=-1 -> zigzag 1; empty string -> 0x00; null branch -> 0x00
    got = encode_record({"id": -1, "name": "", "value": None}, ENVELOPE)
    assert got == bytes.fromhex("01 00 00")


def test_golden_varint_boundaries():
    s = json.dumps({"type": "record", "name": "r",
                    "fields": [{"name": "n", "type": "long"}]})
    assert encode_record({"n": 64}, s) == bytes([0x80, 0x01])  # spec example
    assert encode_record({"n": -64}, s) == bytes([0x7F])
    assert encode_record({"n": -65}, s) == bytes([0x81, 0x01])


def test_golden_array_blocks():
    s = json.dumps({"type": "record", "name": "r",
                    "fields": [{"name": "a",
                                "type": {"type": "array", "items": "long"}}]})
    # count zigzag(2)=0x04, items zigzag(1)=0x02 zigzag(2)=0x04, term 0x00
    assert encode_record({"a": [1, 2]}, s) == bytes([0x04, 0x02, 0x04, 0x00])
    assert encode_record({"a": []}, s) == bytes([0x00])
    assert decode_record(bytes([0x04, 0x02, 0x04, 0x00]), s) == {"a": [1, 2]}


def test_trailing_bytes_rejected():
    buf = encode_record({"id": 1, "name": "x", "value": None}, ENVELOPE)
    with pytest.raises(ValueError, match="trailing"):
        decode_record(buf + b"\x00", ENVELOPE)


_rec = st.fixed_dictionaries(
    {
        "id": st.integers(-(2**62), 2**62),
        "name": st.text(max_size=12),
        "value": st.one_of(
            st.none(),
            st.floats(allow_nan=False, allow_infinity=False, width=64),
        ),
        "flags": st.lists(st.booleans(), max_size=5),
        "tags": st.dictionaries(st.text(max_size=4), st.integers(-100, 100),
                                max_size=4),
    }
)

_FULL = json.dumps(
    {
        "type": "record",
        "name": "value",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "name", "type": "string"},
            {"name": "value", "type": ["null", "double"]},
            {"name": "flags", "type": {"type": "array", "items": "boolean"}},
            {"name": "tags", "type": {"type": "map", "values": "int"}},
        ],
    }
)


@given(rec=_rec)
@settings(max_examples=100, deadline=None)
def test_roundtrip_arbitrary_records(rec):
    assert decode_record(encode_record(rec, _FULL), _FULL) == rec


@pytest.mark.usefixtures("spark")
def test_spark_roundtrip_through_avro_binary(spark):
    """to_avro_py -> from_avro_py over a DataFrame reproduces the rows,
    including NULLs, through genuine Avro binary bytes."""
    rows = [(1, "click", 2.5), (2, "view", None), (3, "购买", -0.125)]
    df = spark.createDataFrame(rows, "user_id long, event_type string, value double")
    sch = json.dumps(
        {
            "type": "record",
            "name": "value",
            "fields": [
                {"name": "user_id", "type": "long"},
                {"name": "event_type", "type": "string"},
                {"name": "value", "type": ["null", "double"]},
            ],
        }
    )
    enc = to_avro_py(df, ["user_id", "event_type", "value"], sch)
    assert dict(enc.dtypes)["value"] == "binary"
    dec = from_avro_py(
        enc, "value", sch, "user_id long, event_type string, value double"
    )
    assert sorted(
        (r.user_id, r.event_type, r.value) for r in dec.collect()
    ) == sorted(rows)
