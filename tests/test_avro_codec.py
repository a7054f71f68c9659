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


# --------------------------------------------------------------------------
# schema resolution (reader != writer) — byte-level spec fixtures.
# Every record below is encoded BY HAND-CHECKED bytes under the WRITER
# schema, then decoded under a DIFFERENT reader schema; the resolution
# rules exercised are the Avro 1.11 spec's "Schema Resolution" section.
# --------------------------------------------------------------------------

V1 = json.dumps(
    {
        "type": "record",
        "name": "customer",
        "fields": [
            {"name": "id", "type": "int"},
            {"name": "name", "type": "string"},
            {"name": "age", "type": "int"},
        ],
    }
)
# v2: age removed, id promoted int->long, fields reordered, new
# "country" with a default, new nullable "score" defaulting to null
V2 = json.dumps(
    {
        "type": "record",
        "name": "customer",
        "fields": [
            {"name": "name", "type": "string"},
            {"name": "id", "type": "long"},
            {"name": "country", "type": "string", "default": "unknown"},
            {"name": "score", "type": ["null", "double"], "default": None},
        ],
    }
)


def test_resolution_golden_bytes_v1_read_as_v2():
    # id=3 -> 0x06; "ab" -> 0x04 6162; age=25 -> zigzag 50 = 0x32
    buf = bytes.fromhex("06 04 6162 32")
    assert encode_record({"id": 3, "name": "ab", "age": 25}, V1) == buf
    assert decode_record(buf, V1, V2) == {
        "name": "ab",        # matched by name despite reorder
        "id": 3,             # int -> long promotion
        "country": "unknown",  # reader-only: default
        "score": None,       # reader-only union: default on first branch
    }                        # age: writer-only, decoded and discarded


def test_resolution_promotions():
    w = json.dumps({"type": "record", "name": "r", "fields": [
        {"name": "i", "type": "int"},
        {"name": "f", "type": "float"},
        {"name": "s", "type": "string"},
        {"name": "b", "type": "bytes"},
    ]})
    r = json.dumps({"type": "record", "name": "r", "fields": [
        {"name": "i", "type": "double"},
        {"name": "f", "type": "double"},
        {"name": "s", "type": "bytes"},
        {"name": "b", "type": "string"},
    ]})
    buf = encode_record({"i": 7, "f": 1.5, "s": "hi", "b": b"ok"}, w)
    out = decode_record(buf, w, r)
    assert out == {"i": 7.0, "f": 1.5, "s": b"hi", "b": "ok"}
    assert isinstance(out["i"], float)


def test_resolution_writer_union_reader_plain_and_vice_versa():
    wu = json.dumps({"type": "record", "name": "r", "fields": [
        {"name": "v", "type": ["null", "int"]}]})
    rp = json.dumps({"type": "record", "name": "r", "fields": [
        {"name": "v", "type": "long"}]})
    # writer union branch 1 (int 5): 0x02 0x0a — resolved into plain long
    assert decode_record(bytes([0x02, 0x0A]), wu, rp) == {"v": 5}
    # plain writer into reader union: int 5 -> ["string","long"] picks long
    wp = json.dumps({"type": "record", "name": "r", "fields": [
        {"name": "v", "type": "int"}]})
    ru = json.dumps({"type": "record", "name": "r", "fields": [
        {"name": "v", "type": ["string", "long"]}]})
    assert decode_record(bytes([0x0A]), wp, ru) == {"v": 5}


def test_resolution_nested_array_and_missing_default_errors():
    w = json.dumps({"type": "record", "name": "r", "fields": [
        {"name": "a", "type": {"type": "array", "items": "int"}}]})
    r = json.dumps({"type": "record", "name": "r", "fields": [
        {"name": "a", "type": {"type": "array", "items": "double"}}]})
    buf = encode_record({"a": [1, 2]}, w)
    assert decode_record(buf, w, r) == {"a": [1.0, 2.0]}

    r_bad = json.dumps({"type": "record", "name": "r", "fields": [
        {"name": "a", "type": {"type": "array", "items": "double"}},
        {"name": "zz", "type": "int"}]})  # no default
    with pytest.raises(ValueError, match="no default"):
        decode_record(buf, w, r_bad)
    # illegal demotion double -> int is rejected, not silently truncated
    w2 = json.dumps({"type": "record", "name": "r", "fields": [
        {"name": "x", "type": "double"}]})
    r2 = json.dumps({"type": "record", "name": "r", "fields": [
        {"name": "x", "type": "int"}]})
    with pytest.raises(ValueError, match="promote"):
        decode_record(encode_record({"x": 1.0}, w2), w2, r2)


def test_union_branch_dispatch_by_type():
    # ["null","long","double"]: a float must take the double branch
    # (index 2), not truncate through int() on the long branch
    s = json.dumps({"type": "record", "name": "r", "fields": [
        {"name": "v", "type": ["null", "long", "double"]}]})
    buf = encode_record({"v": 2.5}, s)
    assert buf[0] == 0x04  # zigzag(2): double branch
    assert decode_record(buf, s) == {"v": 2.5}
    assert decode_record(encode_record({"v": 7}, s), s) == {"v": 7}
    assert decode_record(encode_record({"v": None}, s), s) == {"v": None}
    # int rides a float-only union via the lenient pass
    s2 = json.dumps({"type": "record", "name": "r", "fields": [
        {"name": "v", "type": ["null", "double"]}]})
    assert decode_record(encode_record({"v": 3}, s2), s2) == {"v": 3.0}
    # a string into a numeric-only union raises instead of corrupting
    with pytest.raises(ValueError, match="no union branch"):
        encode_record({"v": "oops"}, s)


def test_from_avro_py_nested_ddl_and_reader_schema(spark):
    """DDL with commas inside types parses correctly, and the
    DataFrame-level decode honours reader-schema resolution."""
    rows = [(i, encode_record({"id": i, "name": f"n{i}", "age": 20 + i}, V1))
            for i in range(4)]
    df = spark.createDataFrame(rows, "k long, value binary")
    out = from_avro_py(
        df.select("value"), "value", V1,
        "name string, id long, country string, score double",
        reader_schema_json=V2,
    )
    got = {r.id: (r.name, r.country, r.score) for r in out.collect()}
    assert got == {i: (f"n{i}", "unknown", None) for i in range(4)}

    # nested-comma DDL: map<string,int> used to be mis-split on ","
    s = json.dumps({"type": "record", "name": "r", "fields": [
        {"name": "m", "type": {"type": "map", "values": "int"}},
        {"name": "tag", "type": "string"}]})
    df2 = spark.createDataFrame(
        [(encode_record({"m": {"a": 1}, "tag": "t"}, s),)], "value binary")
    out2 = from_avro_py(df2, "value", s, "m map<string,int>, tag string")
    [r] = out2.collect()
    assert r.tag == "t" and dict(r.m) == {"a": 1}


def test_confluent_envelope_golden_bytes_and_mixed_topic(spark):
    """The Schema-Registry wire envelope (magic 0 + 4-byte big-endian
    schema id + Avro binary) pinned at the byte level, and a mixed
    v1/v2 'topic' decoded per record to the reader shape."""
    from trainee_scala_module_8_kafka_streaming_etl_pipeline_spark.sources.avro_codec import (
        decode_confluent,
        encode_confluent,
        from_avro_confluent_py,
        to_avro_confluent_py,
    )

    s1 = json.dumps({"type": "record", "name": "r", "fields": [
        {"name": "id", "type": "long"}]})
    s2 = json.dumps({"type": "record", "name": "r", "fields": [
        {"name": "tag", "type": "string", "default": "old"},
        {"name": "id", "type": "long"}]})
    # id=3 under schema id 7: 00 | 00000007 | zigzag(3)=06
    buf = encode_confluent({"id": 3}, s1, 7)
    assert buf == bytes.fromhex("00 00000007 06")
    reg = {7: s1, 8: s2}
    assert decode_confluent(buf, reg, s2) == {"tag": "old", "id": 3}
    with pytest.raises(KeyError, match="99"):
        decode_confluent(encode_confluent({"id": 1}, s1, 99), reg)
    with pytest.raises(ValueError, match="framed"):
        decode_confluent(b"\x01\x00\x00\x00\x07\x06", reg)

    # mixed-version topic through the DataFrame path
    df1 = spark.createDataFrame([(i,) for i in range(3)], "id long")
    df2 = spark.createDataFrame(
        [("new", i) for i in range(3, 5)], "tag string, id long")
    enc = to_avro_confluent_py(df1, ["id"], s1, 7).unionByName(
        to_avro_confluent_py(df2, ["tag", "id"], s2, 8)
    )
    out = from_avro_confluent_py(
        enc, "value", reg, "tag string, id long", reader_schema_json=s2)
    got = {r.id: r.tag for r in out.collect()}
    assert got == {0: "old", 1: "old", 2: "old", 3: "new", 4: "new"}


# --------------------------------------------------------------------------
# compatibility-mode enforcement (the registry's write-side gate) and
# the round-7 codec hardening: numpy scalar unions, record-name union
# branch picking, tombstone-aware DataFrame decode.
# --------------------------------------------------------------------------


def _sch(fields):
    return json.dumps({"type": "record", "name": "subj", "fields": fields})


def test_check_compatibility_backward():
    from trainee_scala_module_8_kafka_streaming_etl_pipeline_spark.sources.avro_codec import (
        IncompatibleSchemaError,
        check_compatibility,
    )

    v1 = _sch([{"name": "id", "type": "int"},
               {"name": "age", "type": "int"}])
    # BACKWARD-compatible: drop a field, add one WITH a default,
    # promote int -> long
    ok = _sch([{"name": "id", "type": "long"},
               {"name": "country", "type": "string", "default": "xx"}])
    check_compatibility(ok, [v1], "BACKWARD")
    # BACKWARD-incompatible: new reader field without a default
    bad = _sch([{"name": "id", "type": "int"},
                {"name": "country", "type": "string"}])
    with pytest.raises(IncompatibleSchemaError, match="BACKWARD"):
        check_compatibility(bad, [v1], "BACKWARD")
    # ... and an illegal demotion long -> int
    v1l = _sch([{"name": "id", "type": "long"}])
    bad2 = _sch([{"name": "id", "type": "int"}])
    with pytest.raises(IncompatibleSchemaError, match="BACKWARD"):
        check_compatibility(bad2, [v1l], "BACKWARD")


def test_check_compatibility_forward_and_full():
    from trainee_scala_module_8_kafka_streaming_etl_pipeline_spark.sources.avro_codec import (
        IncompatibleSchemaError,
        check_compatibility,
    )

    v1 = _sch([{"name": "id", "type": "int"},
               {"name": "age", "type": "int", "default": 0}])
    # FORWARD-compatible: new schema ADDS a field (old reader discards
    # it); dropping "age" is also forward-OK because old reader has a
    # default for it
    add = _sch([{"name": "id", "type": "int"},
                {"name": "age", "type": "int", "default": 0},
                {"name": "extra", "type": "string"}])
    check_compatibility(add, [v1], "FORWARD")
    # FORWARD-incompatible: dropping a field the old reader requires
    v1_req = _sch([{"name": "id", "type": "int"},
                   {"name": "name", "type": "string"}])
    drop = _sch([{"name": "id", "type": "int"}])
    with pytest.raises(IncompatibleSchemaError, match="FORWARD"):
        check_compatibility(drop, [v1_req], "FORWARD")
    # FULL requires both directions: adding a defaulted field passes,
    # adding a non-defaulted one fails the BACKWARD half
    both = _sch([{"name": "id", "type": "int"},
                 {"name": "age", "type": "int", "default": 0},
                 {"name": "tag", "type": "string", "default": "x"}])
    check_compatibility(both, [v1], "FULL")
    nofull = _sch([{"name": "id", "type": "int"},
                   {"name": "tag", "type": "string"}])
    with pytest.raises(IncompatibleSchemaError):
        check_compatibility(nofull, [v1], "FULL")


def test_check_compatibility_transitive_vs_latest_only():
    from trainee_scala_module_8_kafka_streaming_etl_pipeline_spark.sources.avro_codec import (
        IncompatibleSchemaError,
        check_compatibility,
    )

    v1 = _sch([{"name": "a", "type": "int"}])
    v2 = _sch([{"name": "a", "type": "int"},
               {"name": "b", "type": "int", "default": 0}])
    # v3 reads v2 (b has default there) but NOT v1 (c lacks a default
    # and v1 never had it... construct: c required, present in v2 only)
    v2c = _sch([{"name": "a", "type": "int"},
                {"name": "c", "type": "int", "default": 0}])
    v3 = _sch([{"name": "a", "type": "int"},
               {"name": "c", "type": "int"}])  # c now REQUIRED, no default
    # plain BACKWARD checks only the latest prior (v2c): c pairs by
    # name, compatible
    check_compatibility(v3, [v1, v2c], "BACKWARD")
    # transitive also checks v1, where c is absent and has no default
    with pytest.raises(IncompatibleSchemaError, match="BACKWARD_TRANSITIVE"):
        check_compatibility(v3, [v1, v2c], "BACKWARD_TRANSITIVE")


def test_schema_registry_gates_registration():
    from trainee_scala_module_8_kafka_streaming_etl_pipeline_spark.sources.avro_codec import (
        IncompatibleSchemaError,
        SchemaRegistry,
        decode_confluent,
        encode_confluent,
    )

    reg = SchemaRegistry(mode="BACKWARD")
    v1 = _sch([{"name": "id", "type": "int"}])
    v2 = _sch([{"name": "id", "type": "long"},
               {"name": "tag", "type": "string", "default": "t"}])
    bad = _sch([{"name": "id", "type": "int"},
                {"name": "req", "type": "string"}])
    id1 = reg.register("topic-value", v1)
    assert id1 == 1
    # idempotent re-registration returns the same id
    assert reg.register("topic-value", v1) == 1
    with pytest.raises(IncompatibleSchemaError):
        reg.register("topic-value", bad)
    id2 = reg.register("topic-value", v2)
    assert id2 == 2 and reg.latest("topic-value") == (2, v2)
    # the registry object itself serves decode_confluent lookups
    buf = encode_confluent({"id": 5}, v1, id1)
    assert decode_confluent(buf, reg, v2) == {"id": 5, "tag": "t"}
    # unknown modes rejected loudly
    with pytest.raises(ValueError, match="mode"):
        SchemaRegistry(mode="SIDEWAYS")


def test_union_branch_accepts_numpy_scalars():
    """to_dict('records') yields np.int64/np.bool_, which are NOT
    subclasses of int/bool — the union matcher must unwrap them."""
    np = pytest.importorskip("numpy")
    s = json.dumps({"type": "record", "name": "r", "fields": [
        {"name": "v", "type": ["null", "long"]},
        {"name": "b", "type": ["null", "boolean"]},
        {"name": "f", "type": ["null", "float"]}]})
    rec = {"v": np.int64(7), "b": np.bool_(True), "f": np.float32(1.5)}
    assert decode_record(encode_record(rec, s), s) == {
        "v": 7, "b": True, "f": 1.5}


def test_reader_union_record_branches_matched_by_name():
    """A reader union with two record branches must pick by record
    NAME (spec match-by-fullname), not first-record-wins."""
    cat = {"type": "record", "name": "cat", "fields": [
        {"name": "meow", "type": "int"}]}
    dog = {"type": "record", "name": "dog", "fields": [
        {"name": "woof", "type": "int"}]}
    w = json.dumps({"type": "record", "name": "r", "fields": [
        {"name": "pet", "type": dog}]})
    r = json.dumps({"type": "record", "name": "r", "fields": [
        {"name": "pet", "type": [cat, dog]}]})
    buf = encode_record({"pet": {"woof": 3}}, w)
    assert decode_record(buf, w, r) == {"pet": {"woof": 3}}
    # mismatched record names refuse to resolve rather than silently
    # decoding the wrong branch
    r_only_cat = json.dumps({"type": "record", "name": "r", "fields": [
        {"name": "pet", "type": [cat]}]})
    with pytest.raises(ValueError, match="union branch"):
        decode_record(buf, w, r_only_cat)


def test_from_avro_py_tombstones_and_keep_columns(spark):
    """A Kafka tombstone (null VALUE, live key/offset metadata) decodes
    to an all-NULL row flagged in tombstone_col, with keep= columns
    passing through beside the decoded fields."""
    s = json.dumps({"type": "record", "name": "v", "fields": [
        {"name": "name", "type": "string"},
        {"name": "score", "type": ["null", "double"]}]})
    rows = [
        (1, 10, encode_record({"name": "a", "score": 1.5}, s)),
        (2, 11, None),  # tombstone for key 2
        (1, 12, encode_record({"name": "b", "score": None}, s)),
    ]
    df = spark.createDataFrame(rows, "k long, _offset long, value binary")
    out = from_avro_py(
        df, "value", s, "name string, score double",
        keep=["k", "_offset"], tombstone_col="__deleted",
    ).collect()
    got = {r._offset: (r.k, r.name, r.score, r["__deleted"]) for r in out}
    assert got == {
        10: (1, "a", 1.5, False),
        11: (2, None, None, True),
        12: (1, "b", None, False),
    }
    # without tombstone_col a null value is still a loud error
    with pytest.raises(Exception, match="(?i)nonetype|framed|null"):
        from_avro_py(
            df, "value", s, "name string, score double", keep=["k"]
        ).collect()


def test_logical_types_golden_bytes_and_roundtrip():
    """Avro logical types (the encodings Debezium/Connect put on the
    reference's topics): decimal = minimal two's-complement big-endian
    unscaled bytes, date = int days, timestamp-micros = long micros.
    Byte layout pinned by hand against the spec."""
    import datetime as dt
    from decimal import Decimal

    s = json.dumps({"type": "record", "name": "r", "fields": [
        {"name": "d", "type": {"type": "bytes", "logicalType": "decimal",
                               "precision": 18, "scale": 2}},
        {"name": "day", "type": {"type": "int", "logicalType": "date"}},
        {"name": "ts", "type": {"type": "long",
                                "logicalType": "timestamp-micros"}},
        {"name": "tm", "type": {"type": "int",
                                "logicalType": "time-millis"}},
        {"name": "u", "type": ["null",
                               {"type": "bytes", "logicalType": "decimal",
                                "precision": 18, "scale": 6}]},
    ]})
    rec = {"d": Decimal("123.45"), "day": dt.date(1970, 1, 3),
           "ts": dt.datetime(2024, 1, 1, 12, 30, 0, 123456),
           "tm": dt.time(1, 2, 3, 456000), "u": None}
    buf = encode_record(rec, s)
    # decimal 12345 -> 0x3039 (varint len 2 = 0x04); date 2 days ->
    # zigzag(2) = 0x04
    assert buf[:4] == bytes.fromhex("04 3039 04")
    assert decode_record(buf, s) == rec

    # negative decimal: -1.50 scale 2 -> unscaled -150 -> minimal
    # two's complement 0xFF6A (Java BigInteger.toByteArray layout)
    s2 = json.dumps({"type": "record", "name": "r", "fields": [
        {"name": "d", "type": {"type": "bytes", "logicalType": "decimal",
                               "precision": 9, "scale": 2}}]})
    b2 = encode_record({"d": Decimal("-1.50")}, s2)
    assert b2 == bytes.fromhex("04 ff6a")
    assert decode_record(b2, s2) == {"d": Decimal("-1.50")}
    # an int encodes as the already-unscaled integer (exact micro-unit
    # arithmetic can stay JVM-side right up to the encode)
    assert decode_record(encode_record({"d": 12345}, s2), s2) == {
        "d": Decimal("123.45")}
    # a decimal that does not fit the schema scale errors rather than
    # silently truncating
    with pytest.raises(ValueError, match="scale"):
        encode_record({"d": Decimal("1.005")}, s2)
    # union dispatch routes Decimal values to the decimal branch
    rec2 = dict(rec, u=Decimal("2.000001"))
    assert decode_record(encode_record(rec2, s), s)["u"] == Decimal(
        "2.000001")


def test_logical_types_resolution_uses_reader_conversion():
    """Resolution is by BASE type; the READER's logical conversion is
    applied (writer plain long -> reader timestamp gets converted,
    writer logical -> plain reader stays a long)."""
    import datetime as dt

    w = json.dumps({"type": "record", "name": "r", "fields": [
        {"name": "t", "type": "long"}]})
    r = json.dumps({"type": "record", "name": "r", "fields": [
        {"name": "t", "type": {"type": "long",
                               "logicalType": "timestamp-micros"}}]})
    assert decode_record(encode_record({"t": 1_000_000}, w), w, r) == {
        "t": dt.datetime(1970, 1, 1, 0, 0, 1)}
    assert decode_record(
        encode_record({"t": dt.datetime(1970, 1, 1, 0, 0, 2)}, r), r, w
    ) == {"t": 2_000_000}


def test_enum_and_fixed_golden_bytes():
    """enum = zigzag varint of the symbol index; fixed = exactly
    ``size`` raw bytes; decimal-on-fixed = sign-extended padding to the
    declared width (Connect writes fixed-width decimals this way)."""
    from decimal import Decimal

    s = json.dumps({"type": "record", "name": "r", "fields": [
        {"name": "c", "type": {"type": "enum", "name": "color",
                               "symbols": ["RED", "GREEN", "BLUE"]}}]})
    b = encode_record({"c": "BLUE"}, s)
    assert b == bytes([0x04])  # zigzag(2)
    assert decode_record(b, s) == {"c": "BLUE"}
    with pytest.raises(ValueError, match="symbol"):
        encode_record({"c": "PINK"}, s)

    s2 = json.dumps({"type": "record", "name": "r", "fields": [
        {"name": "f", "type": {"type": "fixed", "name": "md5",
                               "size": 4}}]})
    assert encode_record({"f": b"\x01\x02\x03\x04"}, s2) == b"\x01\x02\x03\x04"
    assert decode_record(b"\xaa\xbb\xcc\xdd", s2) == {"f": b"\xaa\xbb\xcc\xdd"}
    with pytest.raises(ValueError, match="4 bytes"):
        encode_record({"f": b"\x01"}, s2)

    s3 = json.dumps({"type": "record", "name": "r", "fields": [
        {"name": "d", "type": {"type": "fixed", "name": "amt", "size": 4,
                               "logicalType": "decimal",
                               "precision": 9, "scale": 2}}]})
    assert encode_record({"d": Decimal("1.50")}, s3) == bytes.fromhex(
        "00000096")
    assert encode_record({"d": Decimal("-1.50")}, s3) == bytes.fromhex(
        "ffffff6a")
    assert decode_record(bytes.fromhex("ffffff6a"), s3) == {
        "d": Decimal("-1.50")}
    with pytest.raises(ValueError, match="fit fixed"):
        encode_record({"d": Decimal("99999999.99")}, s3)


def test_enum_resolution_default_and_fixed_size_rules():
    """Spec resolution: a writer enum symbol absent from the reader
    falls to the reader's enum default (Avro 1.9+) or errors per
    datum; fixed requires matching name AND size."""
    from trainee_scala_module_8_kafka_streaming_etl_pipeline_spark.sources.avro_codec import (
        IncompatibleSchemaError,
        check_compatibility,
    )

    w = json.dumps({"type": "record", "name": "r", "fields": [
        {"name": "c", "type": {"type": "enum", "name": "color",
                               "symbols": ["RED", "GREEN", "BLUE"]}}]})
    r_def = json.dumps({"type": "record", "name": "r", "fields": [
        {"name": "c", "type": {"type": "enum", "name": "color",
                               "symbols": ["RED", "GREEN"],
                               "default": "RED"}}]})
    r_nodef = json.dumps({"type": "record", "name": "r", "fields": [
        {"name": "c", "type": {"type": "enum", "name": "color",
                               "symbols": ["RED", "GREEN"]}}]})
    buf = encode_record({"c": "BLUE"}, w)
    assert decode_record(buf, w, r_def) == {"c": "RED"}
    assert decode_record(encode_record({"c": "GREEN"}, w), w, r_def) == {
        "c": "GREEN"}
    with pytest.raises(ValueError, match="absent from"):
        decode_record(buf, w, r_nodef)
    # the registration-time gate agrees with the read-time rule
    check_compatibility(r_def, [w], "BACKWARD")
    with pytest.raises(IncompatibleSchemaError):
        check_compatibility(r_nodef, [w], "BACKWARD")

    w2 = json.dumps({"type": "record", "name": "r", "fields": [
        {"name": "f", "type": {"type": "fixed", "name": "md5",
                               "size": 4}}]})
    r2 = json.dumps({"type": "record", "name": "r", "fields": [
        {"name": "f", "type": {"type": "fixed", "name": "md5",
                               "size": 8}}]})
    with pytest.raises(ValueError, match="size mismatch"):
        decode_record(encode_record({"f": b"abcd"}, w2), w2, r2)

    # union with enum/fixed branches dispatches by value shape
    s4 = json.dumps({"type": "record", "name": "r", "fields": [
        {"name": "v", "type": ["null",
                               {"type": "enum", "name": "color",
                                "symbols": ["RED", "GREEN"]},
                               {"type": "fixed", "name": "h",
                                "size": 2}]}]})
    for v in ("GREEN", b"ab", None):
        assert decode_record(encode_record({"v": v}, s4), s4) == {"v": v}


def test_decimal_on_fixed_compatibility_and_union_resolution():
    """Regression (r7 ADVICE, medium): a logical-on-fixed schema must
    keep its name/size through normalization — re-registering an
    identical decimal-on-fixed schema is legal under every mode, and a
    reader union containing a logical-fixed branch resolves."""
    from decimal import Decimal

    from trainee_scala_module_8_kafka_streaming_etl_pipeline_spark.sources.avro_codec import (
        SchemaRegistry,
        check_compatibility,
    )

    s = json.dumps({"type": "record", "name": "r", "fields": [
        {"name": "d", "type": {"type": "fixed", "name": "amt", "size": 4,
                               "logicalType": "decimal",
                               "precision": 9, "scale": 2}}]})
    # identical re-registration is compatible under every mode
    for mode in ("BACKWARD", "FORWARD", "FULL", "FULL_TRANSITIVE"):
        check_compatibility(s, [s], mode)
    reg = SchemaRegistry(mode="BACKWARD")
    sid = reg.register("t-value", s)
    assert reg.register("t-value", s) == sid  # idempotent, no raise

    # a reader union with a logical-fixed branch accepts the writer's
    # bare decimal-on-fixed datum (resolution by base fixed name/size)
    r = json.dumps({"type": "record", "name": "r", "fields": [
        {"name": "d", "type": ["null",
                               {"type": "fixed", "name": "amt", "size": 4,
                                "logicalType": "decimal",
                                "precision": 9, "scale": 2}]}]})
    buf = encode_record({"d": Decimal("1.50")}, s)
    assert decode_record(buf, s, r) == {"d": Decimal("1.50")}
    # and size still discriminates: a mismatched fixed finds no branch
    r_bad = json.dumps({"type": "record", "name": "r", "fields": [
        {"name": "d", "type": [{"type": "fixed", "name": "amt", "size": 8,
                                "logicalType": "decimal",
                                "precision": 9, "scale": 2}]}]})
    with pytest.raises(ValueError, match="no reader union branch"):
        decode_record(buf, s, r_bad)


def test_decimal_minimal_bytes_at_byte_boundaries():
    """Regression (r7 ADVICE, low): -2^(8k-1) must encode to exactly k
    bytes (Java BigInteger.toByteArray parity: -128 -> 80, not ff80)."""
    from decimal import Decimal

    s = json.dumps({"type": "record", "name": "r", "fields": [
        {"name": "d", "type": {"type": "bytes", "logicalType": "decimal",
                               "precision": 18, "scale": 0}}]})
    cases = {
        -128: "02 80",          # varint len 1
        -32768: "04 8000",      # varint len 2
        127: "02 7f",
        128: "04 0080",         # positive needs the sign byte
        -129: "04 ff7f",
        0: "02 00",
    }
    for n, hexpect in cases.items():
        buf = encode_record({"d": Decimal(n)}, s)
        assert buf == bytes.fromhex(hexpect), (n, buf.hex())
        assert decode_record(buf, s) == {"d": Decimal(n)}


def test_millis_logical_int_passthrough():
    """Regression (r7 ADVICE, low): an integer fed to a -millis logical
    field is the already-converted BASE value (millis), exactly as an
    int fed to -micros is micros — encode_record({'t': 5000}) writes
    5000 ms, not 5."""
    import datetime as dt

    ts_ms = json.dumps({"type": "record", "name": "r", "fields": [
        {"name": "t", "type": {"type": "long",
                               "logicalType": "timestamp-millis"}}]})
    buf = encode_record({"t": 5000}, ts_ms)
    assert decode_record(buf, ts_ms) == {
        "t": dt.datetime(1970, 1, 1, 0, 0, 5)}
    tm_ms = json.dumps({"type": "record", "name": "r", "fields": [
        {"name": "t", "type": {"type": "int",
                               "logicalType": "time-millis"}}]})
    assert decode_record(encode_record({"t": 5000}, tm_ms), tm_ms) == {
        "t": dt.time(0, 0, 5)}
    # datetime/time objects still convert through the unit divide
    assert decode_record(
        encode_record({"t": dt.datetime(1970, 1, 1, 0, 0, 7)}, ts_ms), ts_ms
    ) == {"t": dt.datetime(1970, 1, 1, 0, 0, 7)}


def test_uuid_logical_rides_string():
    """uuid is annotation-only per the spec: the wire layout is the
    plain string encoding, values round-trip as strings, and
    string <-> uuid resolves both ways."""
    u = "123e4567-e89b-12d3-a456-426614174000"
    s_uuid = json.dumps({"type": "record", "name": "r", "fields": [
        {"name": "u", "type": {"type": "string", "logicalType": "uuid"}}]})
    s_str = json.dumps({"type": "record", "name": "r", "fields": [
        {"name": "u", "type": "string"}]})
    buf = encode_record({"u": u}, s_uuid)
    assert buf == encode_record({"u": u}, s_str)  # identical wire bytes
    assert decode_record(buf, s_uuid) == {"u": u}
    assert decode_record(buf, s_uuid, s_str) == {"u": u}
    assert decode_record(buf, s_str, s_uuid) == {"u": u}
    # uuid inside a nullable union dispatches as a string value
    s_un = json.dumps({"type": "record", "name": "r", "fields": [
        {"name": "u", "type": ["null",
                               {"type": "string", "logicalType": "uuid"}]}]})
    for v in (u, None):
        assert decode_record(encode_record({"u": v}, s_un), s_un) == {"u": v}


def test_unknown_logical_type_rides_base():
    """Spec: an unknown logicalType is IGNORED — the value rides the
    base encoding untouched, on primitives and on named bases alike."""
    s = json.dumps({"type": "record", "name": "r", "fields": [
        {"name": "t", "type": {"type": "long",
                               "logicalType": "timestamp-nanos"}}]})
    plain = json.dumps({"type": "record", "name": "r", "fields": [
        {"name": "t", "type": "long"}]})
    buf = encode_record({"t": 123456789}, s)
    assert buf == encode_record({"t": 123456789}, plain)
    assert decode_record(buf, s) == {"t": 123456789}  # raw long out
    # unknown logical on a FIXED base keeps name/size (the _norm rule)
    sf = json.dumps({"type": "record", "name": "r", "fields": [
        {"name": "f", "type": {"type": "fixed", "name": "h", "size": 3,
                               "logicalType": "duration-ish"}}]})
    assert decode_record(encode_record({"f": b"abc"}, sf), sf) == {
        "f": b"abc"}
    from trainee_scala_module_8_kafka_streaming_etl_pipeline_spark.sources.avro_codec import (
        check_compatibility,
    )
    check_compatibility(sf, [sf], "FULL")


# ---------------------------------------------------------------------------
# Differential property: the COMPILED codec vs a spec-literal INTERPRETED
# decoder kept here in the test file (the mirrored-oracle lesson, SURVEY §5,
# applied to the codec itself).  Random (writer, reader) schema pairs and
# conforming records; the interpreter walks schema dicts per datum and makes
# every resolution decision independently of avro_codec's compile step.
# ---------------------------------------------------------------------------

import datetime as _ddt
from decimal import Decimal as _Dec

from replay_profile import replay_settings

from trainee_scala_module_8_kafka_streaming_etl_pipeline_spark.sources.avro_codec import (  # noqa: E501
    _soa_decoder,
)

_SPEC_EPOCH = _ddt.datetime(1970, 1, 1)


def _spec_varint(buf, pos):
    shift = acc = 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not (b & 0x80):
            return (acc >> 1) ^ -(acc & 1), pos
        shift += 7


def _spec_simplify(s):
    if isinstance(s, dict) and set(s) == {"type"}:
        return _spec_simplify(s["type"])
    return s


def _spec_kind(s):
    """'null'/'boolean'/.../'record'/'enum'/'fixed'/'array'/'map'/'union'"""
    s = _spec_simplify(s)
    if isinstance(s, list):
        return "union"
    if isinstance(s, str):
        return s
    return s["type"]


def _spec_logical_conv(s):
    """Per the spec's Logical Types section: decoded base value ->
    logical value, or None (unknown logicals/uuid ride the base)."""
    if not (isinstance(s, dict) and "logicalType" in s):
        return None
    t = s["logicalType"]
    if t == "decimal":
        sc = int(s.get("scale", 0))
        return lambda b: _Dec(int.from_bytes(bytes(b), "big", signed=True)) / (
            _Dec(10) ** sc
        )
    if t == "date":
        return lambda d: _SPEC_EPOCH.date() + _ddt.timedelta(days=d)
    if t == "time-millis":
        return lambda m: (_SPEC_EPOCH + _ddt.timedelta(milliseconds=m)).time()
    if t == "time-micros":
        return lambda m: (_SPEC_EPOCH + _ddt.timedelta(microseconds=m)).time()
    if t == "timestamp-millis":
        return lambda m: _SPEC_EPOCH + _ddt.timedelta(milliseconds=m)
    if t == "timestamp-micros":
        return lambda m: _SPEC_EPOCH + _ddt.timedelta(microseconds=m)
    return None


def _spec_read_base(s, buf, pos):
    """Interpreted decode of the BASE layout of schema ``s``."""
    import struct as _struct

    s = _spec_simplify(s)
    k = _spec_kind(s)
    if k == "null":
        return None, pos
    if k == "boolean":
        return buf[pos] != 0, pos + 1
    if k in ("int", "long"):
        return _spec_varint(buf, pos)
    if k == "float":
        return _struct.unpack_from("<f", buf, pos)[0], pos + 4
    if k == "double":
        return _struct.unpack_from("<d", buf, pos)[0], pos + 8
    if k in ("bytes", "string"):
        n, pos = _spec_varint(buf, pos)
        raw = buf[pos:pos + n]
        return (raw.decode("utf-8") if k == "string" else raw), pos + n
    if k == "fixed":
        n = int(s["size"])
        return buf[pos:pos + n], pos + n
    if k == "enum":
        i, pos = _spec_varint(buf, pos)
        return s["symbols"][i], pos
    if k == "union":
        i, pos = _spec_varint(buf, pos)
        return _spec_read(s[i], buf, pos)
    if k == "array":
        items = []
        while True:
            n, pos = _spec_varint(buf, pos)
            if n == 0:
                return items, pos
            if n < 0:
                _, pos = _spec_varint(buf, pos)
                n = -n
            for _ in range(n):
                v, pos = _spec_read(s["items"], buf, pos)
                items.append(v)
    if k == "map":
        kv = {}
        while True:
            n, pos = _spec_varint(buf, pos)
            if n == 0:
                return kv, pos
            if n < 0:
                _, pos = _spec_varint(buf, pos)
                n = -n
            for _ in range(n):
                klen, pos = _spec_varint(buf, pos)
                key = buf[pos:pos + klen].decode("utf-8")
                pos += klen
                kv[key], pos = _spec_read(s["values"], buf, pos)
    if k == "record":
        rec = {}
        for f in s["fields"]:
            rec[f["name"]], pos = _spec_read(f["type"], buf, pos)
        return rec, pos
    raise TypeError(f"spec interpreter: unsupported {s!r}")


def _spec_read(s, buf, pos):
    conv = _spec_logical_conv(_spec_simplify(s))
    v, pos = _spec_read_base(s, buf, pos)
    return (conv(v) if conv is not None and v is not None else v), pos


_SPEC_PROMO = {
    "int": {"int", "long", "float", "double"},
    "long": {"long", "float", "double"},
    "float": {"float", "double"},
    "double": {"double"},
    "string": {"string", "bytes"},
    "bytes": {"bytes", "string"},
    "boolean": {"boolean"},
    "null": {"null"},
}


def _spec_can_read(w, r):
    w, r = _spec_simplify(w), _spec_simplify(r)
    if isinstance(r, list):
        return any(_spec_can_read(w, rb) for rb in r)
    if isinstance(w, list):
        return any(_spec_can_read(wb, r) for wb in w)
    wk, rk = _spec_kind(w), _spec_kind(r)
    if wk in _SPEC_PROMO and rk in _SPEC_PROMO:
        return rk in _SPEC_PROMO[wk]
    if wk != rk:
        return False
    if wk in ("record", "enum", "fixed"):
        wn, rn = w.get("name"), r.get("name")
        if wn is not None and rn is not None and wn != rn:
            return False
        return wk != "fixed" or int(w["size"]) == int(r["size"])
    if wk == "array":
        return _spec_can_read(w["items"], r["items"])
    if wk == "map":
        return _spec_can_read(w["values"], r["values"])
    return True


def _spec_default(s, d):
    s = _spec_simplify(s)
    if isinstance(s, list):
        return _spec_default(s[0], d)
    conv = _spec_logical_conv(s)
    k = _spec_kind(s)
    if isinstance(d, str) and k in ("bytes", "fixed"):
        d = d.encode("latin-1")
    if conv is not None and d is not None:
        return conv(d)
    if k in ("float", "double") and d is not None:
        return float(d)
    return d


def _spec_resolved(w, r, buf, pos):
    """Interpreted Schema Resolution (Avro 1.11 'Schema Resolution'):
    per-datum decisions, no compilation anywhere."""
    w, r = _spec_simplify(w), _spec_simplify(r)
    if isinstance(w, list):  # writer union: index picks written schema
        i, pos = _spec_varint(buf, pos)
        return _spec_resolved(w[i], r, buf, pos)
    if isinstance(r, list):  # reader union: first matching branch
        for rb in r:
            if _spec_can_read(w, rb):
                return _spec_resolved(w, rb, buf, pos)
        raise ValueError("spec: no reader union branch")
    wk, rk = _spec_kind(w), _spec_kind(r)
    rconv = _spec_logical_conv(r)
    if wk in _SPEC_PROMO:  # primitive-based (incl. logical bases)
        if rk not in _SPEC_PROMO[wk]:
            raise ValueError(f"spec: cannot promote {wk} to {rk}")
        v, pos = _spec_read_base(wk, buf, pos)
        if wk in ("int", "long") and rk in ("float", "double"):
            v = float(v)
        if wk == "bytes" and rk == "string":
            v = v.decode("utf-8")
        if wk == "string" and rk == "bytes":
            v = v.encode("utf-8")
        return (rconv(v) if rconv is not None and v is not None else v), pos
    if wk != rk:
        raise ValueError(f"spec: cannot resolve {wk} as {rk}")
    if wk == "record":
        rfields = {f["name"]: f for f in r["fields"]}
        rec = {}
        for wf in w["fields"]:
            rf = rfields.get(wf["name"])
            if rf is None:
                _, pos = _spec_read(wf["type"], buf, pos)  # discard
            else:
                rec[rf["name"]], pos = _spec_resolved(
                    wf["type"], rf["type"], buf, pos
                )
        wnames = {f["name"] for f in w["fields"]}
        for rf in r["fields"]:
            if rf["name"] not in wnames:
                rec[rf["name"]] = _spec_default(rf["type"], rf["default"])
        return rec, pos
    if wk == "enum":
        i, pos = _spec_varint(buf, pos)
        sym = w["symbols"][i]
        if sym in r["symbols"]:
            return sym, pos
        if "default" in r:
            return r["default"], pos
        raise ValueError("spec: enum symbol absent")
    if wk == "fixed":
        n = int(w["size"])
        v = buf[pos:pos + n]
        pos += n
        return (rconv(v) if rconv is not None else v), pos
    if wk == "array":
        items = []
        while True:
            n, pos = _spec_varint(buf, pos)
            if n == 0:
                return items, pos
            if n < 0:
                _, pos = _spec_varint(buf, pos)
                n = -n
            for _ in range(n):
                v, pos = _spec_resolved(w["items"], r["items"], buf, pos)
                items.append(v)
    if wk == "map":
        kv = {}
        while True:
            n, pos = _spec_varint(buf, pos)
            if n == 0:
                return kv, pos
            if n < 0:
                _, pos = _spec_varint(buf, pos)
                n = -n
            for _ in range(n):
                klen, pos = _spec_varint(buf, pos)
                key = buf[pos:pos + klen].decode("utf-8")
                pos += klen
                kv[key], pos = _spec_resolved(
                    w["values"], r["values"], buf, pos
                )
    raise TypeError(f"spec interpreter: unsupported {w!r}")


# ----- schema / value / evolution generators -------------------------------

_GEN_PRIMS = ("boolean", "int", "long", "float", "double", "string", "bytes")


@st.composite
def _gen_leaf(draw):
    kind = draw(st.sampled_from(
        ("prim", "prim", "prim", "logical", "enum", "fixed")))
    if kind == "prim":
        return draw(st.sampled_from(_GEN_PRIMS))
    if kind == "enum":
        syms = draw(st.lists(
            st.sampled_from(("RED", "GREEN", "BLUE", "AMBER")),
            min_size=2, max_size=4, unique=True))
        return {"type": "enum", "name": "en", "symbols": syms}
    if kind == "fixed":
        return {"type": "fixed", "name": "fx",
                "size": draw(st.integers(1, 4))}
    which = draw(st.sampled_from((
        "dec_bytes", "dec_fixed", "date", "time-millis", "time-micros",
        "timestamp-millis", "timestamp-micros", "uuid", "unknown")))
    if which == "dec_bytes":
        return {"type": "bytes", "logicalType": "decimal",
                "precision": 18, "scale": draw(st.integers(0, 4))}
    if which == "dec_fixed":
        return {"type": "fixed", "name": "dfx", "size": 6,
                "logicalType": "decimal", "precision": 12,
                "scale": draw(st.integers(0, 4))}
    if which == "uuid":
        return {"type": "string", "logicalType": "uuid"}
    if which == "unknown":
        return {"type": "long", "logicalType": "nanos-of-something"}
    base = "int" if which in ("date", "time-millis") else "long"
    return {"type": base, "logicalType": which}


@st.composite
def _gen_field_type(draw):
    kind = draw(st.sampled_from((
        "leaf", "leaf", "leaf", "null_union", "union3", "array", "map",
        "record")))
    if kind == "leaf":
        return draw(_gen_leaf())
    if kind == "null_union":
        return ["null", draw(_gen_leaf())]
    if kind == "union3":
        return ["null", "long", "string"]
    if kind == "array":
        items = draw(_gen_leaf())
        if draw(st.booleans()):
            items = ["null", items]  # union-typed array items are legal
        return {"type": "array", "items": items}
    if kind == "map":
        values = draw(_gen_leaf())
        if draw(st.booleans()):
            values = ["null", values]
        return {"type": "map", "values": values}
    return {"type": "record", "name": "nr", "fields": [
        {"name": "x", "type": draw(_gen_leaf())},
        {"name": "y", "type": "long"}]}


def _gen_value(draw, s):
    s = _spec_simplify(s)
    if isinstance(s, list):
        return _gen_value(draw, draw(st.sampled_from(s)))
    lt = s.get("logicalType") if isinstance(s, dict) else None
    if lt == "decimal":
        sc = int(s.get("scale", 0))
        size = int(s["size"]) if s.get("type") == "fixed" else None
        bound = (1 << (8 * size - 1)) - 1 if size else 10 ** 12
        n = draw(st.integers(-bound, bound))
        if draw(st.booleans()):
            return _Dec(n).scaleb(-sc)
        return n  # already-unscaled int passthrough
    if lt == "date":
        d = draw(st.integers(-40000, 40000))
        return (_SPEC_EPOCH.date() + _ddt.timedelta(days=d)
                if draw(st.booleans()) else d)
    if lt in ("time-millis", "time-micros"):
        us = draw(st.integers(0, 86_399_999_999))
        if lt == "time-millis":
            us = (us // 1000) * 1000
        if draw(st.booleans()):
            return (_SPEC_EPOCH + _ddt.timedelta(microseconds=us)).time()
        return us // 1000 if lt == "time-millis" else us
    if lt in ("timestamp-millis", "timestamp-micros"):
        us = draw(st.integers(-10 ** 15, 10 ** 15))
        if lt == "timestamp-millis":
            us = (us // 1000) * 1000
        if draw(st.booleans()):
            return _SPEC_EPOCH + _ddt.timedelta(microseconds=us)
        return us // 1000 if lt == "timestamp-millis" else us
    k = _spec_kind(s)
    if k == "null":
        return None
    if k == "boolean":
        return draw(st.booleans())
    if k == "int":
        return draw(st.integers(-(2 ** 31), 2 ** 31 - 1))
    if k == "long":
        return draw(st.integers(-(2 ** 62), 2 ** 62))
    if k == "float":
        return draw(st.floats(allow_nan=False, allow_infinity=False,
                              width=32))
    if k == "double":
        return draw(st.floats(allow_nan=False, allow_infinity=False))
    if k == "string":
        return draw(st.text(max_size=8))
    if k == "bytes":
        return draw(st.binary(max_size=8))
    if k == "fixed":
        return draw(st.binary(min_size=int(s["size"]),
                              max_size=int(s["size"])))
    if k == "enum":
        return draw(st.sampled_from(s["symbols"]))
    if k == "array":
        return [_gen_value(draw, s["items"])
                for _ in range(draw(st.integers(0, 3)))]
    if k == "map":
        keys = draw(st.lists(st.sampled_from("pqrs"), max_size=3,
                             unique=True))
        return {key: _gen_value(draw, s["values"]) for key in keys}
    if k == "record":
        return {f["name"]: _gen_value(draw, f["type"])
                for f in s["fields"]}
    raise TypeError(f"no generator for {s!r}")


_GEN_PROMO = {"int": ("int", "long", "float", "double"),
              "long": ("long", "float", "double"),
              "float": ("float", "double"),
              "string": ("string", "bytes")}

_GEN_ADDS = (
    ("extra_l", "long", 7),
    ("extra_s", "string", "dflt"),
    ("extra_n", ["null", "long"], None),
    ("extra_d", "double", 1.5),
    ("extra_b", "bytes", "ÿ"),
    ("extra_ts", {"type": "long", "logicalType": "timestamp-micros"},
     86_400_000_000),
)


@st.composite
def _gen_pair(draw):
    nf = draw(st.integers(1, 4))
    wfields = [{"name": f"f{i}", "type": draw(_gen_field_type())}
               for i in range(nf)]
    writer = {"type": "record", "name": "r", "fields": wfields}
    rfields = []
    for f in wfields:
        if len(wfields) > 1 and draw(st.integers(0, 4)) == 0:
            continue  # dropped in the reader (decode-and-discard)
        t = f["type"]
        if isinstance(t, str) and t in _GEN_PROMO:
            t = draw(st.sampled_from(_GEN_PROMO[t]))
            if draw(st.integers(0, 3)) == 0:
                t = ["null", t]  # non-union writer -> reader union
        elif isinstance(t, list) and draw(st.booleans()):
            # branch-REORDERED reader union: the writer's branch index
            # must remap through resolution, not carry over positionally
            t = list(reversed(t))
        rfields.append({"name": f["name"], "type": t})
    rfields = list(draw(st.permutations(rfields))) if rfields else []
    for add in draw(st.lists(st.sampled_from(_GEN_ADDS), max_size=2,
                             unique_by=lambda a: a[0])):
        rfields.append({"name": add[0], "type": add[1], "default": add[2]})
    reader = {"type": "record", "name": "r", "fields": rfields}
    value = {f["name"]: _gen_value(draw, f["type"]) for f in wfields}
    return writer, reader, value


@given(st.data())
@replay_settings(60)
def test_codec_differential_vs_spec_interpreter(data):
    writer, reader, value = data.draw(_gen_pair())
    wj, rj = json.dumps(writer), json.dumps(reader)
    enc = encode_record(value, wj)

    # 1. plain decode == interpreted decode of the same bytes
    spec_plain, pos = _spec_read(writer, enc, 0)
    assert pos == len(enc)
    assert decode_record(enc, wj) == spec_plain

    # 2. compiled resolution == interpreted resolution
    spec_res, pos = _spec_resolved(writer, reader, enc, 0)
    assert pos == len(enc)
    got = decode_record(enc, wj, rj)
    assert got == spec_res

    # 3. the SoA hot path agrees with the dict path field-for-field
    names = tuple(f["name"] for f in reader["fields"])
    rr = _soa_decoder(wj, rj, names)
    cols = [[] for _ in names]
    rr(enc, [c.append for c in cols])
    post = dict(getattr(rr, "post", ()))
    for i, n in enumerate(names):
        v = cols[i][0]
        if i in post and v is not None:  # raw epoch int: apply the
            v = _SPEC_EPOCH + _ddt.timedelta(  # batch-level conversion
                **{("microseconds" if post[i] == "us" else "milliseconds"): v}
            )
        assert v == got[n], (n, v, got[n])


def test_confluent_soa_mixed_writers_with_temporal_columns(spark):
    """Two writer schema versions on one framed topic, both carrying a
    timestamp-micros column, decoded through the SoA dispatcher with
    tombstones: per-record writer dispatch, the lazily-adopted
    batch-level datetime64 conversion, and NULL-value tombstone rows
    must all compose."""
    import datetime as dt

    from trainee_scala_module_8_kafka_streaming_etl_pipeline_spark.sources.avro_codec import (
        SchemaRegistry,
        encode_confluent,
        from_avro_confluent_py,
    )

    v1 = json.dumps({"type": "record", "name": "v", "fields": [
        {"name": "k", "type": "long"},
        {"name": "ts", "type": {"type": "long",
                                "logicalType": "timestamp-micros"}}]})
    v2 = json.dumps({"type": "record", "name": "v", "fields": [
        {"name": "ts", "type": {"type": "long",
                                "logicalType": "timestamp-micros"}},
        {"name": "k", "type": "long"},
        {"name": "note", "type": "string", "default": "v2"}]})
    reg = SchemaRegistry(mode="BACKWARD")
    id1 = reg.register("t-value", v1)
    id2 = reg.register("t-value", v2)

    t1 = dt.datetime(2024, 3, 1, 10, 0, 0, 123456)
    t2 = dt.datetime(2024, 3, 2, 11, 30, 0)
    rows = [
        (1, 10, encode_confluent({"k": 1, "ts": t1}, v1, id1)),
        (2, 11, None),  # tombstone
        (3, 12, encode_confluent(
            {"k": 3, "ts": t2, "note": "n3"}, v2, id2)),
    ]
    df = spark.createDataFrame(rows, "key long, _offset long, value binary")
    out = from_avro_confluent_py(
        df, "value", reg, "k long, ts timestamp, note string",
        reader_schema_json=v2, keep=["key", "_offset"],
        tombstone_col="__deleted",
    ).collect()
    got = {r._offset: (r.key, r.k, r.ts, r.note, r["__deleted"])
           for r in out}
    assert got == {
        10: (1, 1, t1, "v2", False),   # v1 record: default fills note
        11: (2, None, None, None, True),
        12: (3, 3, t2, "n3", False),
    }


def test_confluent_soa_temporal_layout_disagreement_raises():
    """Without a reader schema, one framed topic whose writer ids
    disagree on a column's temporal-ness (ts-micros vs plain long)
    cannot produce a homogeneous output column — the dispatcher must
    raise, not mix raw ints and datetimes."""
    from trainee_scala_module_8_kafka_streaming_etl_pipeline_spark.sources.avro_codec import (
        _soa_confluent_decoder,
        encode_confluent,
    )

    w_ts = json.dumps({"type": "record", "name": "v", "fields": [
        {"name": "ts", "type": {"type": "long",
                                "logicalType": "timestamp-micros"}}]})
    w_plain = json.dumps({"type": "record", "name": "v", "fields": [
        {"name": "ts", "type": "long"}]})
    registry = {1: w_ts, 2: w_plain}
    rr = _soa_confluent_decoder(registry, None, ("ts",))
    cols = [[]]
    appends = [cols[0].append]
    rr(encode_confluent({"ts": 5}, w_ts, 1), appends)
    with pytest.raises(ValueError, match="temporal column layout"):
        rr(encode_confluent({"ts": 5}, w_plain, 2), appends)
    # with a reader schema the layout is fixed by the reader: both ids
    # decode (the plain-long writer resolves to the reader's logical)
    rr2 = _soa_confluent_decoder(registry, w_ts, ("ts",))
    cols2 = [[]]
    ap2 = [cols2[0].append]
    rr2(encode_confluent({"ts": 5}, w_ts, 1), ap2)
    rr2(encode_confluent({"ts": 7}, w_plain, 2), ap2)
    assert cols2[0] == [5, 7]  # raw micros; the batch layer converts


def test_from_avro_tombstone_only_batch_keeps_schema(spark):
    """A micro-batch containing ONLY tombstones never compiles a
    writer schema (no post converters) — the all-NULL object columns
    must still convert to the declared output types."""
    from trainee_scala_module_8_kafka_streaming_etl_pipeline_spark.sources.avro_codec import (
        from_avro_py,
    )

    s = json.dumps({"type": "record", "name": "v", "fields": [
        {"name": "k", "type": "long"},
        {"name": "ts", "type": {"type": "long",
                                "logicalType": "timestamp-micros"}}]})
    df = spark.createDataFrame(
        [(1, None), (2, None)], "key long, value binary")
    out = from_avro_py(
        df, "value", s, "k long, ts timestamp",
        keep=["key"], tombstone_col="__deleted",
    )
    rows = out.collect()
    assert [f.dataType.simpleString() for f in out.schema.fields] == [
        "bigint", "bigint", "timestamp", "boolean"]
    assert all(r.k is None and r.ts is None and r["__deleted"]
               for r in rows)


# ----- spec-literal interpreted ENCODER (closes the differential loop:
# the decode properties above read bytes produced by the compiled
# encoder; this pins those bytes themselves against an independent
# per-datum interpretation of the spec's encodings + union dispatch) --


def _spec_zigzag_bytes(n):
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


def _spec_value_matches(v, s, lenient):
    """Independent union-dispatch rule: spec unions are resolved by the
    value's type; the lenient pass admits int<->float riding."""
    s = _spec_simplify(s)
    lt = s.get("logicalType") if isinstance(s, dict) else None
    is_int = isinstance(v, int) and not isinstance(v, bool)
    int_ish = is_int or (
        lenient and isinstance(v, float) and v.is_integer()
    )
    if lt == "decimal":
        return isinstance(v, _Dec) or int_ish
    if lt in ("timestamp-millis", "timestamp-micros"):
        return isinstance(v, _ddt.datetime) or int_ish
    if lt == "date":
        return (
            isinstance(v, _ddt.date) and not isinstance(v, _ddt.datetime)
        ) or int_ish
    if lt in ("time-millis", "time-micros"):
        return isinstance(v, _ddt.time) or int_ish
    k = _spec_kind(s)
    if k == "null":
        return v is None
    if v is None:
        return False
    if k == "boolean":
        return isinstance(v, bool)
    if k in ("int", "long"):
        return int_ish
    if k in ("float", "double"):
        return isinstance(v, float) or (lenient and is_int)
    if k == "string":
        return isinstance(v, str)
    if k == "bytes":
        return isinstance(v, (bytes, bytearray))
    if k == "fixed":
        return isinstance(v, (bytes, bytearray)) and len(v) == int(s["size"])
    if k == "enum":
        return isinstance(v, str) and v in s["symbols"]
    if k in ("record", "map"):
        return isinstance(v, dict)
    if k == "array":
        return isinstance(v, (list, tuple))
    return False


def _spec_logical_to_base(v, s):
    """logical value -> base value, interpreted per datum."""
    lt = s.get("logicalType") if isinstance(s, dict) else None
    if lt is None or v is None:
        return v
    if isinstance(v, (int, float)) and not isinstance(v, bool):
        if lt == "decimal" and isinstance(v, float):
            return int(v)
        if lt != "decimal":
            return int(v)  # already a base value
    if lt == "decimal":
        sc = int(s.get("scale", 0))
        if isinstance(v, _Dec):
            n = int(v.scaleb(sc))
        else:
            n = int(v)
        size = int(s["size"]) if s.get("type") == "fixed" else None
        if size is not None:
            return n.to_bytes(size, "big", signed=True)
        nb = ((n if n >= 0 else ~n).bit_length() + 8) // 8
        return n.to_bytes(nb, "big", signed=True)
    if lt == "date":
        return (v - _SPEC_EPOCH.date()).days
    if lt in ("time-millis", "time-micros"):
        us = (
            _ddt.datetime.combine(_SPEC_EPOCH.date(), v) - _SPEC_EPOCH
        ) // _ddt.timedelta(microseconds=1)
        return us // 1000 if lt == "time-millis" else us
    if lt in ("timestamp-millis", "timestamp-micros"):
        us = (v - _SPEC_EPOCH) // _ddt.timedelta(microseconds=1)
        return us // 1000 if lt == "timestamp-millis" else us
    return v


def _spec_encode(v, s, out):
    import struct as _struct

    s = _spec_simplify(s)
    if isinstance(s, list):  # union: value-type dispatch, strict first
        for lenient in (False, True):
            for i, b in enumerate(s):
                if _spec_value_matches(v, b, lenient):
                    out += _spec_zigzag_bytes(i)
                    return _spec_encode(v, b, out)
        raise ValueError(f"spec encoder: no branch for {v!r}")
    if isinstance(s, dict) and "logicalType" in s and _spec_logical_conv(
        s
    ) is not None:
        v = _spec_logical_to_base(v, s)
        base = (
            {"type": "fixed", "name": s.get("name"), "size": s["size"]}
            if s["type"] == "fixed"
            else s["type"]
        )
        return _spec_encode(v, base, out)
    k = _spec_kind(s)
    if k == "null":
        return
    if k == "boolean":
        out.append(1 if v else 0)
    elif k in ("int", "long"):
        out += _spec_zigzag_bytes(int(v))
    elif k == "float":
        out += _struct.pack("<f", float(v))
    elif k == "double":
        out += _struct.pack("<d", float(v))
    elif k == "string":
        raw = v.encode("utf-8")
        out += _spec_zigzag_bytes(len(raw))
        out += raw
    elif k == "bytes":
        raw = bytes(v)
        out += _spec_zigzag_bytes(len(raw))
        out += raw
    elif k == "fixed":
        out += bytes(v)
    elif k == "enum":
        out += _spec_zigzag_bytes(s["symbols"].index(v))
    elif k == "array":
        if v:
            out += _spec_zigzag_bytes(len(v))
            for it in v:
                _spec_encode(it, s["items"], out)
        out += _spec_zigzag_bytes(0)
    elif k == "map":
        if v:
            out += _spec_zigzag_bytes(len(v))
            for key, val in v.items():
                raw = key.encode("utf-8")
                out += _spec_zigzag_bytes(len(raw))
                out += raw
                _spec_encode(val, s["values"], out)
        out += _spec_zigzag_bytes(0)
    elif k == "record":
        for f in s["fields"]:
            _spec_encode(v[f["name"]], f["type"], out)
    else:
        raise TypeError(f"spec encoder: unsupported {s!r}")


@given(st.data())
@replay_settings(60)
def test_encoder_differential_vs_spec_interpreter(data):
    writer, _, value = data.draw(_gen_pair())
    wj = json.dumps(writer)
    compiled = encode_record(value, wj)
    out = bytearray()
    _spec_encode(value, writer, out)
    assert compiled == bytes(out)


def test_corrupt_wire_bytes_fail_loudly():
    """A corrupt record must raise, never desync the cursor, silently
    truncate, or loop on an absurd block count — at 100 TB one bad
    record must not hang an executor or misparse into plausible rows."""
    s_str = json.dumps({"type": "record", "name": "r", "fields": [
        {"name": "v", "type": "string"}]})
    # negative string length (zigzag of -5 = 0x09): cursor would move
    # BACKWARD without the guard
    with pytest.raises(ValueError, match="corrupt string"):
        decode_record(bytes([0x09]) + b"xxxxx", s_str)
    # length overruns the buffer: slice would silently truncate
    with pytest.raises(ValueError, match="corrupt string"):
        decode_record(bytes([0x20]) + b"abc", s_str)

    s_bytes = json.dumps({"type": "record", "name": "r", "fields": [
        {"name": "v", "type": "bytes"}]})
    with pytest.raises(ValueError, match="corrupt bytes"):
        decode_record(bytes([0x09]), s_bytes)

    s_fix = json.dumps({"type": "record", "name": "r", "fields": [
        {"name": "v", "type": {"type": "fixed", "name": "f8",
                               "size": 8}}]})
    with pytest.raises(ValueError, match="corrupt fixed"):
        decode_record(b"abc", s_fix)

    # absurd array block count (varint ~2^40): would allocate/loop
    # without the remaining-bytes bound
    s_arr = json.dumps({"type": "record", "name": "r", "fields": [
        {"name": "v", "type": {"type": "array", "items": "long"}}]})
    from trainee_scala_module_8_kafka_streaming_etl_pipeline_spark.sources.avro_codec import (
        _zigzag_encode,
    )
    with pytest.raises(ValueError, match="corrupt block count"):
        decode_record(_zigzag_encode(1 << 40) + bytes([0x02, 0x00]), s_arr)
    # legal arrays (including an empty one) still decode
    ok = encode_record({"v": [1, 2, 3]}, s_arr)
    assert decode_record(ok, s_arr) == {"v": [1, 2, 3]}
    assert decode_record(encode_record({"v": []}, s_arr), s_arr) == {
        "v": []}
