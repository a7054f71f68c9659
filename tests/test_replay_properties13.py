"""Replay properties batch 13: the executed Avro transport entries
(v1 roundtrip and v1->v2 schema-resolution decode, checked as pure
arithmetic over the ORIGINAL rows — any codec/resolution bug surfaces
as a wrong aggregate), the trivial projection/filter entry, the
flagship composed pipeline (purchase -> customer enrich -> ±1-day
click interval join -> per-purchase compaction) through BOTH its
DataFrame and SQL surfaces, and the end-to-end corpus build
(keep-best dedup -> quality gate -> hash split -> token packing),
replayed by composing the batch-4/5 hashlib formulas.
"""

from __future__ import annotations

import datetime as dt
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from replay_profile import replay_settings

from test_replay_properties import (
    _entry,
    _mk_events,
    _quality,
    _write_events,
)
from test_replay_properties4 import _bucket
from test_replay_properties5 import _components, _perdoc, _verified_pairs

_SETTINGS = replay_settings(10)

_BASE = dt.datetime(2024, 1, 1)

_ev_rows = st.lists(
    st.tuples(
        st.integers(0, 2),                                   # user
        st.integers(0, 60 * 60 * 60),                        # second offset
        st.sampled_from(["view", "click", "purchase", "error"]),
        st.one_of(st.none(), st.integers(0, 200)),           # value*0.5
    ),
    min_size=1,
    max_size=30,
)


@given(raw=_ev_rows)
@_SETTINGS
def test_avro_entries_match_arithmetic(spark, raw):
    """avro_roundtrip / avro_schema_evolution vs plain Python sums over
    the pre-encode rows: the entries serialize every row to Avro binary
    (v1, and v1-decoded-under-v2) before aggregating, so a lossy or
    mis-resolved codec shows up as a wrong count/sum here."""
    rows = _mk_events(raw)
    tmp = _write_events(spark, rows)

    cells: dict = {}
    for _i, _ts, _u, t, v in rows:
        n, micro, seen, slen = cells.get(t, (0, 0, False, 0))
        if v is not None:
            micro += round(v * 2) * 500000  # value is a half-unit multiple
            seen = True
        cells[t] = (n + 1, micro, seen, slen + len(t))

    got = {
        r.event_type: (r.n, r.sum_value_micro)
        for r in _entry("avro_roundtrip")(spark, tmp).collect()
    }
    want = {t: (n, micro if seen else None) for t, (n, micro, seen, _l) in cells.items()}
    assert got == want, (got, want)

    got = {
        r.event_type: (r.n, r.sum_len, r.sum_value_micro, r.src_schema)
        for r in _entry("avro_schema_evolution")(spark, tmp).collect()
    }
    want = {
        t: (n, slen, micro if seen else None, "registry-v2")
        for t, (n, micro, seen, slen) in cells.items()
    }
    assert got == want, (got, want)


_proj_orders = st.lists(
    st.tuples(
        st.integers(0, 5),                                    # custkey
        st.one_of(st.none(), st.sampled_from(["O", "F"])),    # status
        st.one_of(st.none(), st.sampled_from(["1-URGENT", "5-LOW"])),
        st.integers(0, 300000),                               # price*0.25
    ),
    min_size=1,
    max_size=15,
)


@given(orders=_proj_orders)
@_SETTINGS
def test_project_filter_matches_naive(spark, orders):
    """The P1-P3 projection/alias/predicate entry vs a direct list
    comprehension (prices straddle the 50000 literal; NULL status rows
    must drop, NULL priorities project as NULL)."""
    tmp = tempfile.mkdtemp(prefix="replay_proj_")
    spark.createDataFrame(
        [
            (k, c, s, p * 0.25, _BASE, pr)
            for k, (c, s, pr, p) in enumerate(orders)
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/orders.parquet")
    got = {
        r.order_id: (r.customer_id, r.price, r.priority_class)
        for r in _entry("project_filter")(spark, tmp).collect()
    }
    want = {
        k: (c, p * 0.25, None if pr is None else pr[0])
        for k, (c, s, pr, p) in enumerate(orders)
        if s == "O" and p * 0.25 > 50000
    }
    assert got == want, (got, want)


# --- flagship composed pipeline ---------------------------------------------

_flag_case = st.tuples(
    # customers present in the dimension (keys 0..1; user 2 misses)
    st.lists(
        st.tuples(st.integers(0, 1), st.sampled_from(["gold", "basic"])),
        min_size=0,
        max_size=2,
        unique_by=lambda t: t[0],
    ),
    _ev_rows,
)


def _write_flagship(spark, cust, rows):
    """events + customer, plus minimal stubs for the other tables so
    register_views (the flagship_sql path) can load everything."""
    tmp = _write_events(spark, rows)

    def w(name, data, ddl):
        spark.createDataFrame(data, ddl).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{tmp}/{name}.parquet")

    w(
        "customer",
        [(k, f"cust{k}", 0, seg, 1.0) for k, seg in cust],
        "c_custkey long, c_name string, c_nationkey long,"
        " c_mktsegment string, c_acctbal double",
    )
    w("region", [(0, "ASIA")], "r_regionkey int, r_name string")
    w("nation", [(0, "N0", 0)], "n_nationkey int, n_name string, n_regionkey int")
    w(
        "supplier",
        [(0, "supp0", 0, 1.0)],
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
    )
    w(
        "part",
        [(0, "part0", "B", "STD", 1, 1.0)],
        "p_partkey long, p_name string, p_brand string, p_type string,"
        " p_size int, p_retailprice double",
    )
    w(
        "orders",
        [(0, 0, "O", 1.0, _BASE, "5-LOW")],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    w(
        "lineitem",
        [(0, 0, 0, 1.0, 1.0, 0.0, "N", "O", _BASE)],
        "l_orderkey long, l_partkey long, l_suppkey long, l_quantity double,"
        " l_extendedprice double, l_discount double, l_returnflag string,"
        " l_linestatus string, l_shipdate timestamp",
    )
    w(
        "documents",
        [(0, "stub doc", "en", "src0", 8)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    w(
        "embeddings",
        [(0, [0.0] * 8, 0)],
        "vec_id long, embedding array<float>, label int",
    )
    return tmp


@given(case=_flag_case)
@_SETTINGS
def test_flagship_matches_naive_and_sql_twin(spark, case):
    """flagship_shipped_orders vs a direct Python replay of the whole
    composition (LEFT customer enrich, inclusive ±1-day click window,
    max/max_by/count compaction per purchase), and flagship_sql (the
    same pipeline through spark.sql) vs the DataFrame plan."""
    cust, raw = case
    rows = _mk_events(raw)
    tmp = _write_flagship(spark, cust, rows)

    got = {
        r.purchase_id: (
            r.customer_id, r.customer_name, r.customer_segment, r.price,
            r.purchase_ts, r.last_click_id, r.last_click_ts, r.n_clicks,
        )
        for r in _entry("flagship_shipped_orders")(spark, tmp).collect()
    }
    seg = {k: s for k, s in cust}
    clicks = [(i, ts, u) for i, ts, u, t, _v in rows if t == "click"]
    want = {}
    for i, ts, u, t, v in rows:
        if t != "purchase":
            continue
        ks = [
            (ci, cts)
            for ci, cts, cu in clicks
            if cu == u
            and ts - dt.timedelta(days=1) <= cts <= ts + dt.timedelta(days=1)
        ]
        if not ks:
            continue
        last = max(ks)
        want[i] = (
            u,
            f"cust{u}" if u in seg else None,
            seg.get(u),
            v,
            ts,
            last[0],
            last[1],
            len(ks),
        )
    assert got == want, (got, want)

    sql_rows = {
        r.purchase_id: (
            r.customer_id, r.customer_name, r.customer_segment, r.price,
            r.purchase_ts, r.last_click_id, r.last_click_ts, r.n_clicks,
        )
        for r in _entry("flagship_sql")(spark, tmp).collect()
    }
    assert sql_rows == want, (sql_rows, want)


# --- corpus build pipeline ---------------------------------------------------

# mix of token-heavy unique-word docs (to fill 2000-token pack bins),
# stopword-rich docs (quality near 1), and near-duplicate short docs
# (base + suffix, to exercise the keep-best dedup stage)
_corpus_docs = st.lists(
    st.one_of(
        st.tuples(
            st.integers(0, 2),
            st.tuples(
                st.sampled_from(["the", "xyz", "bb"]), st.integers(1, 400)
            ).map(lambda t: " ".join([t[0]] * t[1])),
        ),
        st.tuples(
            st.integers(0, 2),
            st.tuples(
                st.sampled_from(["abc ab", "the of in a x"]),
                st.sampled_from(["", "a", " b"]),
            ).map(lambda t: t[0] + t[1]),
        ),
    ),
    min_size=1,
    max_size=12,
)


@given(docs=_corpus_docs)
@_SETTINGS
def test_corpus_build_pipeline_matches_replay(spark, docs):
    """The composed corpus build vs the chained batch-4/5 replays:
    minhash keep-best per cluster, the 0.3 quality gate, the md5 hash
    split of surviving docs, and cumulative-sum packing into
    2000-token bins per (split, source)."""
    import re

    from test_replay_properties4 import _write_docs_src

    docs = [(f"src{s}", t) for s, t in docs]
    tmp = _write_docs_src(spark, docs)
    texts = [t for _s, t in docs]

    label = _components(len(docs), _verified_pairs(_perdoc(texts)))
    keep = {}
    for c in set(label.values()):
        members = [d for d, lbl in label.items() if lbl == c]
        best = min(members, key=lambda d: (-_quality(texts[d]), d))
        keep[best] = _quality(texts[best])
    kept = sorted(d for d, q in keep.items() if q >= 0.3)

    cells: dict = {}
    for d in kept:
        b = _bucket(d)
        split = "train" if b < 80 else "val" if b < 90 else "test"
        tok = len(re.split(r"\s+", texts[d].strip()))
        key = (split, docs[d][0])
        cum = cells.get(key, [0, {}])
        bin_ = cum[0] // 2000
        cum[0] += tok
        n, t_, lo, hi = cum[1].get(bin_, (0, 0, d, d))
        cum[1][bin_] = (n + 1, t_ + tok, min(lo, d), max(hi, d))
        cells[key] = cum
    want = {
        (sp, src, b): v
        for (sp, src), (_c, bins) in cells.items()
        for b, v in bins.items()
    }
    got = {
        (r.split, r.source, r.bin): (r.n_docs, r.tokens_packed, r.first_doc, r.last_doc)
        for r in _entry("corpus_build_pipeline")(spark, tmp).collect()
    }
    assert got == want, (docs, got, want)


@given(raw=_ev_rows)
@replay_settings(5)
def test_streaming_avro_tombstone_matches_naive(spark, raw):
    """The Avro-topic tombstone entry vs a direct changelog fold: per
    user keep the max-offset row, drop users whose winning row is an
    'error' (produced on the topic as a tombstone — live key, NULL
    value).  One pipeline covers topic encode -> per-record Confluent
    decode (null value = flagged delete) -> keyed upsert MERGE, so a
    tombstone that fails to delete, deletes the wrong key, or loses a
    later re-insert shows up as a wrong surviving-key map."""
    rows = _mk_events(raw)
    tmp = _write_events(spark, rows)
    got = {
        r.user_id: (r.latest_event_type, r.latest_value, r._offset)
        for r in _entry("streaming_avro_tombstone")(spark, tmp).collect()
    }
    latest: dict = {}
    for i, _ts, u, t, v in rows:
        if u not in latest or i > latest[u][0]:
            latest[u] = (i, t, v)
    want = {u: (t, v, i) for u, (i, t, v) in latest.items() if t != "error"}
    assert got == want, (got, want)


@given(raw=_ev_rows)
@_SETTINGS
def test_avro_logical_types_matches_arithmetic(spark, raw):
    """avro_logical_types vs plain Python folds over the pre-encode
    rows: the entry routes ts through timestamp-micros and value
    through decimal(18,6) bytes before aggregating, so a lossy decimal
    conversion, two's-complement misread, or dropped microsecond shows
    up as a wrong sum/max here."""
    rows = _mk_events(raw)
    tmp = _write_events(spark, rows)
    cells: dict = {}
    for _i, ts, _u, t, v in rows:
        n, micro, seen, mts = cells.get(t, (0, 0, False, None))
        if v is not None:
            micro += round(v * 2) * 500000  # value is a half-unit multiple
            seen = True
        if mts is None or ts > mts:
            mts = ts
        cells[t] = (n + 1, micro, seen, mts)
    got = {
        r.event_type: (r.n, r.sum_value_micro, r.last_ts)
        for r in _entry("avro_logical_types")(spark, tmp).collect()
    }
    want = {
        t: (n, micro if seen else None, mts)
        for t, (n, micro, seen, mts) in cells.items()
    }
    assert got == want, (got, want)
