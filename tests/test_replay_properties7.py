"""Replay properties batch 7: the remaining core relational entries —
semi/anti joins, top-n per group, tumbling windows, event-time parse,
stream-table enrichment, partial-aggregate merge, and the Q1-style
summary.  Lower shared-formula risk than the earlier batches (plain
relational semantics), but they are the reference's own operator
surface (P1-P3, J1, A1-A3 analogues), so a replay pins them too.
"""

from __future__ import annotations

import datetime as dt
import tempfile

import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from replay_profile import replay_settings

from test_replay_properties import (
    _entry,
    _r6,
    _write_events,
    _write_lineitem,
    _write_orders,
)

_SETTINGS = replay_settings(10)

_BASE = dt.datetime(2024, 1, 1)

_ev_rows = st.lists(
    st.tuples(
        st.integers(0, 3),
        st.integers(0, 3 * 86400),
        st.sampled_from(["view", "click", "purchase"]),
        st.one_of(st.none(), st.integers(0, 200)),
    ),
    min_size=1,
    max_size=25,
)


def _mk_events(raw):
    return [
        (i, _BASE + dt.timedelta(seconds=s), u, t,
         None if v is None else v * 0.5)
        for i, (u, s, t, v) in enumerate(raw)
    ]


@given(raw=_ev_rows)
@_SETTINGS
def test_windowed_agg_tumbling_matches_naive(spark, raw):
    """1-day tumbling window counts/sums vs direct Python bucketing."""
    rows = _mk_events(raw)
    got = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in _entry("windowed_agg_tumbling")(
            spark, _write_events(spark, rows)
        ).collect()
    }
    cells: dict = {}
    for _i, ts, _u, t, v in rows:
        day = dt.datetime(ts.year, ts.month, ts.day)
        n, s, has = cells.get((day, t), (0, 0.0, False))
        cells[(day, t)] = (n + 1, s + (v or 0.0), has or v is not None)
    want = {k: (n, s if has else None) for k, (n, s, has) in cells.items()}
    assert got == want, (raw, got, want)


@given(raw=_ev_rows)
@_SETTINGS
def test_event_time_parse_matches_naive(spark, raw):
    """Format-roundtrip event-time assignment (S6) vs direct Python:
    the strftime/strptime roundtrip truncates to whole seconds."""
    rows = _mk_events(raw)
    got = {
        r.event_day: (r.n_events, r.first_ts, r.last_ts)
        for r in _entry("event_time_parse")(
            spark, _write_events(spark, rows)
        ).collect()
    }
    cells: dict = {}
    for _i, ts, _u, _t, _v in rows:
        p = ts.replace(microsecond=0)
        day = dt.datetime(p.year, p.month, p.day)
        n, lo, hi = cells.get(day, (0, p, p))
        cells[day] = (n + 1, min(lo, p), max(hi, p))
    assert got == cells, (raw, got, cells)


@given(raw=_ev_rows)
@_SETTINGS
def test_incremental_agg_merge_matches_naive(spark, raw):
    """Partial-state MERGE (A3's algebra) vs the direct one-pass Python
    aggregate — the lossless-merge property stated independently of
    both engines."""
    rows = _mk_events(raw)
    got = {
        r.user_id: (r.n_events, r.total_value, r.last_offset)
        for r in _entry("incremental_agg_merge")(
            spark, _write_events(spark, rows)
        ).collect()
    }
    cells: dict = {}
    for i, _ts, u, _t, v in rows:
        n, s, has, o = cells.get(u, (0, 0.0, False, -1))
        cells[u] = (n + 1, s + (v or 0.0), has or v is not None, max(o, i))
    want = {u: (n, s if has else None, o) for u, (n, s, has, o) in cells.items()}
    assert got == want, (raw, got, want)


_cust_rows = st.lists(st.integers(0, 5), min_size=1, max_size=6, unique=True)
_ord_custs = st.lists(st.integers(0, 5), min_size=0, max_size=8)


@given(custs=_cust_rows, ords=_ord_custs)
@_SETTINGS
def test_join_semi_anti_match_naive(spark, custs, ords):
    """LEFT SEMI / LEFT ANTI against Python set membership — the two
    outputs must also partition the customer table exactly."""
    tmp = tempfile.mkdtemp(prefix="replay_semi_")
    spark.createDataFrame(
        [(k, f"cust{k}", 0, "SEG", 1.0) for k in custs],
        "c_custkey long, c_name string, c_nationkey long,"
        " c_mktsegment string, c_acctbal double",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/customer.parquet")
    spark.createDataFrame(
        [(i, c, "O", 1.0, _BASE, "1-URGENT") for i, c in enumerate(ords)],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/orders.parquet")

    got_s = {
        (r.customer_id, r.customer_name)
        for r in _entry("join_semi")(spark, tmp).collect()
    }
    got_a = {
        (r.customer_id, r.customer_name)
        for r in _entry("join_anti")(spark, tmp).collect()
    }
    with_orders = set(ords)
    want_s = {(k, f"cust{k}") for k in custs if k in with_orders}
    want_a = {(k, f"cust{k}") for k in custs if k not in with_orders}
    assert got_s == want_s and got_a == want_a, (custs, ords, got_s, got_a)
    assert got_s | got_a == {(k, f"cust{k}") for k in custs}
    assert not (got_s & got_a)


@given(raw=_ev_rows, custs=_cust_rows)
@_SETTINGS
def test_stream_table_enrich_matches_naive(spark, raw, custs):
    """J1 stream-table LEFT enrichment vs a Python dict lookup —
    unmatched purchases keep NULL dimension columns."""
    rows = _mk_events(raw)
    tmp = _write_events(spark, rows)
    spark.createDataFrame(
        [(k, f"cust{k}", 0, f"SEG{k % 2}", 1.0) for k in custs],
        "c_custkey long, c_name string, c_nationkey long,"
        " c_mktsegment string, c_acctbal double",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/customer.parquet")
    got = {
        r.order_id: (r.customer_id, r.customer_name, r.customer_segment,
                     r.price, r.order_ts)
        for r in _entry("stream_table_enrich")(spark, tmp).collect()
    }
    dim = {k: (f"cust{k}", f"SEG{k % 2}") for k in custs}
    want = {
        i: (u, dim.get(u, (None, None))[0], dim.get(u, (None, None))[1], v, ts)
        for i, ts, u, t, v in rows
        if t == "purchase"
    }
    assert got == want, (raw, custs, got, want)


_ord_rows = st.lists(
    st.tuples(
        st.sampled_from(["1-URGENT", "3-MEDIUM", "5-LOW"]),
        st.integers(0, 400),  # price*0.25
    ),
    min_size=1,
    max_size=20,
)


@pytest.mark.parametrize(
    "entry_name", ["topn_per_group", "topn_per_group_scaled"]
)
@given(raw=_ord_rows)
@_SETTINGS
def test_topn_per_group_matches_naive(spark, entry_name, raw):
    """Top-3 orders per priority vs Python sorting with the same
    (price desc, orderkey asc) tie-break."""
    rows = [
        (i, 0, p * 0.25, _BASE + dt.timedelta(days=i)) for i, (_pr, p) in enumerate(raw)
    ]
    tmp = tempfile.mkdtemp(prefix="replay_topn_")
    spark.createDataFrame(
        [(k, c, "O", price, d, raw[k][0]) for k, c, price, d in rows],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/orders.parquet")
    got = {
        (r.priority, r.rnk): (r.order_id, r.price)
        for r in _entry(entry_name)(spark, tmp).collect()
    }
    per: dict = {}
    for i, (pr, p) in enumerate(raw):
        per.setdefault(pr, []).append((i, p * 0.25))
    want = {}
    for pr, lst in per.items():
        lst.sort(key=lambda t: (-t[1], t[0]))
        for r, (k, price) in enumerate(lst[:3]):
            want[(pr, r + 1)] = (k, price)
    assert got == want, (raw, got, want)


_li_rows = st.lists(
    st.tuples(
        st.sampled_from(["N", "R"]),
        st.sampled_from(["O", "F"]),
        st.integers(1, 50),     # quantity
        st.integers(0, 4000),   # price*0.25
        st.integers(0, 10),     # discount*0.01
        st.integers(0, 2000),   # shipdate day offset (pre/post cutoff)
    ),
    min_size=1,
    max_size=20,
)


@given(raw=_li_rows)
@_SETTINGS
def test_agg_summary_matches_naive(spark, raw):
    """The Q1-style pricing summary vs exact Python decimal sums,
    including the 1998-09-01 shipdate cutoff."""
    tmp = tempfile.mkdtemp(prefix="replay_q1_")
    rows = [
        (1, 1, 1, float(q), p * 0.25, d * 0.01, rf, ls,
         dt.datetime(1995, 1, 1) + dt.timedelta(days=off))
        for rf, ls, q, p, d, off in raw
    ]
    spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_quantity double,"
        " l_extendedprice double, l_discount double, l_returnflag string,"
        " l_linestatus string, l_shipdate timestamp",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/lineitem.parquet")
    got = {
        (r.l_returnflag, r.l_linestatus): (
            r.sum_qty, r.sum_base_price, r.sum_disc_price, r.avg_qty, r.count_order
        )
        for r in _entry("agg_summary")(spark, tmp).collect()
    }
    cutoff = dt.datetime(1998, 9, 1)
    cells: dict = {}
    for rf, ls, q, p, d, off in raw:
        ship = dt.datetime(1995, 1, 1) + dt.timedelta(days=off)
        if ship > cutoff:
            continue
        # all quantities exact in decimal(18,4): q int, price 1/4ths,
        # discount 1/100ths -> disc price in 1/40000ths
        sq, sb, sd, n = cells.get((rf, ls), (0, 0, 0, 0))
        cells[(rf, ls)] = (
            sq + q * 10000,
            sb + round(p * 0.25 * 10000),
            sd + round(p * 25 * (100 - d)),  # price*(1-d) in 1e-4 units
            n + 1,
        )
    want = {
        k: (
            sq / 10000.0,
            sb / 10000.0,
            sd / 10000.0,
            _r6(sq / 10000.0 / n),
            n,
        )
        for k, (sq, sb, sd, n) in cells.items()
    }
    assert set(got) == set(want), (raw, got, want)
    for k, w in want.items():
        g = got[k]
        assert g[4] == w[4]
        for gi, wi in zip(g[:4], w[:4]):
            assert abs(gi - wi) <= 1e-6, (k, g, w)
