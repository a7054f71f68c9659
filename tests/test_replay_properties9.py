"""Replay properties batch 9: the TPC-H-style relational entries over a
joint mini-fixture (all seven relational tables written per example).
One property drives eight entries against direct Python replays with
exact integer revenue units (1e-4 dollars), pinning the reference-shape
analytics surface independently of both engines.
"""

from __future__ import annotations

import datetime as dt
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from replay_profile import replay_settings

from test_replay_properties import _entry, _r6

_SETTINGS = replay_settings(10)

_BASE = dt.datetime(1995, 1, 1)


def _r2(x: float) -> float:
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(repr(x)).quantize(Decimal("1e-2"), ROUND_HALF_UP))


_case = st.tuples(
    # suppliers: (nationkey, acctbal*0.25)
    st.lists(st.tuples(st.integers(0, 3), st.integers(-100, 400)), min_size=1, max_size=6),
    # customers: (nationkey, seg, acctbal*0.25)
    st.lists(
        st.tuples(st.integers(0, 3), st.sampled_from(["AUTO", "BLDG"]), st.integers(-100, 400)),
        min_size=1,
        max_size=8,
    ),
    # parts: (p_type, p_size)
    st.lists(
        st.tuples(st.sampled_from(["PROMO", "STD"]), st.integers(1, 8)),
        min_size=1,
        max_size=6,
    ),
    # orders: (cust_ref, status, priority, day offset)
    st.lists(
        st.tuples(
            st.integers(0, 7),
            st.sampled_from(["O", "F"]),
            st.sampled_from(["1-URGENT", "2-HIGH", "3-MEDIUM", "5-LOW"]),
            st.integers(0, 1500),
        ),
        min_size=1,
        max_size=10,
    ),
    # lineitems: (order_ref, part_ref, supp_ref, qty, price*0.25, disc%, lag days, returnflag)
    st.lists(
        st.tuples(
            st.integers(0, 9),
            st.integers(0, 5),
            st.integers(0, 5),
            st.integers(1, 50),
            st.integers(0, 400),
            st.integers(0, 10),
            st.integers(0, 200),
            st.sampled_from(["N", "R"]),
        ),
        min_size=1,
        max_size=14,
    ),
)


def _write_tpch(spark, supp, cust, part, orders, lis):
    tmp = tempfile.mkdtemp(prefix="replay_tpch_")

    def w(name, rows, ddl):
        spark.createDataFrame(rows, ddl).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{tmp}/{name}.parquet")

    w("region", [(0, "ASIA"), (1, "EUROPE")], "r_regionkey int, r_name string")
    w(
        "nation",
        [(k, f"NATION_{k}", k % 2) for k in range(4)],
        "n_nationkey int, n_name string, n_regionkey int",
    )
    w(
        "supplier",
        [(k, f"supp{k}", n, a * 0.25) for k, (n, a) in enumerate(supp)],
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
    )
    w(
        "customer",
        [(k, f"cust{k}", n, seg, a * 0.25) for k, (n, seg, a) in enumerate(cust)],
        "c_custkey long, c_name string, c_nationkey long,"
        " c_mktsegment string, c_acctbal double",
    )
    w(
        "part",
        [
            (k, f"part{k}", "B", t, sz, 1.0)
            for k, (t, sz) in enumerate(part)
        ],
        "p_partkey long, p_name string, p_brand string, p_type string,"
        " p_size int, p_retailprice double",
    )
    w(
        "orders",
        [
            (k, c % len(cust), s, 1.0, _BASE + dt.timedelta(days=d), pr)
            for k, (c, s, pr, d) in enumerate(orders)
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    w(
        "lineitem",
        [
            (
                o % len(orders),
                p % len(part),
                s % len(supp),
                float(q),
                pr * 0.25,
                d * 0.01,
                rf,
                "O",
                _BASE + dt.timedelta(days=orders[o % len(orders)][3] + lag),
            )
            for (o, p, s, q, pr, d, lag, rf) in lis
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, l_quantity double,"
        " l_extendedprice double, l_discount double, l_returnflag string,"
        " l_linestatus string, l_shipdate timestamp",
    )
    return tmp


@given(case=_case)
@_SETTINGS
def test_tpch_relational_suite_matches_naive(spark, case):
    """Eight reference-shape relational entries vs direct Python
    replays over one joint fixture: promo share, late-shipment split,
    nation market share, top supplier, Q21 sole-blame, dormant
    customers, min-acctbal supplier, order-count histogram."""
    supp, cust, part, orders, lis = case
    tmp = _write_tpch(spark, supp, cust, part, orders, lis)

    # normalized lineitems: (okey, pkey, skey, qty, rev_1e4_units, ship, rf)
    L = [
        (
            o % len(orders),
            p % len(part),
            s % len(supp),
            q,
            pr * 25 * (100 - d),  # price*(1-disc) in 1e-4 dollars
            _BASE + dt.timedelta(days=orders[o % len(orders)][3] + lag),
            rf,
        )
        for (o, p, s, q, pr, d, lag, rf) in lis
    ]
    O = {
        k: (c % len(cust), s, pr, _BASE + dt.timedelta(days=d))
        for k, (c, s, pr, d) in enumerate(orders)
    }

    # --- promo_revenue_share
    got = {
        r.ship_month: (r.promo_revenue, r.total_revenue, r.promo_share)
        for r in _entry("promo_revenue_share")(spark, tmp).collect()
    }
    cells: dict = {}
    for _o, p, _s, _q, rev, ship, _rf in L:
        m = f"{ship.year:04d}-{ship.month:02d}"
        pr_, tot = cells.get(m, (0, 0))
        cells[m] = (pr_ + (rev if part[p][0] == "PROMO" else 0), tot + rev)
    want = {
        m: (pr_ / 1e4, tot / 1e4, None if tot == 0 else _r6(pr_ / tot))
        for m, (pr_, tot) in cells.items()
    }
    assert set(got) == set(want)
    for m, (pv, tv, sh) in want.items():
        g = got[m]
        assert abs(g[0] - pv) <= 1e-6 and abs(g[1] - tv) <= 1e-6, (m, g)
        assert (g[2] is None) == (sh is None)
        if sh is not None:
            assert abs(g[2] - sh) <= 1.1e-6, (m, g, sh)

    # --- late_shipment_priority
    got = {
        r.ship_class: (r.high_priority_lines, r.low_priority_lines)
        for r in _entry("late_shipment_priority")(spark, tmp).collect()
    }
    hi: dict = {}
    for o, _p, _s, _q, _rev, ship, _rf in L:
        odate, pri = O[o][3], O[o][2]
        if ship <= odate + dt.timedelta(days=75):
            continue
        h, lo = hi.get("O", (0, 0))
        if pri in ("1-URGENT", "2-HIGH"):
            hi["O"] = (h + 1, lo)
        else:
            hi["O"] = (h, lo + 1)
    assert got == hi, (got, hi)

    # --- nation_market_share (ASIA = region 0 = nations 0, 2)
    got = {
        r.o_year: (r.nation_revenue, r.total_revenue, r.mkt_share)
        for r in _entry("nation_market_share")(spark, tmp).collect()
    }
    cells = {}
    for o, _p, s, _q, rev, _ship, _rf in L:
        ckey, odate = O[o][0], O[o][3]
        if cust[ckey][0] % 2 != 0:  # customer nation not in ASIA
            continue
        nat, tot = cells.get(odate.year, (0, 0))
        if supp[s % len(supp)][0] == 2:
            nat += rev
        cells[odate.year] = (nat, tot + rev)
    assert set(got) == set(cells), (got, cells)
    for y, (nat, tot) in cells.items():
        g = got[y]
        assert abs(g[0] - nat / 1e4) <= 1e-6 and abs(g[1] - tot / 1e4) <= 1e-6
        if tot:
            assert abs(g[2] - _r6(nat / tot)) <= 1.1e-6
        else:
            assert g[2] is None

    # --- top_supplier_revenue (H1 1997 window, ties kept)
    got = {
        r.s_suppkey: (r.s_name, r.total_revenue)
        for r in _entry("top_supplier_revenue")(spark, tmp).collect()
    }
    rev_s: dict = {}
    for _o, _p, s, _q, rev, ship, _rf in L:
        if dt.datetime(1997, 1, 1) <= ship < dt.datetime(1997, 7, 1):
            rev_s[s] = rev_s.get(s, 0) + rev
    want = {}
    if rev_s:
        mx = max(rev_s.values())
        want = {s: (f"supp{s}", r / 1e4) for s, r in rev_s.items() if r == mx}
    assert set(got) == set(want), (got, want)
    for s, (nm, rv) in want.items():
        assert got[s][0] == nm and abs(got[s][1] - rv) <= 1e-6

    # --- sole_blame_supplier (Q21 shape)
    got = {
        r.rnk: (r.s_name, r.numwait)
        for r in _entry("sole_blame_supplier")(spark, tmp).collect()
    }
    blamed = set()
    for o, _p, s, _q, _rev, _ship, rf in L:
        if rf != "R" or O[o][1] != "F":
            continue
        others = {s2 for o2, _p2, s2, *_r2_ in L if o2 == o and s2 != s}
        others_r = {
            s2 for o2, _p2, s2, _q2, _rev2, _ship2, rf2 in L
            if o2 == o and s2 != s and rf2 == "R"
        }
        if others and not others_r:
            blamed.add((o, s))
    agg: dict = {}
    for _o, s in blamed:
        agg[f"supp{s}"] = agg.get(f"supp{s}", 0) + 1
    ranked = sorted(agg.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    want = {i + 1: (nm, n) for i, (nm, n) in enumerate(ranked)}
    assert got == want, (got, want)

    # --- dormant_customers
    got = {
        r.c_mktsegment: (r.n_custs, r.total_bal)
        for r in _entry("dormant_customers")(spark, tmp).collect()
    }
    pos = [a * 0.25 for _n, _seg, a in cust if a * 0.25 > 0]
    want = {}
    if pos:
        t = _r2(sum(round(b * 4) for b in pos) / 4.0 / len(pos))
        recent = {
            O[k][0] for k in O if O[k][3] >= dt.datetime(1999, 1, 1)
        }
        cells = {}
        for k, (_n, seg, a) in enumerate(cust):
            if a * 0.25 > t and k not in recent:
                n, s = cells.get(seg, (0, 0))
                cells[seg] = (n + 1, s + round(a * 0.25 * 1e4))
        want = {seg: (n, s / 1e4) for seg, (n, s) in cells.items()}
    assert set(got) == set(want), (got, want)
    for seg, (n, s) in want.items():
        assert got[seg][0] == n and abs(got[seg][1] - s) <= 1e-6

    # --- min_acctbal_supplier
    got = {
        r.p_partkey: (r.p_name, r.best_acctbal, r.best_suppkey, r.best_supplier)
        for r in _entry("min_acctbal_supplier")(spark, tmp).collect()
    }
    pairs = {(p, s) for _o, p, s, *_rest in L}
    want = {}
    for pk in {p for p, _s in pairs}:
        if part[pk][1] > 5:
            continue
        cand = sorted(
            (supp[s][1] * 0.25, s) for p, s in pairs if p == pk
        )
        bal, sk = cand[0]
        want[pk] = (f"part{pk}", bal, sk, f"supp{sk}")
    assert got == want, (got, want)

    # --- order_count_distribution
    got = {
        r.n_orders: r.n_custs
        for r in _entry("order_count_distribution")(spark, tmp).collect()
    }
    per = {k: 0 for k in range(len(cust))}
    for k in O:
        c, _s, pri, _d = orders[k][0] % len(cust), O[k][1], O[k][2], O[k][3]
        if pri != "1-URGENT":
            per[c] += 1
    hist: dict = {}
    for _c, n in per.items():
        hist[n] = hist.get(n, 0) + 1
    assert got == hist, (got, hist)
