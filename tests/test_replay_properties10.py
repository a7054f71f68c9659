"""Replay properties batch 10: the remaining TPC-H-style relational
entries (Q3/Q5/Q7/Q9/Q11/Q12-adjacent/Q16/Q17/Q18/Q19/Q20 analogues)
over a second joint mini-fixture whose value domains are tuned so every
entry's literal predicates (segment BUILDING, brands Brand#3/12/24,
p_type STANDARD, the Q16 size IN-list) actually select rows.  One
property drives twelve entries against direct Python replays with exact
integer revenue units (1e-4 dollars), independent of both engines.
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
_ASIA_NATIONS = {0, 2}  # region 0 = ASIA; nation k sits in region k % 2


def _rq(x: float, places: str) -> float:
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(repr(x)).quantize(Decimal(places), ROUND_HALF_UP))


_BRANDS = ["Brand#3", "Brand#12", "Brand#24", "Brand#9"]
_SIZES = [1, 5, 9, 14, 23, 49, 60]

_case = st.tuples(
    # suppliers: (nationkey, acctbal*0.25)
    st.lists(st.tuples(st.integers(0, 3), st.integers(-100, 400)), min_size=1, max_size=6),
    # customers: (nationkey, seg, acctbal*0.25)
    st.lists(
        st.tuples(
            st.integers(0, 3),
            st.sampled_from(["BUILDING", "AUTO"]),
            st.integers(-100, 400),
        ),
        min_size=1,
        max_size=8,
    ),
    # parts: (brand, p_type, p_size, retailprice*0.25)
    st.lists(
        st.tuples(
            st.sampled_from(_BRANDS),
            st.sampled_from(["PROMO", "STANDARD"]),
            st.sampled_from(_SIZES),
            st.integers(1, 40),
        ),
        min_size=1,
        max_size=6,
    ),
    # orders: (cust_ref, status, priority, day offset)
    st.lists(
        st.tuples(
            st.integers(0, 7),
            st.sampled_from(["O", "F"]),
            st.sampled_from(["1-URGENT", "2-HIGH", "3-MEDIUM", "5-LOW"]),
            st.integers(0, 1600),
        ),
        min_size=1,
        max_size=10,
    ),
    # lineitems: (order_ref, part_ref, supp_ref, qty, price*0.25, disc%,
    #             lag days, returnflag)
    st.lists(
        st.tuples(
            st.integers(0, 9),
            st.integers(0, 5),
            st.integers(0, 5),
            st.integers(1, 120),
            st.integers(0, 400),
            st.integers(0, 10),
            st.integers(0, 400),
            st.sampled_from(["N", "R"]),
        ),
        min_size=1,
        max_size=14,
    ),
)


def _write_tpch2(spark, supp, cust, part, orders, lis):
    tmp = tempfile.mkdtemp(prefix="replay_tpch2_")

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
            (k, f"part{k}", br, t, sz, rp * 0.25)
            for k, (br, t, sz, rp) in enumerate(part)
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
def test_tpch_relational_suite2_matches_naive(spark, case):
    """Twelve more reference-shape relational entries vs direct Python
    replays over one joint fixture: Q3 top orders, Q5 regional volume,
    Q18 large orders, Q10 returned items, Q4 semi counts, Q19
    disjunction, Q16 supplier variety, Q17 small-qty revenue, Q20
    dominance, Q7 trade lanes, Q11 important parts, Q9 profit."""
    supp, cust, part, orders, lis = case
    tmp = _write_tpch2(spark, supp, cust, part, orders, lis)

    # normalized lineitems: (okey, pkey, skey, qty, rev_1e4_units,
    # price_1e4_units, ship, rf, disc%)
    L = [
        (
            o % len(orders),
            p % len(part),
            s % len(supp),
            q,
            pr * 25 * (100 - d),
            pr * 2500,
            _BASE + dt.timedelta(days=orders[o % len(orders)][3] + lag),
            rf,
            d,
        )
        for (o, p, s, q, pr, d, lag, rf) in lis
    ]
    # orders: key -> (custkey, status, priority, date)
    O = {
        k: (c % len(cust), s, pr, _BASE + dt.timedelta(days=d))
        for k, (c, s, pr, d) in enumerate(orders)
    }

    # --- top_revenue_orders (Q3: BUILDING segment, straddling the cutoff)
    got = [
        (r.l_orderkey, r.revenue, r.o_orderdate, r.o_orderpriority)
        for r in _entry("top_revenue_orders")(spark, tmp).collect()
    ]
    cut = dt.datetime(1998, 6, 1)
    cells: dict = {}
    for o, _p, _s, _q, rev, _pr, ship, _rf, _d in L:
        ck, _st_, pri, odate = O[o]
        if cust[ck][1] == "BUILDING" and odate < cut and ship > cut:
            cells[o] = cells.get(o, 0) + rev
    ranked = sorted(cells.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    want = [(o, rev / 1e4, O[o][3], O[o][2]) for o, rev in ranked]
    assert len(got) == len(want), (got, want)
    for g, wnt in zip(got, want):
        assert g[0] == wnt[0] and g[2] == wnt[2] and g[3] == wnt[3], (g, wnt)
        assert abs(g[1] - wnt[1]) <= 1e-6

    # --- regional_supplier_volume (Q5: local suppliers, ASIA, 96-97)
    got = {
        r.n_name: (r.revenue, r.n_items)
        for r in _entry("regional_supplier_volume")(spark, tmp).collect()
    }
    cells = {}
    for o, _p, s, _q, rev, _pr, _ship, _rf, _d in L:
        ck, _st_, _pri, odate = O[o]
        cn, sn = cust[ck][0], supp[s][0]
        if (
            cn in _ASIA_NATIONS
            and sn == cn
            and dt.datetime(1996, 1, 1) <= odate < dt.datetime(1998, 1, 1)
        ):
            r0, n0 = cells.get(f"NATION_{cn}", (0, 0))
            cells[f"NATION_{cn}"] = (r0 + rev, n0 + 1)
    want = {n: (r / 1e4, c) for n, (r, c) in cells.items()}
    assert set(got) == set(want), (got, want)
    for n, (rv, c) in want.items():
        assert got[n][1] == c and abs(got[n][0] - rv) <= 1e-6

    # --- large_order_customers (Q18: per-order qty > 250)
    got = {
        r.o_orderkey: (r.c_custkey, r.c_name, r.o_totalprice, r.sum_qty)
        for r in _entry("large_order_customers")(spark, tmp).collect()
    }
    qty_per: dict = {}
    for o, _p, _s, q, _rev, _pr, _ship, _rf, _d in L:
        qty_per[o] = qty_per.get(o, 0) + q
    want = {
        o: (O[o][0], f"cust{O[o][0]}", 1.0, float(q))
        for o, q in qty_per.items()
        if q > 250
    }
    assert got == want, (got, want)

    # --- returned_item_customers (Q10: returned revenue per customer, 1997)
    got = [
        (r.c_custkey, r.c_name, r.n_name, r.returned_revenue, r.n_items)
        for r in _entry("returned_item_customers")(spark, tmp).collect()
    ]
    cells = {}
    for o, _p, _s, _q, rev, _pr, _ship, rf, _d in L:
        ck, _st_, _pri, odate = O[o]
        if rf == "R" and dt.datetime(1997, 1, 1) <= odate < dt.datetime(1998, 1, 1):
            r0, n0 = cells.get(ck, (0, 0))
            cells[ck] = (r0 + rev, n0 + 1)
    ranked = sorted(cells.items(), key=lambda kv: (-kv[1][0], kv[0]))[:20]
    want = [
        (ck, f"cust{ck}", f"NATION_{cust[ck][0]}", rev / 1e4, n)
        for ck, (rev, n) in ranked
    ]
    assert len(got) == len(want)
    for g, wnt in zip(got, want):
        assert g[:3] == wnt[:3] and g[4] == wnt[4], (g, wnt)
        assert abs(g[3] - wnt[3]) <= 1e-6

    # --- priority_semi_counts (Q4: EXISTS late line, 1997)
    got = {
        r.o_orderpriority: r.n_orders
        for r in _entry("priority_semi_counts")(spark, tmp).collect()
    }
    late_orders = {o for o, _p, _s, _q, _rev, _pr, ship, _rf, _d in L if ship > O[o][3]}
    want = {}
    for o in late_orders:
        _ck, _st_, pri, odate = O[o]
        if dt.datetime(1997, 1, 1) <= odate < dt.datetime(1998, 1, 1):
            want[pri] = want.get(pri, 0) + 1
    assert got == want, (got, want)

    # --- disjunctive_part_revenue (Q19: OR of brand/size/qty arms)
    got = {
        r.p_brand: (r.n_lines, r.revenue)
        for r in _entry("disjunctive_part_revenue")(spark, tmp).collect()
    }
    arms = {
        "Brand#3": (1, 15, 1, 20),
        "Brand#12": (10, 30, 10, 40),
        "Brand#24": (20, 50, 25, 50),
    }
    cells = {}
    for _o, p, _s, q, rev, _pr, _ship, _rf, _d in L:
        br, _t, sz, _rp = part[p]
        if br not in arms:
            continue
        s_lo, s_hi, q_lo, q_hi = arms[br]
        if s_lo <= sz <= s_hi and q_lo <= q <= q_hi:
            n0, r0 = cells.get(br, (0, 0))
            cells[br] = (n0 + 1, r0 + rev)
    want = {br: (n, r / 1e4) for br, (n, r) in cells.items()}
    assert set(got) == set(want), (got, want)
    for br, (n, rv) in want.items():
        assert got[br][0] == n and abs(got[br][1] - rv) <= 1e-6

    # --- supplier_part_variety (Q16: distinct suppliers, blacklist anti)
    got = {
        (r.p_brand, r.p_size): r.supplier_cnt
        for r in _entry("supplier_part_variety")(spark, tmp).collect()
    }
    in_sizes = {1, 9, 14, 19, 23, 36, 45, 49}
    sets: dict = {}
    for _o, p, s, _q, _rev, _pr, _ship, _rf, _d in L:
        br, _t, sz, _rp = part[p]
        if sz in in_sizes and supp[s][1] >= 0:  # acctbal = a*0.25 >= 0
            sets.setdefault((br, sz), set()).add(s)
    want = {k: len(v) for k, v in sets.items()}
    assert got == want, (got, want)

    # --- small_qty_part_revenue (Q17: below 40% of the part's avg qty)
    got = {
        r.p_brand: (r.n_lines, r.avg_yearly)
        for r in _entry("small_qty_part_revenue")(spark, tmp).collect()
    }
    qsum: dict = {}
    for _o, p, _s, q, _rev, _pr, _ship, _rf, _d in L:
        s0, n0 = qsum.get(p, (0, 0))
        qsum[p] = (s0 + q, n0 + 1)
    aq = {p: _r6(s0 / n0) for p, (s0, n0) in qsum.items()}
    cells = {}
    for _o, p, _s, q, _rev, pr_u, _ship, _rf, _d in L:
        if part[p][2] <= 10 and q < 0.4 * aq[p]:
            n0, e0 = cells.get(part[p][0], (0, 0))
            cells[part[p][0]] = (n0 + 1, e0 + pr_u)
    want = {br: (n, _rq(e / 1e4 / 7.0, "1e-4")) for br, (n, e) in cells.items()}
    assert set(got) == set(want), (got, want)
    for br, (n, avg) in want.items():
        assert got[br][0] == n and abs(got[br][1] - avg) <= 1.1e-4

    # --- dominant_part_supplier (Q20: >50% of a part's shipped quantity)
    got = {
        r.s_suppkey: (r.s_name, r.n_dominated_parts)
        for r in _entry("dominant_part_supplier")(spark, tmp).collect()
    }
    ps: dict = {}
    for _o, p, s, q, _rev, _pr, _ship, _rf, _d in L:
        ps[(p, s)] = ps.get((p, s), 0) + q
    tot_p: dict = {}
    for (p, _s), q in ps.items():
        tot_p[p] = tot_p.get(p, 0) + q
    dom: dict = {}
    for (p, s), q in ps.items():
        if tot_p[p] and q / tot_p[p] > 0.5:
            dom[s] = dom.get(s, 0) + 1
    want = {s: (f"supp{s}", n) for s, n in dom.items()}
    assert got == want, (got, want)

    # --- nation_trade_volume (Q7: cross-nation lanes by ship year)
    got = {
        (r.supp_nation, r.cust_nation, r.ship_year): r.volume
        for r in _entry("nation_trade_volume")(spark, tmp).collect()
    }
    cells = {}
    for o, _p, s, _q, rev, _pr, ship, _rf, _d in L:
        sn, cn = supp[s][0], cust[O[o][0]][0]
        if sn != cn:
            k = (f"NATION_{sn}", f"NATION_{cn}", ship.year)
            cells[k] = cells.get(k, 0) + rev
    assert set(got) == set(cells), (got, cells)
    for k, v in cells.items():
        assert abs(got[k] - v / 1e4) <= 1e-6

    # --- important_parts (Q11: revenue above 0.05% of global)
    got = {
        r.l_partkey: (r.p_name, r.part_revenue)
        for r in _entry("important_parts")(spark, tmp).collect()
    }
    per_p: dict = {}
    for _o, p, _s, _q, rev, _pr, _ship, _rf, _d in L:
        per_p[p] = per_p.get(p, 0) + rev
    t = sum(per_p.values()) / 1e4
    want = {
        p: (f"part{p}", rev / 1e4)
        for p, rev in per_p.items()
        if rev / 1e4 > 0.0005 * t
    }
    assert set(got) == set(want), (got, want)
    for p, (nm, rv) in want.items():
        assert got[p][0] == nm and abs(got[p][1] - rv) <= 1e-6

    # --- product_profit (Q9: STANDARD parts, retail-price cost proxy)
    got = {
        (r.supp_nation, r.o_year): (r.profit, r.n_lines)
        for r in _entry("product_profit")(spark, tmp).collect()
    }
    cells = {}
    for o, p, s, q, rev, _pr, _ship, _rf, _d in L:
        if part[p][1] != "STANDARD":
            continue
        # profit in 1e-4 dollars: rev - 0.5*retail*qty; retail = rp*0.25
        # so the cost term is rp*qty*1250 — exact integers throughout
        prof = rev - part[p][3] * q * 1250
        k = (f"NATION_{supp[s][0]}", O[o][3].year)
        p0, n0 = cells.get(k, (0, 0))
        cells[k] = (p0 + prof, n0 + 1)
    assert set(got) == set(cells), (got, cells)
    for k, (prof, n) in cells.items():
        assert got[k][1] == n and abs(got[k][0] - prof / 1e4) <= 1e-6
