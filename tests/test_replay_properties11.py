"""Replay properties batch 11: grouping-set surfaces (CUBE / ROLLUP /
GROUPING SETS with the grouping_id bitmask), the CDC envelope unwraps,
the column profiler, the bloom runtime-filter semi join, and the
content-defined-chunking family (corpus stats + shared-passage pairs) —
all previously mirrored-oracle-only.  Each replay is direct Python
(hashlib / Decimal / dict math), independent of both engines.
"""

from __future__ import annotations

import datetime as dt
import hashlib
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from replay_profile import replay_settings

from test_replay_properties import _entry, _mk_events, _r6, _write_events
from test_replay_properties4 import _write_docs_src

_SETTINGS = replay_settings(10)

_BASE = dt.datetime(2024, 1, 1)

_ev_rows = st.lists(
    st.tuples(
        st.integers(0, 2),                                   # user
        st.integers(0, 60 * 60 * 60),                        # second offset
        st.sampled_from(["view", "click", "signup", "error"]),
        st.one_of(st.none(), st.integers(0, 200)),           # value*0.5
    ),
    min_size=1,
    max_size=30,
)


@given(raw=_ev_rows)
@_SETTINGS
def test_cdc_unwrap_and_grouping_sets_match_naive(spark, raw):
    """CDC envelope rewrite/drop modes and the 3-set GROUPING SETS
    marginals vs direct Python replays (gid bitmask convention: first
    listed column = most significant bit)."""
    rows = [
        (i, _BASE + dt.timedelta(seconds=s), u, t,
         None if v is None else v * 0.5)
        for i, (u, s, t, v) in enumerate(raw)
    ]
    tmp = _write_events(spark, rows)

    # --- cdc_unwrap_rewrite: every row kept, deletes flagged
    got = {
        r.event_id: (r.user_id, r.value, r["__deleted"])
        for r in _entry("cdc_unwrap_rewrite")(spark, tmp).collect()
    }
    want = {i: (u, v, t == "error") for i, _ts, u, t, v in rows}
    assert got == want, (got, want)

    # --- cdc_unwrap_drop: deletes dropped, op column exposed
    got = {
        r.event_id: (r.user_id, r.value, r.op)
        for r in _entry("cdc_unwrap_drop")(spark, tmp).collect()
    }
    want = {
        i: (u, v, "c" if t == "signup" else "u")
        for i, _ts, u, t, v in rows
        if t != "error"
    }
    assert got == want, (got, want)

    # --- grouping_sets_mix: (type, day) / (type) / (day) in one pass
    got = {
        (r.event_type, r.day, r.gid): (r.n_events, r.total_value)
        for r in _entry("grouping_sets_mix")(spark, tmp).collect()
    }
    # accumulate (count, sum_in_half_units, any_nonnull) per cell
    cells: dict = {}

    def acc(key, v):
        n, s, seen = cells.get(key, (0, 0, False))
        if v is not None:
            s += round(v * 2)
            seen = True
        cells[key] = (n + 1, s, seen)

    for _i, ts, _u, t, v in rows:
        day = ts.replace(hour=0, minute=0, second=0, microsecond=0)
        acc((t, day, 0), v)
        acc((t, None, 1), v)
        acc((None, day, 2), v)
    want = {k: (n, s / 2.0 if seen else None) for k, (n, s, seen) in cells.items()}
    assert got == want, (got, want)


_ord_case = st.tuples(
    # customers: (nationkey, acctbal*0.25)
    st.lists(st.tuples(st.integers(0, 3), st.integers(-100, 400)), min_size=1, max_size=8),
    # orders: (cust_ref, status|None, priority|None, price*0.25, day)
    st.lists(
        st.tuples(
            st.integers(0, 7),
            st.one_of(st.none(), st.sampled_from(["O", "F"])),
            st.one_of(st.none(), st.sampled_from(["1-URGENT", "5-LOW"])),
            st.integers(0, 400),
            st.integers(0, 800),
        ),
        min_size=1,
        max_size=12,
    ),
)


def _write_orders_dims(spark, cust, orders):
    tmp = tempfile.mkdtemp(prefix="replay_cube_")

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
        "customer",
        [(k, f"cust{k}", n, "AUTO", a * 0.25) for k, (n, a) in enumerate(cust)],
        "c_custkey long, c_name string, c_nationkey long,"
        " c_mktsegment string, c_acctbal double",
    )
    w(
        "orders",
        [
            (k, c % len(cust), s, p * 0.25, _BASE + dt.timedelta(days=d), pr)
            for k, (c, s, pr, p, d) in enumerate(orders)
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    return tmp


@given(case=_ord_case)
@_SETTINGS
def test_cube_rollup_profile_match_naive(spark, case):
    """CUBE with grouping_id (real-NULL groups vs subtotal rows — the
    gid bit is the only thing separating them here, since statuses can
    genuinely be NULL), ROLLUP over a joined dimension chain, and the
    melt-based column profiler, vs direct Python replays."""
    cust, orders = case
    tmp = _write_orders_dims(spark, cust, orders)

    # --- cube_agg: 4 grouping sets, gid = (status_bit<<1) | priority_bit
    got = {
        (r.o_orderstatus, r.o_orderpriority, r.gid): (r.n_orders, r.total_price)
        for r in _entry("cube_agg")(spark, tmp).collect()
    }
    cells: dict = {}
    for _c, s, pr, p, _d in orders:
        for ks, kp, gid in (
            (s, pr, 0),
            (s, None, 1),
            (None, pr, 2),
            (None, None, 3),
        ):
            n, tot = cells.get((ks, kp, gid), (0, 0))
            cells[(ks, kp, gid)] = (n + 1, tot + p)
    want = {k: (n, tot * 0.25) for k, (n, tot) in cells.items()}
    assert set(got) == set(want), (got, want)
    for k, (n, tot) in want.items():
        assert got[k][0] == n and abs(got[k][1] - tot) <= 1e-9, (k, got[k], n, tot)

    # --- rollup_agg: (region, nation) / (region) / () over the dim chain
    got = {
        (r.r_name, r.n_name): (r.n_customers, r.total_acctbal)
        for r in _entry("rollup_agg")(spark, tmp).collect()
    }
    cells = {}
    for nk, a in cust:
        rn, nn = ("ASIA" if nk % 2 == 0 else "EUROPE"), f"NATION_{nk}"
        for key in ((rn, nn), (rn, None), (None, None)):
            n, tot = cells.get(key, (0, 0))
            cells[key] = (n + 1, tot + a)
    want = {k: (n, tot * 0.25) for k, (n, tot) in cells.items()}
    assert set(got) == set(want), (got, want)
    for k, (n, tot) in want.items():
        assert got[k][0] == n and abs(got[k][1] - tot) <= 1e-9

    # --- profile_columns: melt + one aggregate; NULL statuses exercise
    # null_frac, the decimal(18,2) render pins the float canonical form
    got = {
        r["column"]: (r.n_rows, r.null_frac, r.n_distinct, r.min_value, r.max_value)
        for r in _entry("profile_columns")(spark, tmp).collect()
    }
    from decimal import ROUND_HALF_UP, Decimal

    n = len(orders)
    cols = {
        "o_custkey": [str(c % len(cust)) for c, _s, _p, _pr, _d in orders],
        "o_orderstatus": [s for _c, s, _p, _pr, _d in orders],
        "o_orderpriority": [p for _c, _s, p, _pr, _d in orders],
        "o_totalprice": [
            str(Decimal(repr(pr * 0.25)).quantize(Decimal("1e-2"), ROUND_HALF_UP))
            for _c, _s, _p, pr, _d in orders
        ],
    }
    want = {}
    for name, vals in cols.items():
        nn = [v for v in vals if v is not None]
        want[name] = (
            n,
            _r6((n - len(nn)) / n),
            len(set(nn)),
            min(nn) if nn else None,
            max(nn) if nn else None,
        )
    assert got == want, (got, want)


# --- bloom runtime-filter semi join ----------------------------------------

_bloom_case = st.tuples(
    # parts: p_size in {50, 10} — 50 is the entry's literal filter
    st.lists(st.sampled_from([50, 10]), min_size=1, max_size=8),
    # lineitems: (part_ref, price*0.25, disc%, returnflag)
    st.lists(
        st.tuples(
            st.integers(0, 9),
            st.integers(0, 400),
            st.integers(0, 10),
            st.sampled_from(["N", "R", "A"]),
        ),
        min_size=1,
        max_size=20,
    ),
)


@given(case=_bloom_case)
@_SETTINGS
def test_bloom_semi_join_matches_exact_exists(spark, case):
    """The bloom-prefiltered semi join must equal the plain EXISTS —
    the bitmap may pass false positives but the exact join removes
    them, and a bloom false NEGATIVE (impossible by construction) would
    show up here as a missing row."""
    sizes, lis = case
    tmp = tempfile.mkdtemp(prefix="replay_bloom_")
    spark.createDataFrame(
        [(k, f"part{k}", "B", "STD", sz, 1.0) for k, sz in enumerate(sizes)],
        "p_partkey long, p_name string, p_brand string, p_type string,"
        " p_size int, p_retailprice double",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/part.parquet")
    spark.createDataFrame(
        [
            (1, p % len(sizes), 0, 1.0, pr * 0.25, d * 0.01, rf, "O", _BASE)
            for (p, pr, d, rf) in lis
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, l_quantity double,"
        " l_extendedprice double, l_discount double, l_returnflag string,"
        " l_linestatus string, l_shipdate timestamp",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/lineitem.parquet")

    got = {
        r.l_returnflag: (r.n_items, r.revenue)
        for r in _entry("bloom_semi_join")(spark, tmp).collect()
    }
    cells: dict = {}
    for p, pr, d, rf in lis:
        if sizes[p % len(sizes)] == 50:
            n, rev = cells.get(rf, (0, 0))
            cells[rf] = (n + 1, rev + pr * 25 * (100 - d))
    want = {rf: (n, rev / 1e4) for rf, (n, rev) in cells.items()}
    assert set(got) == set(want), (got, want)
    for rf, (n, rev) in want.items():
        assert got[rf][0] == n and abs(got[rf][1] - rev) <= 1e-6


# --- content-defined chunking family ---------------------------------------


def _cdc_chunks(text: str) -> list[str]:
    """Python replay of the CDC boundary scan: normalize, then split
    where int(md5(8-char window)[:15 hex], 16) % 64 == 0."""
    import re

    n = re.sub(r"[^a-z0-9]+", " ", text.lower()).strip(" ")
    if len(n) < 16:
        return []
    bf = [1]
    for i in range(2, len(n) - 7 + 1):  # 1-based, inclusive
        win = n[i - 1 : i - 1 + 8]
        if int(hashlib.md5(win.encode()).hexdigest()[:15], 16) % 64 == 0:
            bf.append(i)
    bf.append(len(n) + 1)
    return [n[bf[k] - 1 : bf[k + 1] - 1] for k in range(len(bf) - 1)]


# docs built from a shared passage pool so identical passages (and thus
# shared chunks) genuinely occur across documents
_chunk_docs = st.builds(
    lambda pool, picks: [
        ("srcA", " ".join(pool[j % len(pool)] for j in ks)) for ks in picks
    ],
    pool=st.lists(st.text("ab ", min_size=8, max_size=40), min_size=2, max_size=5),
    picks=st.lists(
        st.lists(st.integers(0, 9), min_size=1, max_size=4),
        min_size=1,
        max_size=10,
    ),
)


@given(docs=_chunk_docs)
@_SETTINGS
def test_content_chunk_family_matches_hashlib(spark, docs):
    """content_chunk_dedup corpus stats and shared_passage_pairs vs a
    hashlib replay of the whole CDC pipeline (normalize, boundary scan,
    chunk fingerprints, per-pair shared-chunk counts)."""
    tmp = _write_docs_src(spark, docs)

    # per-doc chunk fingerprint multisets
    occ: dict = {}  # (doc_id, fp) -> count
    for i, (_s, text) in enumerate(docs):
        for ch in _cdc_chunks(text):
            fp = hashlib.md5(ch.encode()).hexdigest()
            occ[(i, fp)] = occ.get((i, fp), 0) + 1

    # --- content_chunk_dedup
    row = _entry("content_chunk_dedup")(spark, tmp).collect()[0]
    by_fp: dict = {}  # fp -> (total occ, ndocs)
    for (i, fp), c in occ.items():
        t, nd = by_fp.get(fp, (0, 0))
        by_fp[fp] = (t + c, nd + 1)
    total = sum(t for t, _nd in by_fp.values())
    shared = sum(t for t, nd in by_fp.values() if nd >= 2)
    # empty corpus: sum over zero rows is NULL (count stays 0) — the
    # same convention both engines agreed on in the degenerate sweep
    assert row.n_chunk_occurrences == (total if by_fp else None)
    assert row.n_distinct_chunks == len(by_fp)
    assert row.n_shared_chunks == sum(1 for _t, nd in by_fp.values() if nd >= 2)
    assert row.n_shared_occurrences == (shared if by_fp else 0)
    if total:
        assert abs(row.shared_frac - _r6(shared / total)) <= 1.1e-6

    # --- shared_passage_pairs (>=3 shared fps, boilerplate fps skipped)
    got = {
        (r.doc_a, r.doc_b): r.n_shared_chunks
        for r in _entry("shared_passage_pairs")(spark, tmp).collect()
    }
    fp_docs: dict = {}
    for (i, fp), _c in occ.items():
        fp_docs.setdefault(fp, set()).add(i)
    pair_n: dict = {}
    for fp, ds in fp_docs.items():
        if 2 <= len(ds) <= 20:
            ds = sorted(ds)
            for x in range(len(ds)):
                for y in range(x + 1, len(ds)):
                    k = (ds[x], ds[y])
                    pair_n[k] = pair_n.get(k, 0) + 1
    want = {k: n for k, n in pair_n.items() if n >= 3}
    assert got == want, (got, want)
