"""Independent-Python-replay properties for registry entries that were
previously verified ONLY by their mirrored DuckDB oracles.

Two shared-formula bugs (the round-3 quantile and the round-5
gap_fill_locf) stayed hash-green for multiple rounds because the Spark
code and its oracle SQL encoded the SAME wrong formula — a value-hash
comparison cannot see a bug both sides share.  Every test here replays
the entry's CONTRACT from scratch in plain Python on tiny
hypothesis-generated inputs, so a shared-formula bug breaks the test
even while the oracle hash stays green.  See PROPERTY_COVERAGE.md for
the entry -> verification-layer inventory.

Rounding rule: wherever the entry emits a 6-dp Spark ``F.round``
column, the replay rounds with ``_r6`` (HALF_UP on the double's
shortest decimal repr — BigDecimal.valueOf semantics), NOT Python's
banker's ``round()``; divergence is one micro-unit exactly on 5e-7
boundaries, which hypothesis does find (round-5 BM25 failure).
"""

from __future__ import annotations

import datetime as dt
import math
import tempfile

import pytest
from decimal import ROUND_HALF_UP, Decimal

import pyspark.sql.functions as F  # noqa: F401  (kept for parity with sibling file)
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from replay_profile import replay_settings

_SETTINGS = replay_settings(10)


def _r6(x: float) -> float:
    """Spark round(_, 6): HALF_UP on the double's shortest decimal repr
    (BigDecimal.valueOf semantics)."""
    return float(Decimal(repr(x)).quantize(Decimal("1e-6"), ROUND_HALF_UP))


def _entry(name):
    import __spark_entry__ as entrymod

    return entrymod._REGISTRY[name][0]


# --------------------------------------------------------------------------
# fixture writers (schemas match TESTDATA.md; catalog.load reads them
# unchanged because the ts columns are written as proper timestamps)
# --------------------------------------------------------------------------


def _write_events(spark, rows):
    """rows: (event_id, ts, user_id, event_type, value)"""
    tmp = tempfile.mkdtemp(prefix="replay_ev_")
    spark.createDataFrame(
        [(i, ts, u, t, v, "{}") for i, ts, u, t, v in rows],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/events.parquet")
    return tmp


def _write_documents(spark, docs):
    """docs: (source, text)"""
    tmp = tempfile.mkdtemp(prefix="replay_doc_")
    rows = [(i, t, "en", f"src{s}", len(t)) for i, (s, t) in enumerate(docs)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
    return tmp


def _write_orders(spark, rows, tmp=None):
    """rows: (o_orderkey, o_custkey, o_totalprice, o_orderdate)"""
    tmp = tmp or tempfile.mkdtemp(prefix="replay_ord_")
    spark.createDataFrame(
        [(k, c, "O", p, d, "1-URGENT") for k, c, p, d in rows],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/orders.parquet")
    return tmp


def _write_lineitem(spark, rows, tmp=None):
    """rows: (l_orderkey, l_partkey, l_quantity, l_extendedprice,
    l_discount, l_shipdate)"""
    tmp = tmp or tempfile.mkdtemp(prefix="replay_li_")
    spark.createDataFrame(
        [
            (ok, pk, 100 + i, float(q), float(p), float(d), "N", "O", ts)
            for i, (ok, pk, q, p, d, ts) in enumerate(rows)
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, l_quantity double,"
        " l_extendedprice double, l_discount double, l_returnflag string,"
        " l_linestatus string, l_shipdate timestamp",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/lineitem.parquet")
    return tmp


def _write_customer(spark, rows):
    """rows: (c_custkey, c_nationkey, c_mktsegment, c_acctbal)"""
    tmp = tempfile.mkdtemp(prefix="replay_cust_")
    spark.createDataFrame(
        [(k, f"cust{k}", n, seg, float(b)) for k, n, seg, b in rows],
        "c_custkey long, c_name string, c_nationkey long,"
        " c_mktsegment string, c_acctbal double",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/customer.parquet")
    return tmp


_BASE = dt.datetime(2024, 1, 1)

_ev_rows = st.lists(
    st.tuples(
        st.integers(0, 2),                                   # user
        st.integers(0, 60 * 60 * 30),                        # second offset
        st.sampled_from(["view", "click", "purchase", "error"]),
        st.one_of(st.none(), st.integers(0, 200)),           # value*0.5
    ),
    min_size=1,
    max_size=30,
)


def _mk_events(raw):
    return [
        (i, _BASE + dt.timedelta(seconds=s), u, t,
         None if v is None else v * 0.5)
        for i, (u, s, t, v) in enumerate(raw)
    ]


# --------------------------------------------------------------------------
# events-based entries
# --------------------------------------------------------------------------


@given(raw=_ev_rows)
@_SETTINGS
def test_event_transitions_matches_naive(spark, raw):
    """Markov transition matrix vs a direct per-user (ts, event_id)
    sort + lead walk; row-normalized p rounded HALF_UP."""
    rows = _mk_events(raw)
    got = {
        (r.from_type, r.to_type): (r.n, r.p)
        for r in _entry("event_transitions")(spark, _write_events(spark, rows)).collect()
    }

    per_user: dict = {}
    for i, ts, u, t, _v in rows:
        per_user.setdefault(u, []).append((ts, i, t))
    counts: dict = {}
    for seq in per_user.values():
        seq.sort()
        for (_, _, a), (_, _, b) in zip(seq, seq[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + 1
    row_tot: dict = {}
    for (a, _b), n in counts.items():
        row_tot[a] = row_tot.get(a, 0) + n
    want = {k: (n, _r6(n / row_tot[k[0]])) for k, n in counts.items()}
    assert got == want, (raw, got, want)


@given(raw=_ev_rows)
@_SETTINGS
def test_chi_square_independence_matches_naive(spark, raw):
    """Pearson chi² of event_type × day-name vs a direct contingency
    replay: 6-dp terms summed as exact Decimal."""
    rows = _mk_events(raw)
    [r] = _entry("chi_square_independence")(
        spark, _write_events(spark, rows)
    ).collect()

    obs: dict = {}
    for _i, ts, _u, t, _v in rows:
        k = (t, ts.strftime("%A"))
        obs[k] = obs.get(k, 0) + 1
    n = sum(obs.values())
    rt: dict = {}
    ct: dict = {}
    for (t, d), o in obs.items():
        rt[t] = rt.get(t, 0) + o
        ct[d] = ct.get(d, 0) + o
    term_sum = Decimal(0)
    for (t, d), o in obs.items():
        e = float(rt[t]) * float(ct[d]) / float(n)
        term_sum += Decimal(repr(_r6((o - e) ** 2 / e)))
    dof = (len(rt) - 1) * (len(ct) - 1)
    assert r.n == n and r.dof == dof
    assert r.chi2 == float(term_sum), (raw, r.chi2, float(term_sum))


@given(raw=_ev_rows)
@_SETTINGS
def test_hopping_agg_matches_naive(spark, raw):
    """1-day/12-h hopping windows vs direct double-assignment: every
    event in exactly two windows, exact decimal value sums."""
    rows = _mk_events(raw)
    got = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in _entry("hopping_agg")(spark, _write_events(spark, rows)).collect()
    }

    acc: dict = {}
    epoch = dt.datetime(1970, 1, 1)
    for _i, ts, _u, t, v in rows:
        sec = int((ts - epoch).total_seconds())
        s0 = (sec // 43200) * 43200
        for start in (s0, s0 - 43200):
            assert start <= sec < start + 86400
            key = (epoch + dt.timedelta(seconds=start), t)
            n, tot = acc.get(key, (0, None))
            if v is not None:
                tot = (tot or Decimal(0)) + Decimal(repr(v))
            acc[key] = (n + 1, tot)
    # sum over an all-NULL group is NULL in both engines
    want = {k: (n, None if tot is None else float(tot))
            for k, (n, tot) in acc.items()}
    assert got == want, (raw, got, want)


@given(raw=_ev_rows)
@_SETTINGS
def test_value_trend_regression_matches_naive(spark, raw):
    """Closed-form OLS from exact decimal sufficient statistics vs a
    direct replay: integer-second x, exact Decimal sums, try_divide
    NULL on zero variance, NULL y rows counted but not summed."""
    rows = _mk_events(raw)
    got = {
        r.event_type: (r.n_events, r.slope_per_sec, r.intercept, r.r2)
        for r in _entry("value_trend_regression")(
            spark, _write_events(spark, rows)
        ).collect()
    }

    origin_us = 1704067200000000
    epoch = dt.datetime(1970, 1, 1)
    stats: dict = {}
    for _i, ts, _u, t, v in rows:
        x = (int((ts - epoch).total_seconds() * 1_000_000) - origin_us) // 1_000_000
        s = stats.setdefault(t, {"n": 0, "sx": 0, "sy": Decimal(0), "sxx": 0,
                                 "sxy": Decimal(0), "syy": Decimal(0)})
        s["n"] += 1
        s["sx"] += x
        s["sxx"] += x * x
        if v is not None:
            y = Decimal(repr(v))
            s["sy"] += y
            s["sxy"] += x * y
            s["syy"] += y * y
    want = {}
    for t, s in stats.items():
        if s["sy"] == 0 and not any(
            v is not None for _i, _ts, _u, t2, v in rows if t2 == t
        ):
            # all-NULL y: sum() is NULL in both engines, so every
            # derived statistic is NULL
            want[t] = (s["n"], None, None, None)
            continue
        n, sx, sy = float(s["n"]), float(s["sx"]), float(s["sy"])
        sxx, sxy, syy = float(s["sxx"]), float(s["sxy"]), float(s["syy"])
        cov_n = n * sxy - sx * sy
        var_n = n * sxx - sx * sx
        slope = None if var_n == 0 else cov_n / var_n
        intercept = None if slope is None else _r6((sy - slope * sx) / n)
        r2_den = var_n * (n * syy - sy * sy)
        r2 = None if r2_den == 0 else _r6(cov_n * cov_n / r2_den)
        want[t] = (
            s["n"],
            None if slope is None else _r6(slope),
            intercept,
            r2,
        )
    assert got == want, (raw, got, want)


@given(raw=_ev_rows)
@_SETTINGS
def test_time_grain_rollup_matches_naive(spark, raw):
    """GROUPING SETS hour/day/week pyramid vs three direct rollups
    (Monday-start weeks, exact decimal sums)."""
    rows = _mk_events(raw)
    got = {
        (r.event_type, r.grain, r.bucket): (r.n_events, r.total_value)
        for r in _entry("time_grain_rollup")(
            spark, _write_events(spark, rows)
        ).collect()
    }

    acc: dict = {}
    for _i, ts, _u, t, v in rows:
        hour = ts.replace(minute=0, second=0, microsecond=0)
        day = ts.replace(hour=0, minute=0, second=0, microsecond=0)
        week = day - dt.timedelta(days=day.weekday())
        for grain, b in (("hour", hour), ("day", day), ("week", week)):
            key = (t, grain, b)
            n, tot = acc.get(key, (0, Decimal(0)))
            acc[key] = (n + 1, tot if v is None else tot + Decimal(repr(v)))
    # NULL-only groups: Spark sum over all-NULL is NULL
    want = {}
    for k, (n, tot) in acc.items():
        has_val = any(
            v is not None
            for _i, ts, _u, t2, v in rows
            if t2 == k[0] and _in_grain(ts, k[1], k[2])
        )
        want[k] = (n, float(tot) if has_val else None)
    assert got == want, (raw, got, want)


def _in_grain(ts, grain, bucket):
    hour = ts.replace(minute=0, second=0, microsecond=0)
    day = ts.replace(hour=0, minute=0, second=0, microsecond=0)
    week = day - dt.timedelta(days=day.weekday())
    return {"hour": hour, "day": day, "week": week}[grain] == bucket


@given(raw=_ev_rows)
@_SETTINGS
def test_funnel_windowed_matches_naive(spark, raw):
    """12-h per-step funnel vs a direct first-view / windowed
    first-click / windowed first-purchase replay."""
    rows = _mk_events(raw)
    [r] = _entry("funnel_windowed")(spark, _write_events(spark, rows)).collect()

    win = dt.timedelta(hours=12)
    users = sorted({u for _i, _ts, u, _t, _v in rows})
    fv: dict = {}
    for _i, ts, u, t, _v in rows:
        if t == "view" and (u not in fv or ts < fv[u]):
            fv[u] = ts
    fc: dict = {}
    for _i, ts, u, t, _v in rows:
        if (t == "click" and u in fv and fv[u] < ts <= fv[u] + win
                and (u not in fc or ts < fc[u])):
            fc[u] = ts
    fp: dict = {}
    for _i, ts, u, t, _v in rows:
        if (t == "purchase" and u in fc and fc[u] < ts <= fc[u] + win
                and (u not in fp or ts < fp[u])):
            fp[u] = ts
    n_view, n_click, n_purch = len(fv), len(fc), len(fp)
    # the entry's base frame is one row per user with any event
    assert set(fv) <= set(users)
    assert (r.n_view, r.n_click_12h, r.n_purchase_12h) == (n_view, n_click, n_purch)
    want_vc = None if n_view == 0 else _r6(n_click / n_view)
    want_cp = _r6(n_purch / max(n_click, 1))
    assert r.view_to_click == want_vc and r.click_to_purchase == want_cp, (
        raw, r, want_vc, want_cp)


@given(raw=_ev_rows)
@_SETTINGS
def test_zorder_clustering_matches_naive(spark, raw):
    """Morton-bucket stats vs a direct bit-interleave replay (16 bits
    per dimension, 64 fixed-width ranges, NULL value -> NULL bucket)."""
    rows = _mk_events(raw)
    got = {
        r.zbucket: (r.n, r.x_min, r.x_max, r.y_min, r.y_max)
        for r in _entry("zorder_clustering")(
            spark, _write_events(spark, rows)
        ).collect()
    }

    span = (1 << 32) // 64
    acc: dict = {}
    for _i, _ts, u, _t, v in rows:
        # greatest() ignores NULLs in both engines, so a NULL value
        # clamps to cell 0 rather than producing a NULL bucket
        ycell = 0 if v is None else min(max(math.floor(v * 100), 0), 65535)
        z = 0
        for b in range(16):
            z += ((u >> b) & 1) << (2 * b)
            z += ((ycell >> b) & 1) << (2 * b + 1)
        key = z // span
        cur = acc.get(key)
        if cur is None:
            acc[key] = [1, u, u, ycell, ycell]
        else:
            cur[0] += 1
            cur[1] = min(cur[1], u)
            cur[2] = max(cur[2], u)
            cur[3] = min(cur[3], ycell)
            cur[4] = max(cur[4], ycell)
    want = {k: tuple(v) for k, v in acc.items()}
    assert got == want, (raw, got, want)


# --------------------------------------------------------------------------
# documents-based entries
# --------------------------------------------------------------------------

_DOC_WORDS = ["data", "spark", "join", "data1", "x"]

_doc_rows = st.lists(
    st.tuples(
        st.integers(0, 1),
        st.lists(st.sampled_from(_DOC_WORDS), min_size=0, max_size=10).map(
            " ".join
        ),
    ),
    min_size=1,
    max_size=10,
)


def _norm_tokens(text):
    import re

    n = re.sub(r"[^a-z0-9]+", " ", text.lower()).strip()
    return n.split(" ") if n else []


@given(docs=_doc_rows)
@_SETTINGS
def test_tfidf_top_terms_matches_naive(spark, docs):
    """Smoothed TF-IDF top-3 vs a direct Python tf/df/idf replay with
    the (tfidf desc, term) tie-break."""
    got = {}
    for r in _entry("tfidf_top_terms")(spark, _write_documents(spark, docs)).collect():
        got[(r.doc_id, r.term_rank)] = (r.term, r.tf, r.tfidf)

    toks = {i: _norm_tokens(t) for i, (_s, t) in enumerate(docs)}
    toks = {i: ws for i, ws in toks.items() if ws}
    tf: dict = {}
    dfreq: dict = {}
    for i, ws in toks.items():
        seen = set()
        for w in ws:
            tf[(i, w)] = tf.get((i, w), 0) + 1
            seen.add(w)
        for w in seen:
            dfreq[w] = dfreq.get(w, 0) + 1
    nd = len(toks)
    want = {}
    for i, ws in toks.items():
        scored = sorted(
            (
                (-_r6(tf[(i, w)] * _r6(math.log((nd + 1.0) / (dfreq[w] + 1.0)))), w)
                for w in set(ws)
            ),
        )
        for rnk, (neg, w) in enumerate(scored[:3], 1):
            want[(i, rnk)] = (w, tf[(i, w)], -neg)
    assert got == want, (docs, got, want)


@given(docs=_doc_rows)
@_SETTINGS
def test_ttr_by_source_matches_naive(spark, docs):
    """Type-token ratio per source vs a direct token walk."""
    got = {
        r.source: (r.n_tokens, r.n_types, r.ttr, r.total_chars)
        for r in _entry("ttr_by_source")(spark, _write_documents(spark, docs)).collect()
    }

    acc: dict = {}
    for s, text in docs:
        ws = _norm_tokens(text)
        if not ws:
            continue
        a = acc.setdefault(f"src{s}", [0, set(), 0])
        a[0] += len(ws)
        a[1].update(ws)
        a[2] += sum(len(w) for w in ws)
    want = {
        s: (n, len(types), _r6(len(types) / n), chars)
        for s, (n, types, chars) in acc.items()
    }
    assert got == want, (docs, got, want)


@given(docs=_doc_rows)
@_SETTINGS
def test_length_percentiles_matches_naive(spark, docs):
    """Per-language char-length percentiles vs a direct linear-
    interpolation replay (Spark `percentile` definition)."""
    got = {
        r.lang: (r.n_docs, r.p50_chars, r.p90_chars, r.p99_chars)
        for r in _entry("length_percentiles")(
            spark, _write_documents(spark, docs)
        ).collect()
    }

    lens = sorted(len(t) for _s, t in docs)

    def pct(p):
        pos = p * (len(lens) - 1)
        lo = int(math.floor(pos))
        frac = pos - lo
        hi = min(lo + 1, len(lens) - 1)
        return _r6(lens[lo] + frac * (lens[hi] - lens[lo]))

    want = {"en": (len(lens), pct(0.5), pct(0.9), pct(0.99))}
    assert got == want, (docs, got, want)


_pmi_docs = st.lists(
    st.tuples(
        st.integers(0, 0),
        st.lists(
            st.sampled_from(["a1", "b2", "c3"]), min_size=0, max_size=12
        ).map(" ".join),
    ),
    min_size=1,
    max_size=8,
)


@given(docs=_pmi_docs)
@_SETTINGS
def test_bigram_pmi_matches_naive(spark, docs):
    """Top-30 bigram PMI vs a direct count replay: exact integer
    counts, one 6-dp ln, (pmi desc, gram) ranking, min-count 5."""
    got = {
        r.rnk: (r.gram, r.cnt_ab, r.pmi)
        for r in _entry("bigram_pmi")(spark, _write_documents(spark, docs)).collect()
    }

    cb: dict = {}
    cu: dict = {}
    b_total = u_total = 0
    for _s, text in docs:
        ws = _norm_tokens(text)
        for w in ws:
            cu[w] = cu.get(w, 0) + 1
            u_total += 1
        for a, b in zip(ws, ws[1:]):
            g = f"{a} {b}"
            cb[g] = cb.get(g, 0) + 1
            b_total += 1
    scored = []
    for g, n_ab in cb.items():
        if n_ab < 5:
            continue
        w1, w2 = g.split(" ")
        pmi = _r6(
            math.log(
                n_ab * 1.0 * u_total * u_total
                / (b_total * 1.0 * cu[w1] * cu[w2])
            )
        )
        scored.append((-pmi, g, n_ab))
    scored.sort()
    want = {
        rnk: (g, n_ab, -neg) for rnk, (neg, g, n_ab) in enumerate(scored[:30], 1)
    }
    assert got == want, (docs, got, want)


# --------------------------------------------------------------------------
# orders / lineitem / customer entries
# --------------------------------------------------------------------------

_order_rows = st.lists(
    st.tuples(
        st.integers(0, 4),            # custkey
        st.integers(0, 40_000),       # price in quarter-units -> *0.25
        st.integers(0, 800),          # orderdate day offset
    ),
    min_size=1,
    max_size=25,
)


def _mk_orders(raw):
    return [
        (i, c, p * 0.25, _BASE.replace(year=2022) + dt.timedelta(days=d))
        for i, (c, p, d) in enumerate(raw)
    ]


@given(raw=_order_rows)
@_SETTINGS
def test_benford_audit_matches_naive(spark, raw):
    """First-digit law audit vs a direct digit histogram replay."""
    rows = _mk_orders(raw)
    got = {
        r.d: (r.n, r.observed_p, r.benford_p)
        for r in _entry("benford_audit")(
            spark, _write_orders(spark, rows)
        ).collect()
    }

    digits: dict = {}
    for _k, _c, p, _d in rows:
        if p >= 1:
            d = int(str(int(math.floor(p)))[0])
            digits[d] = digits.get(d, 0) + 1
    tot = sum(digits.values())
    want = {
        d: (n, _r6(n / tot), _r6(math.log10(1.0 + 1.0 / d)))
        for d, n in digits.items()
    }
    assert got == want, (raw, got, want)


@given(raw=_order_rows)
@_SETTINGS
def test_cumulative_revenue_matches_naive(spark, raw):
    """Per-customer running decimal spend vs a direct sorted-prefix
    replay ((o_orderdate, o_orderkey) order, exact quarter-cents)."""
    rows = _mk_orders(raw)
    got = {
        (r.o_custkey, r.o_orderkey): (r.order_seq, r.cum_spend)
        for r in _entry("cumulative_revenue")(
            spark, _write_orders(spark, rows)
        ).collect()
    }

    per_cust: dict = {}
    for k, c, p, d in rows:
        per_cust.setdefault(c, []).append((d, k, p))
    want = {}
    for c, orders in per_cust.items():
        orders.sort()
        cum = Decimal(0)
        for seq, (d, k, p) in enumerate(orders, 1):
            cum += Decimal(repr(p)).quantize(
                Decimal("0.0001"), rounding=ROUND_HALF_UP
            )
            want[(c, k)] = (seq, float(cum))
    assert got == want, (raw, got, want)


@pytest.mark.parametrize(
    "entry_name", ["revenue_percent_rank", "revenue_percent_rank_scaled"]
)
@given(raw=_order_rows)
@_SETTINGS
def test_revenue_percent_rank_matches_naive(spark, entry_name, raw):
    """percent_rank / cume_dist of per-customer revenue within nation
    vs a direct rank replay over exact decimal revenue sums.  Round 10
    moved the entry to integer micro-unit norms — pr/cd are FLOOR
    divisions at 1e-6 resolution ((rank-1)*1e6 // (n-1), n_le*1e6 //
    n), no longer round-half-up of the float ratio — so the replay
    floors the same integer identities."""
    # customers: nation = custkey % 2 so ties within a nation are likely
    rows = _mk_orders(raw)
    cust_rows = [(c, c % 2, "SEG", 0) for c in sorted({r[1] for r in rows})]
    tmp = _write_customer(spark, cust_rows)
    _write_orders(spark, rows, tmp=tmp)
    got = {
        r.customer_id: (r.nation_key, r.revenue, r.pr, r.cd)
        for r in _entry(entry_name)(spark, tmp).collect()
    }

    rev: dict = {}
    for k, c, p, _d in rows:
        rev[c] = rev.get(c, Decimal(0)) + Decimal(repr(p)).quantize(
            Decimal("0.0001"), rounding=ROUND_HALF_UP
        )
    by_nation: dict = {}
    for c, v in rev.items():
        by_nation.setdefault(c % 2, []).append((v, c))
    want = {}
    for nk, vs in by_nation.items():
        vals = sorted(v for v, _c in vs)
        n = len(vals)
        for v, c in vs:
            rank = 1 + sum(1 for x in vals if x < v)  # ties share min rank
            pr = 0.0 if n == 1 else ((rank - 1) * 1_000_000 // (n - 1)) / 1e6
            cd = (sum(1 for x in vals if x <= v) * 1_000_000 // n) / 1e6
            want[c] = (nk, float(v), pr, cd)
    assert got == want, (raw, got, want)


_li_rows = st.lists(
    st.tuples(
        st.integers(0, 5),           # orderkey
        st.integers(0, 3),           # partkey
        st.integers(1, 30),          # quantity
        st.integers(0, 8_000),       # extendedprice quarter-units
        st.integers(0, 10),          # discount percent
        st.integers(0, 800),         # shipdate day offset from 1996-06-01
    ),
    min_size=1,
    max_size=30,
)


def _mk_lineitem(raw):
    base = dt.datetime(1996, 6, 1)
    return [
        (ok, pk, q, p * 0.25, d * 0.01, base + dt.timedelta(days=off))
        for ok, pk, q, p, d, off in raw
    ]


@given(raw=_li_rows)
@_SETTINGS
def test_forecast_revenue_delta_matches_naive(spark, raw):
    """TPC-H Q6 analogue vs a direct filtered exact-decimal replay."""
    rows = _mk_lineitem(raw)
    [r] = _entry("forecast_revenue_delta")(
        spark, _write_lineitem(spark, rows)
    ).collect()

    lo, hi = dt.datetime(1997, 1, 1), dt.datetime(1998, 1, 1)
    q4 = Decimal("0.0001")
    tot = None
    n = 0
    for _ok, _pk, q, p, d, ts in rows:
        if lo <= ts < hi and 0.05 <= d <= 0.07 and q < 24:
            n += 1
            term = (
                Decimal(repr(p)).quantize(q4, rounding=ROUND_HALF_UP)
                * Decimal(repr(d)).quantize(q4, rounding=ROUND_HALF_UP)
            )
            tot = term if tot is None else tot + term
    assert r.n_lines == n
    assert r.revenue_delta == (None if tot is None else float(tot)), (
        raw, r.revenue_delta, tot)


@given(raw=_li_rows, o_raw=_order_rows)
@_SETTINGS
def test_revenue_reconciliation_matches_naive(spark, raw, o_raw):
    """Header-vs-detail money reconciliation vs a direct exact-cents
    replay (line-less orders, exact matches, absolute drift)."""
    li_rows = _mk_lineitem(raw)
    o_rows = _mk_orders(o_raw)
    tmp = _write_lineitem(spark, li_rows)
    _write_orders(spark, o_rows, tmp=tmp)
    [r] = _entry("revenue_reconciliation")(spark, tmp).collect()

    c2 = Decimal("0.01")
    li_gross: dict = {}
    for ok, _pk, _q, p, _d, _ts in li_rows:
        li_gross[ok] = li_gross.get(ok, Decimal(0)) + Decimal(repr(p)).quantize(
            c2, rounding=ROUND_HALF_UP
        )
    n_orders = len(o_rows)
    n_no_lines = n_exact = 0
    drift = Decimal(0)
    for k, _c, p, _d in o_rows:
        header = Decimal(repr(p)).quantize(c2, rounding=ROUND_HALF_UP)
        g = li_gross.get(k)
        if g is None:
            n_no_lines += 1
        else:
            if header == g:
                n_exact += 1
            drift += abs(header - g)
    assert (r.n_orders, r.n_no_lines, r.n_exact_match) == (
        n_orders, n_no_lines, n_exact)
    assert r.total_abs_drift == (None if n_orders == 0 else float(drift)), (
        r.total_abs_drift, drift)


@given(raw=_li_rows)
@_SETTINGS
def test_basket_lift_matches_naive(spark, raw):
    """Market-basket support/lift top-20 vs a direct distinct-pair
    count replay with the (lift desc, u, v) ranking."""
    rows = _mk_lineitem(raw)
    got = [
        (r.u, r.v, r.n_uv, r.support, r.lift)
        for r in _entry("basket_lift")(spark, _write_lineitem(spark, rows)).collect()
    ]

    items = {(ok, pk) for ok, pk, _q, _p, _d, _ts in rows}
    orders: dict = {}
    for ok, pk in items:
        orders.setdefault(ok, set()).add(pk)
    n_orders = len(orders)
    cnt: dict = {}
    for _ok, pk in items:
        cnt[pk] = cnt.get(pk, 0) + 1
    pairs: dict = {}
    for _ok, parts in orders.items():
        ps = sorted(parts)
        for i, u in enumerate(ps):
            for v in ps[i + 1:]:
                pairs[(u, v)] = pairs.get((u, v), 0) + 1
    scored = []
    for (u, v), n_uv in pairs.items():
        if n_uv < 3:
            continue
        scored.append(
            (
                -_r6(n_uv * n_orders / (cnt[u] * cnt[v])),
                u,
                v,
                n_uv,
                _r6(n_uv / n_orders),
            )
        )
    scored.sort()
    want = [(u, v, n_uv, sup, -neg) for neg, u, v, n_uv, sup in scored[:20]]
    assert sorted(got, key=lambda t: (-t[4], t[0], t[1])) == want, (
        raw, got, want)


_cust_rows = st.lists(
    st.tuples(
        st.integers(0, 2),                        # nationkey
        st.sampled_from(["AUTO", "HOME"]),        # segment
        st.integers(-2_000, 12_000),              # acctbal in units of 0.5
    ),
    min_size=1,
    max_size=25,
)


@given(raw=_cust_rows)
@_SETTINGS
def test_k_anonymity_audit_matches_naive(spark, raw):
    """k-anonymity ladder vs a direct equivalence-class count replay."""
    rows = [(i, n, seg, b * 0.5) for i, (n, seg, b) in enumerate(raw)]
    got = {
        r.k: (r.n_groups_below_k, r.n_rows_at_risk, r.n_groups)
        for r in _entry("k_anonymity_audit")(
            spark, _write_customer(spark, rows)
        ).collect()
    }

    groups: dict = {}
    for _k, n, seg, b in rows:
        band = math.floor(b / 1000.0)
        key = (n, seg, band)
        groups[key] = groups.get(key, 0) + 1
    want = {}
    for k in (2, 5, 10):
        below = [g for g in groups.values() if g < k]
        want[k] = (len(below), sum(below), len(groups))
    assert got == want, (raw, got, want)


# --------------------------------------------------------------------------
# batch 2: audits, linkage, lag percentiles, novelty
# --------------------------------------------------------------------------


def _write_part(spark, rows):
    """rows: (p_partkey, p_name, p_brand)"""
    tmp = tempfile.mkdtemp(prefix="replay_part_")
    spark.createDataFrame(
        [(k, n, b, "TYPE", 10, 1.0) for k, n, b in rows],
        "p_partkey long, p_name string, p_brand string, p_type string,"
        " p_size long, p_retailprice double",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/part.parquet")
    return tmp


@given(
    o_raw=_order_rows,
    li_raw=_li_rows,
    c_raw=_cust_rows,
    e_raw=_ev_rows,
)
@_SETTINGS
def test_dq_audit_matches_naive(spark, o_raw, li_raw, c_raw, e_raw):
    """Five-constraint DQ audit vs direct Python counting — FK null
    probes, PK uniqueness, domain checks."""
    o_rows = _mk_orders(o_raw)
    li_rows = _mk_lineitem(li_raw)
    c_rows = [(i % 3, n, seg, b * 0.5) for i, (n, seg, b) in enumerate(c_raw)]
    e_rows = _mk_events(e_raw)
    tmp = _write_orders(spark, o_rows)
    _write_lineitem(spark, li_rows, tmp=tmp)
    spark.createDataFrame(
        [(k, f"cust{k}", n, seg, float(b)) for k, n, seg, b in c_rows],
        "c_custkey long, c_name string, c_nationkey long,"
        " c_mktsegment string, c_acctbal double",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/customer.parquet")
    spark.createDataFrame(
        [(i, ts, u, t, v, "{}") for i, ts, u, t, v in e_rows],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/events.parquet")

    got = {
        r.check_name: (r.n_violations, r.n_checked)
        for r in _entry("dq_audit")(spark, tmp).collect()
    }

    # LEFT-join fanout: a duplicated PK on the dimension side multiplies
    # the probe row, and BOTH engines count the multiplied rows — the
    # replay must too (hypothesis found the miscount immediately)
    cust_mult: dict = {}
    for k, _n, _s, _b in c_rows:
        cust_mult[k] = cust_mult.get(k, 0) + 1
    ord_mult: dict = {}
    for k, _c, _p, _d in o_rows:
        ord_mult[k] = ord_mult.get(k, 0) + 1
    want = {
        "orders_fk_customer": (
            sum(1 for _k, c, _p, _d in o_rows if c not in cust_mult),
            sum(max(1, cust_mult.get(c, 0)) for _k, c, _p, _d in o_rows),
        ),
        "lineitem_fk_orders": (
            sum(1 for ok, *_ in li_rows if ok not in ord_mult),
            sum(max(1, ord_mult.get(ok, 0)) for ok, *_ in li_rows),
        ),
        "customer_pk_unique": (
            len(c_rows) - len(cust_mult),
            len(c_rows),
        ),
        "events_value_not_null": (
            sum(1 for *_x, v in e_rows if v is None),
            len(e_rows),
        ),
        "orders_price_positive": (
            sum(1 for _k, _c, p, _d in o_rows if p <= 0),
            len(o_rows),
        ),
    }
    assert got == want, (got, want)


def _lev(a, b):
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


_part_rows = st.lists(
    st.tuples(
        st.sampled_from(["B1", "B2"]),
        st.text(alphabet="abcd", min_size=1, max_size=6),
    ),
    min_size=1,
    max_size=20,
)


@pytest.mark.parametrize(
    "entry_name",
    ["sorted_neighborhood_pairs", "sorted_neighborhood_pairs_scaled"],
)
@given(raw=_part_rows)
@_SETTINGS
def test_sorted_neighborhood_pairs_matches_naive(spark, entry_name, raw):
    """Sorted-neighborhood linkage vs a direct sorted-walk replay with
    a from-scratch Levenshtein DP (round 11: both plan twins)."""
    rows = [(i, name, brand) for i, (brand, name) in enumerate(raw)]
    got = sorted(
        (r.p_brand, r.name_a, r.name_b, r.w_off, r.dist)
        for r in _entry(entry_name)(
            spark, _write_part(spark, rows)
        ).collect()
    )

    by_brand: dict = {}
    for _k, name, brand in rows:
        by_brand.setdefault(brand, set()).add(name)
    want = []
    for brand, names in by_brand.items():
        s = sorted(names)
        for i, a in enumerate(s):
            for off in (1, 2):
                if i + off < len(s):
                    d = _lev(a, s[i + off])
                    if d <= 4:
                        want.append((brand, a, s[i + off], off, d))
    assert got == sorted(want), (raw, got, want)


@given(o_raw=_order_rows, li_raw=_li_rows)
@_SETTINGS
def test_ship_lag_percentiles_matches_naive(spark, o_raw, li_raw):
    """Order-to-ship lag percentiles vs a direct join + interpolated-
    percentile replay."""
    o_rows = _mk_orders(o_raw)
    li_rows = _mk_lineitem(li_raw)
    tmp = _write_orders(spark, o_rows)
    _write_lineitem(spark, li_rows, tmp=tmp)
    got = {
        r.o_orderpriority: (r.n_items, r.p50_days, r.p90_days, r.p99_days,
                            r.max_days)
        for r in _entry("ship_lag_percentiles")(spark, tmp).collect()
    }

    odate = {k: d for k, _c, _p, d in o_rows}
    lags = sorted(
        (ship.date() - odate[ok].date()).days
        for ok, _pk, _q, _p, _d, ship in li_rows
        if ok in odate
    )
    if not lags:
        assert got == {}
        return

    def pct(p):
        pos = p * (len(lags) - 1)
        lo = int(math.floor(pos))
        hi = min(lo + 1, len(lags) - 1)
        return _r6(lags[lo] + (pos - lo) * (lags[hi] - lags[lo]))

    want = {"1-URGENT": (len(lags), pct(0.5), pct(0.9), pct(0.99), lags[-1])}
    assert got == want, (got, want)


@pytest.mark.parametrize(
    "entry_name", ["skew_audit", "skew_audit_scaled"]
)
@given(raw=_ev_rows)
@_SETTINGS
def test_skew_audit_matches_naive(spark, entry_name, raw):
    """Key-skew Gini + hottest-key ratio vs an exact integer replay of
    the sorted-rank formula (round 11: both plan twins)."""
    rows = _mk_events(raw)
    [r] = _entry(entry_name)(spark, _write_events(spark, rows)).collect()

    per_key: dict = {}
    for _i, _ts, u, _t, _v in rows:
        per_key[u] = per_key.get(u, 0) + 1
    ranked = sorted((c, u) for u, c in per_key.items())
    n, tot = len(ranked), sum(c for c, _u in ranked)
    gini_num = sum(
        (2 * i - n - 1) * c for i, (c, _u) in enumerate(ranked, 1)
    )
    assert (r.n_keys, r.n_rows, r.max_key_rows) == (n, tot, ranked[-1][0])
    assert r.max_skew_ratio == _r6(ranked[-1][0] * n / tot)
    assert r.gini == _r6(gini_num / (n * tot)), (raw, r.gini, gini_num)


@given(docs=_doc_rows)
@_SETTINGS
def test_dup_rate_by_source_matches_naive(spark, docs):
    """Exact-dup rate per source vs a direct digest-group replay."""
    got = {
        r.source: (r.n_docs, r.n_redundant, r.dup_rate)
        for r in _entry("dup_rate_by_source")(
            spark, _write_documents(spark, docs)
        ).collect()
    }

    groups: dict = {}
    for s, text in docs:
        key = (f"src{s}", text)
        groups[key] = groups.get(key, 0) + 1
    per_src: dict = {}
    for (s, _t), n in groups.items():
        tot, ngrp = per_src.get(s, (0, 0))
        per_src[s] = (tot + n, ngrp + 1)
    want = {
        s: (tot, tot - ngrp, _r6((tot - ngrp) / tot))
        for s, (tot, ngrp) in per_src.items()
    }
    assert got == want, (docs, got, want)


@given(raw=_ev_rows)
@_SETTINGS
def test_seasonal_outliers_matches_naive(spark, raw):
    """Per-(type, weekday) z-score screen vs a direct exact-moment
    replay (NULL-safe Bessel denominator, |z| > 3 on the unrounded
    score)."""
    rows = _mk_events(raw)
    got = {
        r.event_id: (r.event_type, r.weekday, r.value, r.seasonal_z)
        for r in _entry("seasonal_outliers")(
            spark, _write_events(spark, rows)
        ).collect()
    }

    cells: dict = {}
    for _i, ts, _u, t, v in rows:
        s = cells.setdefault((t, ts.weekday()), [0, Decimal(0), Decimal(0)])
        s[0] += 1
        if v is not None:
            y = Decimal(repr(v))
            s[1] += y
            s[2] += y * y
    want = {}
    for i, ts, _u, t, v in rows:
        key = (t, ts.weekday())
        n, s1, s2 = cells[key]
        if n <= 1 or v is None:
            continue
        var = (float(s2) - float(s1) * float(s1) / n) / (n - 1)
        den = math.sqrt(var) if var > 0 else 0.0
        if den == 0:
            continue  # nullif -> NULL z -> filtered
        zs = (v - float(s1) / n) / den
        if abs(zs) > 3:
            want[i] = (t, ts.weekday(), v, _r6(zs))
    assert got == want, (raw, got, want)


_novel_docs = st.lists(
    st.tuples(
        st.integers(0, 0),
        st.lists(
            st.sampled_from(["w1", "w2", "w3"]), min_size=0, max_size=9
        ).map(" ".join),
    ),
    min_size=1,
    max_size=8,
)


@given(docs=_novel_docs)
@_SETTINGS
def test_ngram_novelty_matches_naive(spark, docs):
    """Novelty curve vs a direct first-seen replay on 60-bit md5 gram
    hashes (distinct 5-word grams per doc, min-doc first appearance)."""
    import hashlib

    got = {
        r.doc_id: (r.n_grams, r.n_novel, r.novelty)
        for r in _entry("ngram_novelty")(
            spark, _write_documents(spark, docs)
        ).collect()
    }

    def gh(gram):
        return int(hashlib.md5(gram.encode()).hexdigest()[:15], 16)

    doc_ghs: dict = {}
    for i, (_s, text) in enumerate(docs):
        ws = _norm_tokens(text)
        if len(ws) < 5:
            continue
        grams = {" ".join(ws[j:j + 5]) for j in range(len(ws) - 4)}
        doc_ghs[i] = {gh(g) for g in grams}
    first_seen: dict = {}
    for i in sorted(doc_ghs):
        for h in doc_ghs[i]:
            first_seen.setdefault(h, i)
    want = {}
    for i, hs in doc_ghs.items():
        novel = sum(1 for h in hs if first_seen[h] == i)
        want[i] = (len(hs), novel, _r6(novel / len(hs)))
    assert got == want, (docs, got, want)


# --------------------------------------------------------------------------
# batch 3: core text functions, pivots, set ops
# --------------------------------------------------------------------------

import re as _re

_STOPS = ("the", "a", "and", "of", "in", "to", "is", "it")
_MARKERS = {
    "en": ("the", "and", "of", "is"),
    "de": ("der", "die", "und", "ist"),
    "fr": ("le", "la", "et", "est"),
    "es": ("el", "los", "que", "es"),
    "zh": ("de", "shi", "le", "bu"),
}


def _toks(text):
    # Spark/DuckDB trim() strips SPACES only — a leading newline
    # survives and split() then yields a leading empty token, so the
    # replay must NOT use Python's all-whitespace .strip()
    return _re.split(r"\s+", text.strip(" "))


def _stop_hits(text):
    pat = r"\b(" + "|".join(_STOPS) + r")\b"
    return len(_re.findall(pat, text.lower()))


def _punct_ratio(text):
    return _r6(
        len(_re.findall(r"[.,!?;:]", text)) / max(len(text), 1)
    )


def _stop_ratio(text):
    return _r6(_stop_hits(text) / max(len(_toks(text)), 1))


def _quality(text):
    len_score = min(len(text) / 200.0, 1.0)
    stop_score = min(_stop_ratio(text) * 4.0, 1.0)
    punct_penalty = min(_punct_ratio(text) * 10.0, 1.0)
    return _r6(len_score * 0.4 + stop_score * 0.4 + (1.0 - punct_penalty) * 0.2)


def _pred_lang(text):
    low = text.lower()
    langs = sorted(_MARKERS)
    best_enc = max(
        len(_re.findall(r"\b(" + "|".join(_MARKERS[lg]) + r")\b", low)) * 8 + i
        for i, lg in enumerate(langs)
    )
    return langs[best_enc % 8] if best_enc >= 8 else "und"


_text_docs = st.lists(
    st.tuples(
        st.integers(0, 1),
        st.lists(
            st.sampled_from(
                ["the", "der", "le", "el", "de", "x.", "!?", "a1", "und..."]
            ),
            min_size=0,
            max_size=12,
        ).map(" ".join),
    ),
    min_size=1,
    max_size=10,
)


@given(docs=_text_docs)
@_SETTINGS
def test_text_stats_matches_naive(spark, docs):
    """Every per-doc text statistic vs direct Python regex replays of
    the documented formulas (token counts, ratios, quality score)."""
    got = {
        r.doc_id: (
            r.n_chars_calc, r.n_tokens, r.n_bpe_tokens, r.punct_ratio,
            r.stopword_ratio, r.avg_token_len, r.quality_score,
        )
        for r in _entry("text_stats")(spark, _write_documents(spark, docs)).collect()
    }

    want = {}
    for i, (_s, text) in enumerate(docs):
        nt = len(_toks(text))
        want[i] = (
            len(text),
            nt,
            len(_re.findall(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]", text)),
            _punct_ratio(text),
            _stop_ratio(text),
            _r6(len(_re.sub(r"\s+", "", text)) / max(nt, 1)),
            _quality(text),
        )
    assert got == want, (docs, got, want)


@given(docs=_text_docs)
@_SETTINGS
def test_lang_id_and_fingerprint_match_naive(spark, docs):
    """Marker-argmax language ID (alphabetically-last tie-break,
    zero hits -> 'und') and the alnum-normalized md5 fingerprint."""
    import hashlib

    sf = _write_documents(spark, docs)
    got_lang = {
        r.doc_id: r.pred_lang for r in _entry("lang_id")(spark, sf).collect()
    }
    got_fp = {
        r.doc_id: r.fingerprint
        for r in _entry("doc_fingerprint")(spark, sf).collect()
    }

    for i, (_s, text) in enumerate(docs):
        assert got_lang[i] == _pred_lang(text), (text, got_lang[i])
        norm = _re.sub(r"[^a-z0-9]", "", text.lower())
        assert got_fp[i] == hashlib.md5(norm.encode()).hexdigest()


@given(docs=_text_docs)
@_SETTINGS
def test_token_count_matches_naive(spark, docs):
    """Corpus token totals per language vs direct counting."""
    [r] = _entry("token_count")(spark, _write_documents(spark, docs)).collect()
    ws = sum(len(_toks(t)) for _s, t in docs)
    bpe = sum(
        len(_re.findall(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]", t)) for _s, t in docs
    )
    assert (r.lang, r.total_ws_tokens, r.total_bpe_tokens, r.n_docs) == (
        "en", ws, bpe, len(docs))


@given(docs=_text_docs)
@_SETTINGS
def test_corpus_clean_matches_naive(spark, docs):
    """Dedup -> quality filter -> lang filter pipeline vs a direct
    keep-lowest-id-per-digest + threshold replay."""
    got = {
        r.doc_id: (r.pred_lang, r.quality)
        for r in _entry("corpus_clean")(spark, _write_documents(spark, docs)).collect()
    }

    keep: dict = {}
    for i, (_s, text) in enumerate(docs):
        if text not in keep:
            keep[text] = i
    want = {}
    for text, i in keep.items():
        q = _quality(text)
        lang = _pred_lang(text)
        if q >= 0.5 and lang != "und":
            want[i] = (lang, q)
    assert got == want, (docs, got, want)


@pytest.mark.parametrize(
    "entry_name", ["value_quartiles", "value_quartiles_scaled"]
)
@given(raw=_ev_rows)
@_SETTINGS
def test_value_quartiles_matches_naive(spark, entry_name, raw):
    """ntile(4) bucket stats vs a direct replay of ntile's
    ceil/floor bucket sizing with the (value, event_id) order
    (NULL values sort first, ascending)."""
    rows = _mk_events(raw)
    got = {
        (r.event_type, r.quartile): (r.n, r.lo, r.hi, r.total)
        for r in _entry(entry_name)(
            spark, _write_events(spark, rows)
        ).collect()
    }

    by_type: dict = {}
    for i, _ts, _u, t, v in rows:
        by_type.setdefault(t, []).append((v, i))
    want = {}
    for t, vs in by_type.items():
        vs.sort(key=lambda p: (p[0] is not None, p[0] if p[0] is not None else 0, p[1]))
        n = len(vs)
        sizes = [n // 4 + (1 if j < n % 4 else 0) for j in range(4)]
        pos = 0
        for q, sz in enumerate(sizes, 1):
            if sz == 0:
                continue
            bucket = vs[pos:pos + sz]
            pos += sz
            vals = [v for v, _i in bucket if v is not None]
            tot = (
                float(sum(Decimal(repr(v)) for v in vals)) if vals else None
            )
            want[(t, q)] = (
                sz,
                _r6(min(vals)) if vals else None,
                _r6(max(vals)) if vals else None,
                tot,
            )
    assert got == want, (raw, got, want)


@given(raw=_ev_rows)
@_SETTINGS
def test_event_type_pivot_and_set_ops_match_naive(spark, raw):
    """Fixed-list pivot counts and INTERSECT/EXCEPT segmentation vs
    direct per-user counting."""
    rows = _mk_events(raw)
    sf = _write_events(spark, rows)
    etypes = ["click", "error", "purchase", "signup", "view"]
    got = {
        r.user_id: tuple(r[t] for t in etypes) + (r.total,)
        for r in _entry("event_type_pivot")(spark, sf).collect()
    }
    per_user: dict = {}
    for _i, _ts, u, t, _v in rows:
        per_user.setdefault(u, {}).setdefault(t, 0)
        per_user[u][t] += 1
    want = {
        u: tuple(cnt.get(t, 0) for t in etypes) + (sum(cnt.values()),)
        for u, cnt in per_user.items()
    }
    assert got == want, (raw, got, want)

    got_seg = {
        (r.user_id, r.segment)
        for r in _entry("set_ops_segments")(spark, sf).collect()
    }
    p = {u for _i, _ts, u, t, _v in rows if t == "purchase"}
    c = {u for _i, _ts, u, t, _v in rows if t == "click"}
    want_seg = (
        {(u, "both") for u in p & c}
        | {(u, "purchase_only") for u in p - c}
        | {(u, "click_only") for u in c - p}
    )
    assert got_seg == want_seg, (raw, got_seg, want_seg)


_json_rows = st.lists(
    st.tuples(
        st.sampled_from(["view", "click"]),
        st.one_of(st.none(), st.integers(0, 500)),   # k value or no key
    ),
    min_size=1,
    max_size=20,
)


@given(raw=_json_rows)
@_SETTINGS
def test_json_extract_matches_naive(spark, raw):
    """Regex JSON field extraction vs direct parsing — rows without
    the key contribute NULL (never a crash), all-missing groups sum
    to NULL."""
    rows = [
        (
            i,
            _BASE,
            0,
            t,
            1.0,
            "{}" if k is None else '{"k": %d}' % k,
        )
        for i, (t, k) in enumerate(raw)
    ]
    tmp = tempfile.mkdtemp(prefix="replay_json_")
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/events.parquet")
    got = {
        r.event_type: (r.sum_k, r.n)
        for r in _entry("json_extract")(spark, tmp).collect()
    }

    acc: dict = {}
    for t, k in raw:
        s, n = acc.get(t, (None, 0))
        if k is not None:
            s = (s or 0) + k
        acc[t] = (s, n + 1)
    assert got == acc, (raw, got, acc)


_line_docs = st.lists(
    st.tuples(
        st.integers(0, 1),
        st.lists(
            st.sampled_from(["the cat", "x.", "a line of text", ""]),
            min_size=1,
            max_size=4,
        ).map("\n".join),
    ),
    min_size=1,
    max_size=8,
)


@given(docs=_line_docs)
@_SETTINGS
def test_unpivot_metrics_matches_naive(spark, docs):
    """Wide->long melt of per-source averages vs direct computation
    (newline-aware line counts, exact-decimal quality sums)."""
    got = {
        (r.source, r.metric): r.value
        for r in _entry("unpivot_metrics")(
            spark, _write_documents(spark, docs)
        ).collect()
    }

    per_src: dict = {}
    for s, text in docs:
        a = per_src.setdefault(f"src{s}", [0, 0, 0, Decimal(0)])
        a[0] += 1
        a[1] += len(text)
        a[2] += text.count("\n") + 1
        a[3] += Decimal(repr(_quality(text)))
    want = {}
    for s, (n, chars, lines, qsum) in per_src.items():
        want[(s, "avg_chars")] = _r6(chars / n)
        want[(s, "avg_lines")] = _r6(lines / n)
        want[(s, "avg_quality")] = _r6(float(qsum) / n)
    assert got == want, (docs, got, want)
