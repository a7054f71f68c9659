"""Replay properties batch 16: direct Python replays for the streaming
entries whose oracles are their OWN SQL (no batch twin to compare
against in batch 15) — keyed upsert state, pull-query serving, the
top-N ring, duplicate-drop, the v1/v2 dual-schema topic, HLL state,
the EWMA tail, watermark late-drop, CSAS materialization, restart
totals, the LEFT interval join with watermark-forced NULL emission,
static enrichment, and the two incremental dedup flaggers (minhash and
embedding LSH).  After this batch the only mirrored-only entry left is
streaming_flagship_golden, whose oracle IS a literal VALUES table
already asserted verbatim in tests/fixtures.py.
"""

from __future__ import annotations

import datetime as dt
import hashlib
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from replay_profile import replay_settings

from test_replay_properties import _entry, _r6, _write_documents, _write_events
from test_replay_properties5 import _perdoc, _verified_pairs, _dedup_docs
from test_replay_properties12 import _cos, _lsh_buckets, _vecs64
from test_replay_properties3 import _write_embeddings

_SETTINGS = replay_settings(5)

_BASE = dt.datetime(2024, 1, 1)
_EPOCH = dt.datetime(1970, 1, 1)

# user 3 overlaps the pull-query key set {3, 17, 42, 88, 131}
_ev_rows = st.lists(
    st.tuples(
        st.integers(0, 3),                                   # user
        st.integers(0, 60 * 60 * 60),                        # second offset
        st.sampled_from(["view", "click", "purchase", "error"]),
        st.one_of(st.none(), st.integers(0, 200)),           # value*0.5
    ),
    min_size=1,
    max_size=25,
)


def _mk(raw):
    return [
        (i, _BASE + dt.timedelta(seconds=s), u, t,
         None if v is None else v * 0.5)
        for i, (u, s, t, v) in enumerate(raw)
    ]


def _rq(x, places):
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(repr(x)).quantize(Decimal(places), ROUND_HALF_UP))


_EWMA_W = [
    1.0, 0.7, 0.48999999999999994, 0.3429999999999999, 0.24009999999999995,
    0.16806999999999994, 0.11764899999999996, 0.08235429999999996,
]


@given(raw=_ev_rows)
@_SETTINGS
def test_streaming_state_entries_match_naive(spark, raw):
    """Thirteen stateful streaming entries vs direct Python replays of
    their registered oracle semantics on random events."""
    rows = _mk(raw)
    tmp = _write_events(spark, rows)

    last = {}  # user -> (i, ts, t, v) with max event_id
    for i, ts, u, t, v in rows:
        last[u] = (i, ts, t, v)

    # --- streaming_latest_by_offset
    got = {
        r.user_id: (r.latest_event_type, r.latest_value, r.last_offset)
        for r in _entry("streaming_latest_by_offset")(spark, tmp).collect()
    }
    want = {u: (t, v, i) for u, (i, _ts, t, v) in last.items()}
    assert got == want, (got, want)

    # --- streaming_stateful_agg
    got = {
        r.user_id: (
            r.n_events, r.total_cents, r.latest_event_type,
            r.latest_value, r.last_offset,
        )
        for r in _entry("streaming_stateful_agg")(spark, tmp).collect()
    }
    cents: dict = {}
    for i, _ts, u, t, v in rows:
        n, c, seen = cents.get(u, (0, 0, False))
        if v is not None:
            c += round(v * 2) * 50  # half-units -> cents
            seen = True
        cents[u] = (n + 1, c, seen)
    want = {
        u: (n, c if seen else None, last[u][2], last[u][3], last[u][0])
        for u, (n, c, seen) in cents.items()
    }
    assert got == want, (got, want)

    # --- streaming_cdc_upsert + streaming_pull_query
    state = {
        u: (v, i) for u, (i, _ts, t, v) in last.items() if t != "error"
    }
    got = {
        r.user_id: (r.value, r._offset)
        for r in _entry("streaming_cdc_upsert")(spark, tmp).collect()
    }
    assert got == state, (got, state)
    got = {
        r.user_id: (r.value, r._offset)
        for r in _entry("streaming_pull_query")(spark, tmp).collect()
    }
    want = {u: s for u, s in state.items() if u in (3, 17, 42, 88, 131)}
    assert got == want, (got, want)

    # --- streaming_topn (top-20 purchases by value, NULLs last)
    got = {
        r.event_id: (r.user_id, r.value, r.ts)
        for r in _entry("streaming_topn")(spark, tmp).collect()
    }
    purch = [(i, ts, u, v) for i, ts, u, t, v in rows if t == "purchase"]
    ranked = sorted(purch, key=lambda p: (p[3] is None, -(p[3] or 0), p[0]))[:20]
    want = {i: (u, v, ts) for i, ts, u, v in ranked}
    assert got == want, (got, want)

    # --- streaming_dropdup / streaming_dropdup_watermarked (re-delivered
    # duplicates dropped -> exactly the original rows survive)
    for name in ("streaming_dropdup", "streaming_dropdup_watermarked"):
        got_set = {
            (r.event_id, r.user_id, r.event_type)
            for r in _entry(name)(spark, tmp).collect()
        }
        assert got_set == {(i, u, t) for i, _ts, u, t, _v in rows}, name

    # --- streaming_materialize_topic (CSAS projection of purchases)
    got = {
        r.purchase_id: (r.user_id, r.price, r.ts)
        for r in _entry("streaming_materialize_topic")(spark, tmp).collect()
    }
    assert got == {i: (u, v, ts) for i, ts, u, v in purch}, got

    # --- streaming_restart_resume (non-null-value totals per type)
    got = {
        r.event_type: (r.n_events, r.total_value, r.last_offset)
        for r in _entry("streaming_restart_resume")(spark, tmp).collect()
    }
    cells: dict = {}
    for i, _ts, _u, t, v in rows:
        if v is None:
            continue
        n, s, mx = cells.get(t, (0, 0, -1))
        cells[t] = (n + 1, s + round(v * 2), max(mx, i))
    want = {t: (n, s / 2.0, mx) for t, (n, s, mx) in cells.items()}
    assert got == want, (got, want)

    # --- streaming_avro_evolution (v1/v2 dual-schema topic rollup)
    got = {
        (r.event_type, r.src_ver): (r.n, r.sum_value_micro)
        for r in _entry("streaming_avro_evolution")(spark, tmp).collect()
    }
    cells = {}
    for _i, _ts, u, t, v in rows:
        k = (t, "v1" if u % 2 == 0 else "v2")
        n, s, seen = cells.get(k, (0, 0, False))
        if v is not None:
            s += round(v * 2) * 500000
            seen = True
        cells[k] = (n + 1, s, seen)
    want = {k: (n, s if seen else None) for k, (n, s, seen) in cells.items()}
    assert got == want, (got, want)

    # --- streaming_hll (merged register state per type)
    got = {
        r.event_type: (r.buckets_used, r.hll_estimate)
        for r in _entry("streaming_hll")(spark, tmp).collect()
    }
    regs: dict = {}
    for i, _ts, _u, t, _v in rows:
        hv = int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16)
        b, w = hv % 64, hv // 64
        v_max = (1 << 53) if w == 0 else (w & -w)
        regs[(t, b)] = max(regs.get((t, b), 0), v_max)
    want = {}
    for t in {t for _i, _ts, _u, t, _v in rows}:
        used = [v for (tt, _b), v in regs.items() if tt == t]
        s_used = sum((1 << 54) // v for v in used)
        est = _rq(
            1.046802484394006e20
            / float(s_used + (64 - len(used)) * (1 << 55)),
            "1e-2",
        )
        want[t] = (len(used), est)
    assert set(got) == set(want), (got, want)
    for t, (n, est) in want.items():
        assert got[t][0] == n, (t, got[t], n)
        assert abs(got[t][1] - est) <= 1.1e-2, (t, got[t], est)

    # --- streaming_ewma (8-term tail EWMA, latest row per type)
    got = {
        r.event_type: (r.event_id, r.ts, r.value, r.ewma)
        for r in _entry("streaming_ewma")(spark, tmp).collect()
    }
    want = {}
    for t in {t for _i, _ts, _u, t, _v in rows}:
        seq = sorted(
            ((ts, i, v) for i, ts, _u, tt, v in rows if tt == t),
            key=lambda x: (x[0], x[1]),
        )
        tail = seq[-8:][::-1]  # current row first
        num = den = 0.0
        for k, (_ts, _i, v) in enumerate(tail):
            if v is not None:
                num += v * _EWMA_W[k]
                den += _EWMA_W[k]
        ts_l, i_l, v_l = seq[-1]
        want[t] = (i_l, ts_l, v_l, None if den == 0.0 else _r6(num / den))
    assert set(got) == set(want), (got, want)
    for t, (i_l, ts_l, v_l, ew) in want.items():
        g = got[t]
        assert g[0] == i_l and g[1] == ts_l and g[2] == v_l, (t, g)
        if ew is None:
            assert g[3] is None
        else:
            assert abs(g[3] - ew) <= 1.1e-6, (t, g[3], ew)

    # --- streaming_late_drop (re-delivered thirds admitted only while
    # their hour window is still open vs the max-ts watermark)
    got = {
        (r.window_start, r.event_type): r.n
        for r in _entry("streaming_late_drop")(spark, tmp).collect()
    }
    mx = max(rows, key=lambda r: (r[1], r[0]))
    wm_us = ((max(ts for _i, ts, _u, _t, _v in rows) - _EPOCH)
             // dt.timedelta(microseconds=1) // 1000) * 1000 - 600000000
    cells = {}
    for i, ts, _u, t, _v in rows:
        hour = ts.replace(minute=0, second=0, microsecond=0)
        hour_us = (hour - _EPOCH) // dt.timedelta(microseconds=1)
        keep = (
            i == mx[0]
            or i % 3 != 0
            or hour_us + 3600000000 > wm_us
        )
        if keep:
            cells[(hour, t)] = cells.get((hour, t), 0) + 1
    assert got == cells, (got, cells)


_enrich_case = st.tuples(
    st.lists(
        st.tuples(st.integers(0, 2), st.sampled_from(["gold", "basic"])),
        min_size=0,
        max_size=3,
        unique_by=lambda t: t[0],
    ),
    _ev_rows,
)


@given(case=_enrich_case)
@_SETTINGS
def test_streaming_enrich_and_left_join_match_naive(spark, case):
    """streaming_static_enrich (purchase LEFT customer lookup) and
    streaming_interval_join_left (watermark-forced NULL emission for
    unmatched purchases) vs direct Python replays."""
    cust, raw = case
    rows = _mk(raw)
    tmp = _write_events(spark, rows)
    spark.createDataFrame(
        [(k, f"cust{k}", 0, seg, 1.0) for k, seg in cust],
        "c_custkey long, c_name string, c_nationkey long,"
        " c_mktsegment string, c_acctbal double",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/customer.parquet")

    seg = {k: s for k, s in cust}
    purch = [(i, ts, u, v) for i, ts, u, t, v in rows if t == "purchase"]
    clicks = [(i, ts, u) for i, ts, u, t, _v in rows if t == "click"]

    got = {
        r.event_id: (r.user_id, r.value, r.customer_name, r.customer_segment)
        for r in _entry("streaming_static_enrich")(spark, tmp).collect()
    }
    want = {
        i: (u, v, f"cust{u}" if u in seg else None, seg.get(u))
        for i, _ts, u, v in purch
    }
    assert got == want, (got, want)

    got_rows = sorted(
        (r.purchase_id, r.click_id, r.user_id, r.purchase_ts, r.click_ts)
        for r in _entry("streaming_interval_join_left")(spark, tmp).collect()
    )
    day = dt.timedelta(days=1)
    inner = [
        (pi, ki, pu, pts, kts)
        for pi, pts, pu, _v in purch
        for ki, kts, ku in clicks
        if ku == pu and pts - day <= kts <= pts + day
    ]
    outer = []
    if purch and clicks:
        wm = min(max(p[1] for p in purch), max(k[1] for k in clicks)) - day
        matched = {pi for pi, *_r in inner}
        outer = [
            (pi, None, pu, pts, None)
            for pi, pts, pu, _v in purch
            if pi not in matched and pts + day < wm
        ]
    assert got_rows == sorted(inner + outer), (got_rows, inner, outer)


@given(docs=_dedup_docs)
@_SETTINGS
def test_streaming_minhash_dedup_matches_hashlib(spark, docs):
    """Incremental near-dup flagging: each later doc flagged with its
    smallest earlier verified near-duplicate, replayed from the batch-5
    minhash formulas."""
    tmp = _write_documents(spark, docs)
    got = {
        r.doc_id: (r.dup_of, r.jaccard)
        for r in _entry("streaming_minhash_dedup")(spark, tmp).collect()
    }
    pairs = _verified_pairs(_perdoc([t for _s, t in docs]))
    want = {}
    for (a, b), j in sorted(pairs.items()):
        if b not in want:
            want[b] = (a, j)
    assert got == want, (got, want)


@given(vecs=_vecs64)
@_SETTINGS
def test_streaming_embedding_dedup_matches_python(spark, vecs):
    """Incremental embedding dedup: each later vector flagged with its
    smallest earlier LSH-candidate whose 6-dp cosine >= 0.4, replayed
    from the batch-12 hyperplane formulas."""
    tmp = _write_embeddings(spark, vecs)
    got = {
        r.vec_id: (r.dup_of, r.cos)
        for r in _entry("streaming_embedding_dedup")(spark, tmp).collect()
    }
    buckets = {i: _lsh_buckets(v) for i, (_lab, v) in enumerate(vecs)}
    ids = sorted(buckets)
    want = {}
    for bi in range(len(ids)):
        for ai in range(bi):
            a, b = ids[ai], ids[bi]
            if b in want:
                break
            if any(buckets[a][t] == buckets[b][t] for t in range(4)):
                c = _cos(vecs[a][1], vecs[b][1])
                if c is not None and _r6(c) >= 0.4:
                    want[b] = (a, _r6(c))
    assert set(got) == set(want), (got, want)
    for b, (a, c) in want.items():
        assert got[b][0] == a and abs(got[b][1] - c) <= 1.1e-6, (b, got[b], a, c)
