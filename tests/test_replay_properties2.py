"""Round-6 continuation batch of independent-Python-replay properties.

Same rationale as tests/test_replay_properties.py: these entries were
verified only by mirrored DuckDB oracles (value-hash green), which
cannot catch a formula bug both sides share — two such bugs (r3
quantile, r5 gap_fill_locf) survived multiple rounds until a replay
property caught them.  Every test here re-derives the entry's contract
from scratch in plain Python / numpy on tiny hypothesis inputs.

Covered here (see PROPERTY_COVERAGE.md): theil_sen_trend, psi_drift,
dow_seasonality, session_window, range_frame_revenue, cohort_matrix,
ltv_cohort_curve, repetition_stats, boilerplate_ngrams, common_ngrams,
ngram_jaccard, lang_id_eval.
"""

from __future__ import annotations

import datetime as dt
import math
import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from replay_profile import replay_settings

from test_replay_properties import (
    _entry,
    _pred_lang,
    _r6,
    _write_documents,
    _write_events,
    _write_orders,
)

_SETTINGS = replay_settings(10)

_BASE = dt.datetime(2024, 1, 1)  # a Monday — week truncation lands here


def _spark_pctl(sorted_vals, p):
    """Spark `percentile` exact interpolation: position = p*(n-1),
    result = lower*(higher-pos) + higher*(pos-lower) — Spark's exact
    float expression, which differs in rounding from the algebraically
    equal lower + (higher-lower)*frac."""
    n = len(sorted_vals)
    pos = p * (n - 1)
    lo = math.floor(pos)
    hi = math.ceil(pos)
    if lo == hi:
        return sorted_vals[lo]
    return sorted_vals[lo] * (hi - pos) + sorted_vals[hi] * (pos - lo)


# --------------------------------------------------------------------------
# events-based entries (wide time range: multiple days/weeks)
# --------------------------------------------------------------------------

_ev_wide = st.lists(
    st.tuples(
        st.integers(0, 2),                       # user
        st.integers(0, 40 * 86400),              # second offset (40 days)
        st.sampled_from(["view", "click", "purchase"]),
        st.one_of(st.none(), st.integers(0, 200)),  # value*0.5
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


@given(raw=_ev_wide)
@_SETTINGS
def test_theil_sen_trend_matches_naive(spark, raw):
    """Median-of-pairwise-slopes vs a direct O(d^2) Python replay:
    exact integer daily micro-sums, the same double slope expression,
    and Spark percentile's exact interpolation formula."""
    rows = _mk_events(raw)
    got = {
        r.event_type: (r.n_pairs, r.theil_sen_slope)
        for r in _entry("theil_sen_trend")(spark, _write_events(spark, rows)).collect()
    }

    daily: dict = {}
    for _i, ts, _u, t, v in rows:
        if v is None:
            continue
        day = ts.date()
        daily[(t, day)] = daily.get((t, day), 0) + round(v * 1e6)  # halves: exact
    by_type: dict = {}
    for (t, day), m in daily.items():
        by_type.setdefault(t, []).append((day, m))
    want = {}
    for t, pts in by_type.items():
        d0 = min(d for d, _ in pts)
        idx = sorted((( (d - d0).days, m) for d, m in pts))
        slopes = [
            (float(mb - ma) / 1e6) / (xb - xa)
            for i, (xa, ma) in enumerate(idx)
            for (xb, mb) in idx[i + 1:]
        ]
        if slopes:
            want[t] = (len(slopes), _r6(_spark_pctl(sorted(slopes), 0.5)))
    assert set(got) == set(want), (raw, got, want)
    for t in want:
        assert got[t][0] == want[t][0], (t, got[t], want[t])
        assert abs(got[t][1] - want[t][1]) <= 1.1e-6, (t, got[t], want[t])


@given(raw=_ev_wide)
@_SETTINGS
def test_psi_drift_matches_naive(spark, raw):
    """PSI between the two halves of the time span vs a direct Python
    replay of the documented formula (fixed 25-wide bins, clamp to
    [0,19], Laplace smoothing, ln-ratio sum)."""
    rows = _mk_events(raw)
    got = {
        r.event_type: (r.n_ref, r.n_cur, r.psi, r.drifted)
        for r in _entry("psi_drift")(spark, _write_events(spark, rows)).collect()
    }

    def us(ts):
        return int(ts.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)

    all_us = [us(ts) for _i, ts, _u, _t, _v in rows]
    mid = (min(all_us) + max(all_us)) // 2
    counts: dict = {}
    for _i, ts, _u, t, v in rows:
        if v is None:
            continue
        period = "ref" if us(ts) < mid else "cur"
        b = max(0, min(math.floor(v / 25.0), 19))
        counts[(t, period, b)] = counts.get((t, period, b), 0) + 1
    grps = {t for (t, _p, _b) in counts}
    want = {}
    for g in grps:
        n_ref = sum(c for (t, p, _b), c in counts.items() if t == g and p == "ref")
        n_cur = sum(c for (t, p, _b), c in counts.items() if t == g and p == "cur")
        psi = 0.0
        for b in range(20):
            p_ref = (counts.get((g, "ref", b), 0) + 1) / (n_ref + 20)
            p_cur = (counts.get((g, "cur", b), 0) + 1) / (n_cur + 20)
            psi += (p_cur - p_ref) * math.log(p_cur / p_ref)
        want[g] = (n_ref, n_cur, psi)
    assert set(got) == set(want), (raw, got, want)
    for g, (n_ref, n_cur, psi) in want.items():
        assert got[g][0] == n_ref and got[g][1] == n_cur, (g, got[g], want[g])
        assert abs(got[g][2] - _r6(psi)) <= 1.1e-6, (g, got[g], psi)
        if abs(psi - 0.1) > 1e-5:  # skip the flag only exactly at the cutoff
            assert got[g][3] == int(psi >= 0.1), (g, got[g], psi)


@given(raw=_ev_wide)
@_SETTINGS
def test_dow_seasonality_matches_naive(spark, raw):
    """Weekday means and seasonal index vs a direct Python replay —
    ISO Monday=0, NULL values excluded from sums but counted in n."""
    rows = _mk_events(raw)
    got = {
        (r.event_type, r.weekday): (r.n_events, r.dow_mean, r.seasonal_index)
        for r in _entry("dow_seasonality")(spark, _write_events(spark, rows)).collect()
    }

    cells: dict = {}
    for _i, ts, _u, t, v in rows:
        wd = ts.weekday()
        n, s, has = cells.get((t, wd), (0, 0.0, False))
        cells[(t, wd)] = (n + 1, s + (v or 0.0), has or v is not None)
    tot: dict = {}
    for (t, _wd), (n, s, has) in cells.items():
        tn, ts_, thas = tot.get(t, (0, 0.0, False))
        tot[t] = (tn + n, ts_ + s, thas or has)
    assert set(got) == set(cells), (raw, got)
    for (t, wd), (n, s, has) in cells.items():
        gn, gmean, gidx = got[(t, wd)]
        assert gn == n, ((t, wd), got[(t, wd)])
        tn, ts_, thas = tot[t]
        if not has:
            assert gmean is None and gidx is None, ((t, wd), got[(t, wd)])
            continue
        mean = s / n
        assert gmean is not None and abs(gmean - _r6(mean)) <= 1.1e-6
        all_mean = ts_ / tn if thas else None
        if all_mean is None or all_mean == 0.0:
            # contract question: a zero corpus mean cannot yield an
            # index; the operator must not crash and must emit NULL
            assert gidx is None, ((t, wd), got[(t, wd)])
        else:
            assert gidx is not None and abs(gidx - _r6(mean / all_mean)) <= 1.1e-6


@given(raw=_ev_wide)
@_SETTINGS
def test_session_window_matches_naive(spark, raw):
    """30-minute gap sessionization vs a direct interval-merge replay:
    a new session starts when the gap is >= 30 min (window end
    exclusive); session_start is the first event's ts."""
    rows = _mk_events(raw)
    got = sorted(
        (r.user_id, r.session_start, r.n_events)
        for r in _entry("session_window")(spark, _write_events(spark, rows)).collect()
    )

    per_user: dict = {}
    for _i, ts, u, _t, _v in rows:
        per_user.setdefault(u, []).append(ts)
    want = []
    gap = dt.timedelta(minutes=30)
    for u, tss in per_user.items():
        tss.sort()
        start, end, n = None, None, 0
        for ts in tss:
            if start is None or ts >= end:
                if start is not None:
                    want.append((u, start, n))
                start, end, n = ts, ts + gap, 1
            else:
                end = max(end, ts + gap)
                n += 1
        if start is not None:
            want.append((u, start, n))
    assert got == sorted(want), (raw, got, want)


@given(raw=_ev_wide)
@_SETTINGS
def test_cohort_matrix_matches_naive(spark, raw):
    """Weekly cohort retention triangle vs a direct Python replay
    (first-seen week cohorts, distinct active week offsets)."""
    rows = _mk_events(raw)
    got = {
        (r.cohort_week, r.week_offset): (r.n_active, r.retention)
        for r in _entry("cohort_matrix")(spark, _write_events(spark, rows)).collect()
    }

    def week(ts):
        d = ts.date()
        monday = d - dt.timedelta(days=d.weekday())
        return dt.datetime(monday.year, monday.month, monday.day)

    first: dict = {}
    for _i, ts, u, _t, _v in rows:
        w = week(ts)
        if u not in first or w < first[u]:
            first[u] = w
    size: dict = {}
    for u, cw in first.items():
        size[cw] = size.get(cw, 0) + 1
    act = {
        (first[u], (week(ts) - first[u]).days // 7)
        for _i, ts, u, _t, _v in rows
        for u in [u]
    }
    counts: dict = {}
    for cw, off in act:
        counts[(cw, off)] = counts.get((cw, off), 0) + 0  # spine
    # n_active = distinct users per (cohort, offset)
    peru = {
        (first[u], (week(ts) - first[u]).days // 7, u)
        for _i, ts, u, _t, _v in rows
    }
    n_active: dict = {}
    for cw, off, _u in peru:
        n_active[(cw, off)] = n_active.get((cw, off), 0) + 1
    want = {
        k: (n, _r6(n / size[k[0]])) for k, n in n_active.items()
    }
    assert got == want, (raw, got, want)


@given(raw=_ev_wide)
@_SETTINGS
def test_ltv_cohort_curve_matches_naive(spark, raw):
    """Cumulative purchase LTV per cohort week-of-life vs a direct
    Python replay in exact integer micro-units."""
    rows = _mk_events(raw)
    got = {
        (r.cohort_week, r.week_offset): (r.cohort_size, r.avg_ltv)
        for r in _entry("ltv_cohort_curve")(spark, _write_events(spark, rows)).collect()
    }

    def week(ts):
        d = ts.date()
        monday = d - dt.timedelta(days=d.weekday())
        return dt.datetime(monday.year, monday.month, monday.day)

    first: dict = {}
    for _i, ts, u, _t, _v in rows:
        w = week(ts)
        if u not in first or w < first[u]:
            first[u] = w
    size: dict = {}
    for u, cw in first.items():
        size[cw] = size.get(cw, 0) + 1
    rev: dict = {}
    for _i, ts, u, t, v in rows:
        if t != "purchase" or v is None:
            continue
        cw = first[u]
        off = (week(ts) - cw).days // 7
        rev[(cw, off)] = rev.get((cw, off), 0) + round(v * 1e6)
    want = {}
    for cw in {k[0] for k in rev}:
        cum = 0
        for off in sorted(k[1] for k in rev if k[0] == cw):
            cum += rev[(cw, off)]
            want[(cw, off)] = (size[cw], _r6(float(cum) / 1e6 / size[cw]))
    assert set(got) == set(want), (raw, got, want)
    for k, (sz, ltv) in want.items():
        assert got[k][0] == sz and abs(got[k][1] - ltv) <= 1.1e-6, (k, got[k], (sz, ltv))


# --------------------------------------------------------------------------
# orders-based: RANGE frame
# --------------------------------------------------------------------------

_order_rows = st.lists(
    st.tuples(
        st.integers(0, 2),                 # cust
        st.integers(0, 90),                # day offset
        st.integers(0, 4000),              # price*0.25
    ),
    min_size=1,
    max_size=25,
)


@given(raw=_order_rows)
@_SETTINGS
def test_range_frame_revenue_matches_naive(spark, raw):
    """Trailing-30-day RANGE frame vs a direct per-row scan replay —
    same-timestamp peers included, exact decimal sums."""
    rows = [
        (i, c, d * 0.25, _BASE + dt.timedelta(days=day))
        for i, (c, day, d) in enumerate(raw)
    ]
    got = {
        r.o_orderkey: (r.n_orders_30d, r.rev_30d)
        for r in _entry("range_frame_revenue")(spark, _write_orders(spark, rows)).collect()
    }

    want = {}
    for k, c, p, d in rows:
        e = d.replace(tzinfo=dt.timezone.utc).timestamp()
        peers = [
            (pk, pp)
            for pk, pc, pp, pd in rows
            if pc == c
            and e - 30 * 86400
            <= pd.replace(tzinfo=dt.timezone.utc).timestamp()
            <= e
        ]
        # exact quarter-unit sums -> exact double
        want[k] = (len(peers), sum(round(pp * 4) for _pk, pp in peers) / 4.0)
    assert got == want, (raw, got, want)


# --------------------------------------------------------------------------
# documents-based entries
# --------------------------------------------------------------------------

_WORDS = ["aa", "bb", "cc", "dd", "x9", "Zz", "q-q", ""]

_doc_texts = st.lists(
    st.tuples(
        st.integers(0, 1),  # source
        st.lists(st.sampled_from(_WORDS), min_size=0, max_size=10).map(" ".join),
    ),
    min_size=1,
    max_size=10,
)


def _norm(text):
    return re.sub(r"[^a-z0-9]+", " ", text.lower()).strip(" ")


@given(docs=_doc_texts)
@_SETTINGS
def test_repetition_stats_matches_naive(spark, docs):
    """Distinct-token ratio + top-bigram occupancy vs direct Python
    counting on the normalized token stream."""
    tmp = _write_documents(spark, docs)
    got = {
        r.doc_id: (r.n_tok, r.distinct_ratio, r.top_bigram_ratio)
        for r in _entry("repetition_stats")(spark, tmp).collect()
    }

    want = {}
    for i, (_s, text) in enumerate(docs):
        w = _norm(text).split(" ")
        if len(w) < 2:
            continue
        bgs = [f"{w[j - 1]} {w[j]}" for j in range(1, len(w))]
        top = max(bgs.count(b) for b in set(bgs))
        want[i] = (
            len(w),
            _r6(len(set(w)) / len(w)),
            _r6(top / len(bgs)),
        )
    assert got == want, (docs, got, want)


@given(docs=_doc_texts)
@_SETTINGS
def test_boilerplate_and_common_ngrams_match_naive(spark, docs):
    """Trigram document-frequency family vs direct Python set math:
    per-doc boilerplate share (grams in >= 3 docs) and the global
    top-40 gram ranking."""
    tmp = _write_documents(spark, docs)
    got_b = {
        r.doc_id: (r.n_grams, r.n_boiler, r.boiler_ratio)
        for r in _entry("boilerplate_ngrams")(spark, tmp).collect()
    }
    got_c = {
        r.rnk: (r.gram, r.nd)
        for r in _entry("common_ngrams")(spark, tmp).collect()
    }

    per_doc: dict = {}
    for i, (_s, text) in enumerate(docs):
        w = _norm(text).split(" ")
        if not _norm(text):
            continue
        grams = {f"{w[j]} {w[j+1]} {w[j+2]}" for j in range(len(w) - 2)}
        if grams:
            per_doc[i] = grams
    nd: dict = {}
    for grams in per_doc.values():
        for g in grams:
            nd[g] = nd.get(g, 0) + 1
    boiler = {g for g, n in nd.items() if n >= 3}
    want_b = {
        i: (
            len(g),
            len(g & boiler),
            _r6(len(g & boiler) / len(g)),
        )
        for i, g in per_doc.items()
    }
    assert got_b == want_b, (docs, got_b, want_b)
    ranked = sorted(nd.items(), key=lambda kv: (-kv[1], kv[0]))[:40]
    want_c = {r + 1: (g, n) for r, (g, n) in enumerate(ranked)}
    assert got_c == want_c, (docs, got_c, want_c)


@given(docs=_doc_texts)
@_SETTINGS
def test_ngram_jaccard_matches_naive(spark, docs):
    """Blocked word-bigram Jaccard vs direct Python set math over the
    same (lang, source) blocks, threshold 0.3."""
    tmp = _write_documents(spark, docs)
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in _entry("ngram_jaccard")(spark, tmp).collect()
    }

    sets: dict = {}
    src: dict = {}
    for i, (s, text) in enumerate(docs):
        w = _norm(text).split(" ")
        if not _norm(text) or len(w) < 2:
            continue
        sets[i] = {f"{w[j - 1]} {w[j]}" for j in range(1, len(w))}
        src[i] = s
    want = {}
    ids = sorted(sets)
    for ai, a in enumerate(ids):
        for b in ids[ai + 1:]:
            if src[a] != src[b]:
                continue
            inter = len(sets[a] & sets[b])
            union = len(sets[a]) + len(sets[b]) - inter
            j = _r6(inter / union)
            if j >= 0.3:
                want[(a, b)] = j
    assert got == want, (docs, got, want)


_LANG_TEXTS = st.lists(
    st.tuples(
        st.sampled_from(["en", "de", "fr", "es"]),
        st.lists(
            st.sampled_from(["the", "der", "le", "el", "de", "und", "a1", ""]),
            min_size=0,
            max_size=8,
        ).map(" ".join),
    ),
    min_size=1,
    max_size=12,
)


@given(docs=_LANG_TEXTS)
@_SETTINGS
def test_lang_id_eval_matches_naive(spark, docs):
    """Language-ID confusion rollup vs the shared _pred_lang replay +
    direct Python counting (the heuristic itself is property-tested in
    test_replay_properties)."""
    import tempfile

    tmp = tempfile.mkdtemp(prefix="replay_lang_")
    rows = [
        (i, t, lg, "src0", len(t)) for i, (lg, t) in enumerate(docs)
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
    got = {
        (r.lang, r.pred_lang): (r.n, r.frac_of_lang)
        for r in _entry("lang_id_eval")(spark, tmp).collect()
    }

    cells: dict = {}
    for lg, t in docs:
        cells[(lg, _pred_lang(t))] = cells.get((lg, _pred_lang(t)), 0) + 1
    tot: dict = {}
    for (lg, _p), n in cells.items():
        tot[lg] = tot.get(lg, 0) + n
    want = {k: (n, _r6(n / tot[k[0]])) for k, n in cells.items()}
    assert got == want, (docs, got, want)
