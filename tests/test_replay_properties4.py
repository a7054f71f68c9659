"""Replay properties for the deterministic-hash sampling family, the
sketch/recall eval rollups, and contrastive mining (previously
mirrored-oracle-only; rationale in tests/test_replay_properties.py).

The md5 entries are replayed with hashlib — genuinely independent of
both engines' md5/conv SQL plumbing.
"""

from __future__ import annotations

import datetime as dt
import hashlib
import math
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from replay_profile import replay_settings

from test_replay_properties import (
    _entry,
    _r6,
    _write_events,
)
from test_replay_properties3 import _cos, _vecs8, _dense, _write_embeddings

_SETTINGS = replay_settings(10)

_BASE = dt.datetime(2024, 1, 1)


def _md5hex(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _bucket(key) -> int:
    """operators/sampling.py:hash_bucket — 60-bit md5 prefix mod 100."""
    return int(_md5hex(str(key))[:15], 16) % 100


def _write_docs_src(spark, docs):
    """docs: (source_name, text) with arbitrary source strings."""
    tmp = tempfile.mkdtemp(prefix="replay_srcdoc_")
    rows = [(i, t, "en", s, len(t)) for i, (s, t) in enumerate(docs)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
    return tmp


_docs_plain = st.lists(
    st.tuples(st.sampled_from(["srcA", "src3", "src12", "s"]), st.text("ab ", max_size=6)),
    min_size=1,
    max_size=25,
)


@given(docs=_docs_plain)
@_SETTINGS
def test_hash_split_matches_hashlib(spark, docs):
    """Train/val/test assignment vs a hashlib md5 replay — catches any
    drift in the conv/substr bucket plumbing on BOTH engines at once."""
    tmp = _write_docs_src(spark, docs)
    got = {
        r.doc_id: (r.bucket, r.split)
        for r in _entry("hash_split")(spark, tmp).collect()
    }
    want = {}
    for i in range(len(docs)):
        b = _bucket(i)
        want[i] = (b, "train" if b < 80 else "val" if b < 90 else "test")
    assert got == want, (got, want)


@given(docs=_docs_plain)
@_SETTINGS
def test_source_mixture_matches_hashlib(spark, docs):
    """Deterministic mixture keep-counts vs hashlib buckets + a Python
    replay of the suffix-derived keep rate (incl. the digit-less
    fallback)."""
    tmp = _write_docs_src(spark, docs)
    got = {
        (r.source, r.keep_pct): (r.n_total, r.n_kept)
        for r in _entry("source_mixture")(spark, tmp).collect()
    }
    want: dict = {}
    for i, (src, _t) in enumerate(docs):
        sfx = src[3:13]
        rate = 20 + 4 * (int(sfx) % 15 if sfx.isdigit() and sfx else 0)
        n, k = want.get((src, rate), (0, 0))
        want[(src, rate)] = (n + 1, k + (1 if _bucket(i) < rate else 0))
    assert got == want, (docs, got, want)


@given(docs=_docs_plain)
@_SETTINGS
def test_stratified_and_per_group_sample_match_hashlib(spark, docs):
    """Quota sampling ranks vs hashlib md5 ordering: stratified_sample
    (rank by md5, quota 20), its quantile-sliced twin
    stratified_sample_scaled (round 10), and per_group_sample (rank by
    md5 then id, quota 3) — same fixture, one lang stratum."""
    tmp = _write_docs_src(spark, docs)
    got_s = {
        r.doc_id: r.sample_rank
        for r in _entry("stratified_sample")(spark, tmp).collect()
    }
    got_p = {
        r.doc_id: r.rk for r in _entry("per_group_sample")(spark, tmp).collect()
    }
    got_s2 = {
        r.doc_id: r.sample_rank
        for r in _entry("stratified_sample_scaled")(spark, tmp).collect()
    }
    got_p2 = {
        r.doc_id: r.rk
        for r in _entry("per_group_sample_scaled")(spark, tmp).collect()
    }
    order = sorted(range(len(docs)), key=lambda i: (_md5hex(str(i)), i))
    want_s = {i: r + 1 for r, i in enumerate(order) if r < 20}
    want_p = {i: r + 1 for r, i in enumerate(order) if r < 3}
    assert got_s == want_s, (got_s, want_s)
    assert got_s2 == want_s, (got_s2, want_s)
    assert got_p == want_p, (got_p, want_p)
    assert got_p2 == want_p, (got_p2, want_p)


# --------------------------------------------------------------------------
# sketch-accuracy eval
# --------------------------------------------------------------------------

_ev_rows = st.lists(
    st.tuples(
        st.integers(0, 2),
        st.integers(0, 3600),
        st.sampled_from(["view", "click"]),
        st.one_of(st.none(), st.integers(0, 200)),
    ),
    min_size=1,
    max_size=30,
)


@given(raw=_ev_rows)
@_SETTINGS
def test_quantile_sketch_eval_matches_naive(spark, raw):
    """Histogram-sketch quantile estimates AND their exact-percentile
    errors vs direct Python replays of both sides (width-5 bins,
    within-bin interpolation at rank ceil(q*n); Spark percentile's
    exact interpolation for the reference)."""
    rows = [
        (i, _BASE + dt.timedelta(seconds=s), u, t, None if v is None else v * 0.5)
        for i, (u, s, t, v) in enumerate(raw)
    ]
    if not any(v is not None for *_x, v in rows):
        return
    got = {
        r.event_type: (r.p50_exact, r.p50_abs_err, r.p90_exact, r.p90_abs_err,
                       r.within_one_bin)
        for r in _entry("quantile_sketch_eval")(
            spark, _write_events(spark, rows)
        ).collect()
    }

    def pctl(sorted_vals, p):
        n = len(sorted_vals)
        pos = p * (n - 1)
        lo, hi = math.floor(pos), math.ceil(pos)
        if lo == hi:
            return sorted_vals[lo]
        return sorted_vals[lo] * (hi - pos) + sorted_vals[hi] * (pos - lo)

    def est(vals, q):
        bins: dict = {}
        for v in vals:
            bins[math.floor(v / 5.0)] = bins.get(math.floor(v / 5.0), 0) + 1
        n = len(vals)
        r = math.ceil(q * n)
        cum = 0
        for b in sorted(bins):
            c = bins[b]
            if cum + c >= r and cum < r:
                return b * 5.0 + 5.0 * (r - cum) / c
            cum += c
        raise AssertionError("rank not found")

    by_type: dict = {}
    for _i, _ts, _u, t, v in rows:
        if v is not None:
            by_type.setdefault(t, []).append(v)
    want = {}
    for t, vals in by_type.items():
        vals.sort()
        p50x, p90x = _r6(pctl(vals, 0.5)), _r6(pctl(vals, 0.9))
        p50s, p90s = _r6(est(vals, 0.5)), _r6(est(vals, 0.9))
        e50, e90 = abs(p50s - p50x), abs(p90s - p90x)
        want[t] = (p50x, e50, p90x, e90)
    assert set(got) == set(want), (raw, got, want)
    for t, (p50x, e50, p90x, e90) in want.items():
        g = got[t]
        assert abs(g[0] - p50x) <= 1.1e-6 and abs(g[2] - p90x) <= 1.1e-6
        assert abs(g[1] - e50) <= 2.2e-6 and abs(g[3] - e90) <= 2.2e-6
        assert g[4] == (e50 <= 5.0 + 1e-9 and e90 <= 5.0 + 1e-9) or (
            abs(e50 - 5.0) <= 1e-6 or abs(e90 - 5.0) <= 1e-6
        )


# --------------------------------------------------------------------------
# contrastive mining + recall-eval rollup
# --------------------------------------------------------------------------


@given(vecs=_vecs8)
@_SETTINGS
def test_hard_negative_mining_matches_naive(spark, vecs):
    """Top-3 positives/negatives per anchor vs a Python replay with the
    same sequential cosine fold and per-(anchor, label_match) ranking."""
    got = {
        (r.query_id, r.label_match, r.rnk): (r.neighbor_id, r.cos)
        for r in _entry("hard_negative_mining")(
            spark, _write_embeddings(spark, vecs)
        ).collect()
    }
    dense = _dense(vecs)
    vmap = {i: (lab, v) for i, lab, v in dense}
    want = {}
    for q in [i for i in vmap if i < 10]:
        qlab, qv = vmap[q]
        for match in (True, False):
            scored = [
                (n, _cos(v, qv))
                for n, (lab, v) in vmap.items()
                if n != q and (lab == qlab) == match
            ]
            nn = sorted(
                [(n, c) for n, c in scored if c is not None],
                key=lambda t: (-t[1], t[0]),
            ) + sorted([(n, c) for n, c in scored if c is None])
            for r, (n, c) in enumerate(nn[:3]):
                want[(q, match, r + 1)] = (n, c)
    assert got == want, (vecs, got, want)


_vecs64 = st.lists(
    st.tuples(
        st.integers(0, 2),
        st.lists(
            st.integers(-8, 8).map(lambda k: k / 8.0), min_size=64, max_size=64
        ),
    ),
    min_size=2,
    max_size=12,
)


@given(vecs=_vecs64)
@_SETTINGS
def test_ann_recall_eval_rollup_matches_python(spark, vecs):
    """The recall@5 rollup vs a Python set-intersection over the two
    component entries' own outputs — verifies the eval join/count
    independently of how the indexes are built.  64-dim vectors: the
    LSH hyperplane table is generated at the corpus dim."""
    tmp = _write_embeddings(spark, vecs)
    exact = {}
    for r in _entry("ann_cosine_topk")(spark, tmp).collect():
        exact.setdefault(r.query_id, set()).add(r.neighbor_id)
    approx = {}
    for r in _entry("ann_lsh_topk")(spark, tmp).collect():
        approx.setdefault(r.query_id, set()).add(r.neighbor_id)
    got = {
        r.query_id: (r.n_hits, r.recall_at_5)
        for r in _entry("ann_recall_eval")(spark, tmp).collect()
    }
    want = {
        q: (len(ns & approx.get(q, set())), _r6(len(ns & approx.get(q, set())) / 5.0))
        for q, ns in exact.items()
    }
    assert got == want, (got, want)
