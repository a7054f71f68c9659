"""Replay properties batch 14: ann_ivf_pq_topk — the last
non-streaming mirrored-oracle-only entry.  The full IVF-PQ pipeline is
replayed in pure Python integer arithmetic: stride centroids, max-cos
assignment, 2-probe candidate generation, stride codewords, per-
subspace micro-unit code assignment, asymmetric distance tables, and
the (admic, neighbor) ranking.  Corpora are md5-derived 64-dim vectors
(n up to 130 so several centroids and codewords actually exist — the
tiny fixtures other batches use would degenerate to one of each).
"""

from __future__ import annotations

import hashlib
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from replay_profile import replay_settings

from test_replay_properties import _entry
from test_replay_properties3 import _write_embeddings

_SETTINGS = replay_settings(8)

_STRIDE, _NPROBE, _NQ, _K = 50, 2, 10, 5
_SUBS, _DSUB, _CODES, _CW_STRIDE = 8, 8, 8, 25


def _vec(salt: str, i: int):
    """64 components in eighths, md5-derived: k/8 with k in [-8, 7]."""
    out = []
    for blk in range(4):
        d = hashlib.md5(f"{salt}-{i}-{blk}".encode()).digest()
        out.extend(((b % 16) - 8) / 8.0 for b in d)
    return out


def _cos(a, b):
    dot = na = nb = 0.0
    for x, y in zip(a, b):
        dot += x * y
        na += x * x
        nb += y * y
    den = math.sqrt(na) * math.sqrt(nb)
    return None if den == 0.0 else dot / den


def _micro(a, b, s):
    """Integer micro-unit subspace distance: components are eighths, so
    sum((x-y)^2) = m/64 exactly and m/64 * 1e6 = m * 15625."""
    m = 0
    for d in range(s * _DSUB, s * _DSUB + _DSUB):
        diff = round((a[d] - b[d]) * 8)
        m += diff * diff
    return m * 15625


_case = st.tuples(st.text("abcdef", min_size=1, max_size=6), st.integers(26, 130))


@given(case=_case)
@_SETTINGS
def test_ann_ivf_pq_topk_matches_python(spark, case):
    salt, n = case
    vecs = [(0, _vec(salt, i)) for i in range(n)]
    tmp = _write_embeddings(spark, vecs)
    got = {
        (r.query_id, r.rnk): (r.neighbor_id, r.approx_d2)
        for r in _entry("ann_ivf_pq_topk")(spark, tmp).collect()
    }

    V = [v for _lab, v in vecs]
    cents = [i for i in range(n) if i % _STRIDE == 0]
    assigned = {
        i: max(cents, key=lambda c: (_cos(V[i], V[c]), -c)) for i in range(n)
    }
    cws = {
        i // _CW_STRIDE: V[i]
        for i in range(n)
        if i % _CW_STRIDE == 0 and i < _CODES * _CW_STRIDE
    }
    codes = {
        i: [
            min(cws, key=lambda c: (_micro(V[i], cws[c], s), c))
            for s in range(_SUBS)
        ]
        for i in range(n)
    }
    want = {}
    for q in range(min(_NQ, n)):
        probes = sorted(cents, key=lambda c: (-_cos(V[q], V[c]), c))[:_NPROBE]
        cand = [i for i in range(n) if assigned[i] in probes and i != q]
        scored = sorted(
            (
                sum(_micro(V[q], cws[codes[i][s]], s) for s in range(_SUBS)),
                i,
            )
            for i in cand
        )
        for rnk, (admic, i) in enumerate(scored[:_K], start=1):
            want[(q, rnk)] = (i, admic / 1e6)
    assert set(got) == set(want), (salt, n, got, want)
    for k2, (i, d2) in want.items():
        assert got[k2][0] == i and abs(got[k2][1] - d2) <= 1e-9, (k2, got[k2], i, d2)
