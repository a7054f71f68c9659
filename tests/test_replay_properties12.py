"""Replay properties batch 12: the LSH candidate-pair evals
(similarity histogram, recall-vs-exact accounting) and the cross-split
leakage audit — the last formula-heavy mirrored-oracle-only batch
entries.  The LSH side re-derives the md5 Rademacher hyperplanes and
sign-bit buckets from their documented recipe in pure Python; the
leakage audit composes the already-replayed minhash pair and
hash-split formulas and checks the unordered-split rollup on top.
"""

from __future__ import annotations

import hashlib
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from replay_profile import replay_settings

from test_replay_properties import _entry, _r6, _write_documents
from test_replay_properties3 import _cos, _write_embeddings
from test_replay_properties4 import _bucket
from test_replay_properties5 import _dedup_docs, _perdoc, _verified_pairs

_SETTINGS = replay_settings(10)


def _lsh_planes(n_tables=4, n_planes=8, dim=64):
    """operators/similarity.py:lsh_planes — md5 Rademacher +-1 planes,
    re-derived from the documented recipe (not imported)."""
    tables = []
    for t in range(n_tables):
        planes = []
        for p in range(n_planes):
            bits = hashlib.md5(f"lshplane-{t}-{p}".encode()).digest() * (
                (dim + 127) // 128 + 1
            )
            planes.append(
                [1.0 if (bits[i // 8] >> (i % 8)) & 1 else -1.0 for i in range(dim)]
            )
        tables.append(planes)
    return tables


def _lsh_buckets(vec):
    """(table_idx -> bucket int) for one 64-dim vector: sign bit per
    plane packed little-endian.  Components are k/8 and planes are +-1,
    so every dot is an exact binary fraction — no sign ambiguity."""
    out = {}
    for t, planes in enumerate(_PLANES):
        b = 0
        for j, plane in enumerate(planes):
            dot = 0.0
            for x, y in zip(vec, plane):
                dot += x * y
            if dot > 0:
                b |= 1 << j
        out[t] = b
    return out


_PLANES = _lsh_planes()

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
def test_lsh_histogram_and_recall_eval_match_python(spark, vecs):
    """embedding_similarity_histogram and embedding_lsh_recall_eval vs
    a from-scratch Python LSH: md5 hyperplanes, sign buckets, candidate
    pairs, exact cosines, 0.05 bins (NULL cosine from a zero-norm
    vector lands in the top bin via least()'s null-skipping), and the
    recall ratio against the cos>=0.4 ground truth."""
    tmp = _write_embeddings(spark, vecs)

    buckets = {i: _lsh_buckets(v) for i, (_lab, v) in enumerate(vecs)}
    cand = set()
    ids = sorted(buckets)
    for xi in range(len(ids)):
        for yi in range(xi + 1, len(ids)):
            a, b = ids[xi], ids[yi]
            if any(buckets[a][t] == buckets[b][t] for t in range(4)):
                cand.add((a, b))

    # --- embedding_similarity_histogram
    got = {
        r.bin: (r.cos_lo, r.n_pairs)
        for r in _entry("embedding_similarity_histogram")(spark, tmp).collect()
    }
    hist: dict = {}
    for a, b in cand:
        c = _cos(vecs[a][1], vecs[b][1])
        bn = 19 if c is None else min(math.floor(c / 0.05), 19)
        hist[bn] = hist.get(bn, 0) + 1
    want = {bn: (_r6(bn * 0.05), n) for bn, n in hist.items()}
    assert got == want, (got, want)

    # --- embedding_lsh_recall_eval
    row = _entry("embedding_lsh_recall_eval")(spark, tmp).collect()[0]
    exact = set()
    for xi in range(len(ids)):
        for yi in range(xi + 1, len(ids)):
            c = _cos(vecs[ids[xi]][1], vecs[ids[yi]][1])
            if c is not None and c >= 0.4:
                exact.add((ids[xi], ids[yi]))
    n_found = len(exact & cand)
    assert row.n_exact_pairs == len(exact)
    assert row.n_found == n_found
    assert abs(row.recall - _r6(n_found / max(len(exact), 1))) <= 1.1e-6


@given(docs=_dedup_docs)
@_SETTINGS
def test_split_leakage_audit_matches_hashlib(spark, docs):
    """Cross-split contamination rollup vs the composed replays: the
    minhash verified-pair formula (batch 5) x the md5 hash-split
    bucket (batch 4), grouped per unordered split pair with string
    least/greatest ('test' < 'train' < 'val')."""
    tmp = _write_documents(spark, docs)
    got = {
        (r.split_lo, r.split_hi): r.n_pairs
        for r in _entry("split_leakage_audit")(spark, tmp).collect()
    }
    perdoc = _perdoc([t for _s, t in docs])
    pairs = _verified_pairs(perdoc)

    def split(i):
        b = _bucket(i)
        return "train" if b < 80 else "val" if b < 90 else "test"

    cells: dict = {}
    for a, b in pairs:
        sa, sb = split(a), split(b)
        k = (min(sa, sb), max(sa, sb))
        cells[k] = cells.get(k, 0) + 1
    assert got == cells, (got, cells)
