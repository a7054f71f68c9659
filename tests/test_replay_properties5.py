"""Independent replay of the MinHash-LSH dedup family — the flagship
near-dup pipeline and everything derived from its cluster labels.

Everything here is recomputed from scratch with hashlib/pure Python:
shingle md5 hashes, the (a,b) minhash constants (re-derived from their
documented md5 recipe, not imported), band buckets, the signature
prefilter, exact set Jaccard, BFS connected components, and the
md5 cluster-id split.  A formula bug shared by the Spark operators and
their mirrored DuckDB oracles (which inline the same SQL fragments)
breaks these tests even while the driver hash stays green.
"""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from replay_profile import replay_settings

from test_replay_properties import _entry, _r6, _write_documents
from test_replay_properties import _quality
from test_replay_properties2 import _norm
from test_replay_properties4 import _bucket

_SETTINGS = replay_settings(10)

# the documented minhash constant recipe (operators/dedup.py docstring):
# per function i, a = (md5("minhash-a-i")[:8] big-endian % 2^31) | 1,
#                b =  md5("minhash-b-i")[:8] big-endian % 2^31
_AB = []
for _i in range(32):
    _da = int.from_bytes(hashlib.md5(f"minhash-a-{_i}".encode()).digest()[:8], "big")
    _db = int.from_bytes(hashlib.md5(f"minhash-b-{_i}".encode()).digest()[:8], "big")
    _AB.append(((_da % (1 << 31)) | 1, _db % (1 << 31)))

_P = 2147483647
_HASH_MOD = 1 << 30


def _perdoc(texts):
    """doc_id -> (32 minhashes, distinct 60-bit shingle-hash set)."""
    out = {}
    for i, t in enumerate(texts):
        n = _norm(t)
        if len(n) < 5:
            continue
        h60s = [
            int(hashlib.md5(n[j : j + 5].encode()).hexdigest()[:15], 16)
            for j in range(len(n) - 4)
        ]
        mhs = [
            min((a * (h % _HASH_MOD) + b) % _P for h in h60s) for a, b in _AB
        ]
        out[i] = (mhs, set(h60s))
    return out


def _band_candidates(perdoc):
    buckets: dict = {}
    for i, (mhs, _hs) in perdoc.items():
        for bi in range(8):
            buckets.setdefault((bi, tuple(mhs[bi * 4 : bi * 4 + 4])), []).append(i)
    cands = set()
    for docs in buckets.values():
        docs.sort()
        for x in range(len(docs)):
            for y in range(x + 1, len(docs)):
                cands.add((docs[x], docs[y]))
    return cands


def _verified_pairs(perdoc, threshold=0.8):
    out = {}
    for a, b in _band_candidates(perdoc):
        mha, ha = perdoc[a]
        mhb, hb = perdoc[b]
        if sum(1 for x, y in zip(mha, mhb) if x == y) < 18:
            continue
        inter = len(ha & hb)
        j = _r6(inter / (len(ha) + len(hb) - inter))
        if j >= threshold:
            out[(a, b)] = j
    return out


def _components(n_docs, pairs):
    """doc_id -> min reachable doc_id over the pair graph (BFS)."""
    adj: dict = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    label = {}
    for i in range(n_docs):
        if i in label:
            continue
        comp, stack = [], [i]
        seen = {i}
        while stack:
            x = stack.pop()
            comp.append(x)
            for y in adj.get(x, ()):
                if y not in seen:
                    seen.add(y)
                    stack.append(y)
        m = min(comp)
        for x in comp:
            label[x] = m
    return label


# near-dup-rich corpus: a few bases, docs = base + tiny suffix
_dedup_docs = st.tuples(
    st.lists(st.text("ab ", min_size=0, max_size=14), min_size=1, max_size=4),
    st.lists(
        st.tuples(st.integers(0, 3), st.sampled_from(["", "a", " b", "ab"])),
        min_size=1,
        max_size=10,
    ),
).map(
    lambda t: [(0, t[0][bi % len(t[0])] + sfx) for bi, sfx in t[1]]
)


@given(docs=_dedup_docs)
@_SETTINGS
def test_minhash_near_dups_matches_hashlib(spark, docs):
    """verified_near_dups vs a from-scratch Python replay of every
    stage: md5 shingle hashes, re-derived minhash constants, 8x4
    banding, the >=18/32 signature prefilter, exact set Jaccard."""
    tmp = _write_documents(spark, docs)
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in _entry("minhash_near_dups")(spark, tmp).collect()
    }
    want = _verified_pairs(_perdoc([t for _s, t in docs]))
    assert got == want, (docs, got, want)


@given(docs=_dedup_docs)
@_SETTINGS
def test_containment_near_dups_matches_hashlib(spark, docs):
    """containment_near_dups vs the Python replay: same banded
    candidates (no prefilter), containment = |A∩B| / min(|A|,|B|)
    >= 0.7."""
    tmp = _write_documents(spark, docs)
    got = {
        (r.doc_a, r.doc_b): r.containment
        for r in _entry("containment_near_dups")(spark, tmp).collect()
    }
    perdoc = _perdoc([t for _s, t in docs])
    want = {}
    for a, b in _band_candidates(perdoc):
        ha, hb = perdoc[a][1], perdoc[b][1]
        c = _r6(len(ha & hb) / min(len(ha), len(hb)))
        if c >= 0.7:
            want[(a, b)] = c
    assert got == want, (docs, got, want)


@given(docs=_dedup_docs)
@_SETTINGS
def test_dedup_cluster_family_matches_replay(spark, docs):
    """The whole cluster-derived family vs one Python replay chain:
    BFS components over the replayed pair graph (dedup_clusters), the
    size histogram, the cluster-id hash split (incl. the structural
    zero-crossing invariant), and best-quality canonicalization."""
    tmp = _write_documents(spark, docs)
    texts = [t for _s, t in docs]
    label = _components(len(docs), _verified_pairs(_perdoc(texts)))

    got_cl = {
        r.doc_id: r.cluster_id
        for r in _entry("dedup_clusters")(spark, tmp).collect()
    }
    assert got_cl == label, (docs, got_cl, label)

    sizes: dict = {}
    for _d, c in label.items():
        sizes[c] = sizes.get(c, 0) + 1
    hist: dict = {}
    for c, sz in sizes.items():
        hist[sz] = hist.get(sz, 0) + 1
    got_h = {
        r.cluster_size: (r.n_clusters, r.n_docs)
        for r in _entry("dedup_cluster_size_histogram")(spark, tmp).collect()
    }
    assert got_h == {sz: (n, sz * n) for sz, n in hist.items()}, (docs, got_h, hist)

    split_of = {
        c: ("train" if _bucket(c) < 80 else "val" if _bucket(c) < 90 else "test")
        for c in sizes
    }
    per: dict = {}
    for d, c in label.items():
        s = split_of[c]
        nd, cl = per.get(s, (0, set()))
        cl = cl | {c}
        per[s] = (nd + 1, cl)
    got_sp = {
        r.split: (r.n_docs, r.n_clusters, r.n_clusters_crossing)
        for r in _entry("cluster_aware_split")(spark, tmp).collect()
    }
    assert got_sp == {
        s: (nd, len(cl), 0) for s, (nd, cl) in per.items()
    }, (docs, got_sp, per)

    got_kb = {
        r.cluster_id: (r.keep_doc_id, r.keep_quality, r.n_members)
        for r in _entry("dedup_keep_best")(spark, tmp).collect()
    }
    want_kb = {}
    for c in sizes:
        members = [d for d, lbl in label.items() if lbl == c]
        best = min(members, key=lambda d: (-_quality(texts[d]), d))
        want_kb[c] = (best, _quality(texts[best]), len(members))
    assert got_kb == want_kb, (docs, got_kb, want_kb)


@given(docs=_dedup_docs)
@_SETTINGS
def test_dedup_exact_matches_hashlib(spark, docs):
    """Byte-exact dup groups vs hashlib md5 of the raw text."""
    tmp = _write_documents(spark, docs)
    got = {
        r.text_hash: (r.keep_id, r.dup_count)
        for r in _entry("dedup_exact")(spark, tmp).collect()
    }
    groups: dict = {}
    for i, (_s, t) in enumerate(docs):
        h = hashlib.md5(t.encode()).hexdigest()
        k, n = groups.get(h, (i, 0))
        groups[h] = (min(k, i), n + 1)
    assert got == groups, (docs, got, groups)
