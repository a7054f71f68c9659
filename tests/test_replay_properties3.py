"""Independent replay properties for the embedding-column entry family
(previously mirrored-oracle-only; see tests/test_replay_properties.py
for the rationale).

Fixture vectors use values k/64 with small integer k, exact in float32
AND float64, so the float32 storage cast introduces no rounding and the
Python replays can follow the operators' double arithmetic exactly
(sequential folds) or within 1e-6 (GEMM paths, compared tolerantly).
"""

from __future__ import annotations

import math
import tempfile

import numpy as np
from hypothesis import HealthCheck, assume, given, settings
from hypothesis import strategies as st

from replay_profile import replay_settings

from test_replay_properties import _entry, _r6

_SETTINGS = replay_settings(10)


def _write_embeddings(spark, vecs):
    """vecs: list of (label, [float components] | None)."""
    tmp = tempfile.mkdtemp(prefix="replay_emb_")
    rows = [
        (i, None if v is None else [float(x) for x in v], lab)
        for i, (lab, v) in enumerate(vecs)
    ]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/embeddings.parquet")
    return tmp


_comp = st.integers(-64, 64).map(lambda k: k / 64.0)

_vecs8 = st.lists(
    st.tuples(
        st.integers(0, 2),
        st.one_of(st.none(), st.lists(_comp, min_size=8, max_size=8)),
    ),
    min_size=1,
    max_size=16,
).filter(lambda vs: any(v is not None for _l, v in vs))


def _dense(vecs):
    """(vec_id, label, vector) for non-NULL rows — the _embeddings filter."""
    return [(i, lab, v) for i, (lab, v) in enumerate(vecs) if v is not None]


def _cos(a, b):
    """COS_SQL's sequential double fold: same op order as the JVM."""
    dot = 0.0
    for x, y in zip(a, b):
        dot += x * y
    na = 0.0
    for x in a:
        na += x * x
    nb = 0.0
    for y in b:
        nb += y * y
    den = math.sqrt(na) * math.sqrt(nb)
    if den == 0.0:
        return None
    return _r6(dot / den)


@given(vecs=_vecs8)
@_SETTINGS
def test_embedding_dim_stats_matches_naive(spark, vecs):
    """Per-dimension moments vs direct Python over the same rows.
    stddev uses a different (merge-form) accumulation in Spark, so it
    is compared within 1e-5; count/min/max/mean are tight."""
    got = {
        r.dim: (r.n_vecs, r.mean_v, r.std_v, r.min_v, r.max_v)
        for r in _entry("embedding_dim_stats")(
            spark, _write_embeddings(spark, vecs)
        ).collect()
    }
    dense = _dense(vecs)
    n = len(dense)
    assert set(got) == set(range(1, 9))
    for d in range(8):
        col = [v[d] for _i, _l, v in dense]
        mean = sum(col) / n
        gn, gmean, gstd, gmin, gmax = got[d + 1]
        assert gn == n
        assert abs(gmean - _r6(mean)) <= 1.1e-6
        assert gmin == _r6(min(col)) and gmax == _r6(max(col))
        if n == 1:
            assert gstd is None
        else:
            std = math.sqrt(sum((x - mean) ** 2 for x in col) / (n - 1))
            assert gstd is not None and abs(gstd - std) <= 1e-5


@given(vecs=_vecs8)
@_SETTINGS
def test_embedding_quantize_matches_naive(spark, vecs):
    """Symmetric int8 max-abs quantization vs exact Python replay of
    floor(x*scale + 0.5)."""
    got = {
        r.vec_id: (r.scale, list(r.q))
        for r in _entry("embedding_quantize")(
            spark, _write_embeddings(spark, vecs)
        ).collect()
    }
    want = {}
    for i, _lab, v in _dense(vecs):
        scale = 127.0 / max(max(abs(x) for x in v), 1e-12)
        want[i] = (_r6(scale), [math.floor(x * scale + 0.5) for x in v])
    assert set(got) == set(want), (vecs, got, want)
    for i, (sc, q) in want.items():
        assert abs(got[i][0] - sc) <= 1.1e-6 and got[i][1] == q, (i, got[i], (sc, q))


@given(vecs=_vecs8)
@_SETTINGS
def test_embedding_norm_outliers_matches_naive(spark, vecs):
    """3-sigma L2-norm screen vs a Python replay of the documented
    integer-micro moment math."""
    got = {
        r.vec_id: (r.label, r.l2, r.norm_z)
        for r in _entry("embedding_norm_outliers")(
            spark, _write_embeddings(spark, vecs)
        ).collect()
    }
    dense = _dense(vecs)
    l2s = {}
    for i, lab, v in dense:
        acc = 0.0
        for x in v:
            acc += x * x
        l2s[i] = (lab, _r6(math.sqrt(acc)))
    cnt = len(dense)
    s1 = sum(round(l2 * 1e6) for _lab, l2 in l2s.values())
    s2 = sum(round(l2 * 1e6) ** 2 for _lab, l2 in l2s.values())
    mean = s1 / 1e6 / cnt
    var = None
    if cnt > 1:
        var = (s2 / 1e12 - (s1 / 1e6) * (s1 / 1e6) / cnt) / (cnt - 1)
    want = {}
    for i, (lab, l2) in l2s.items():
        if var is None or var <= 0:
            continue  # NULL z -> filtered out
        z = (l2 - mean) / math.sqrt(var)
        if abs(z) > 3:
            want[i] = (lab, l2, _r6(z))
    # boundary guard: only compare flags when no z sits within 1e-6 of 3
    assert set(got) == set(want), (vecs, got, want)
    for i, (lab, l2, z) in want.items():
        assert got[i][0] == lab and got[i][1] == l2
        assert abs(got[i][2] - z) <= 1.1e-6


@given(vecs=_vecs8)
@_SETTINGS
def test_ann_cosine_topk_matches_naive(spark, vecs):
    """Brute-force top-5 vs a Python replay with the same sequential
    cosine fold and (cos desc, id asc, NULL-cos last) ranking."""
    got = {
        (r.query_id, r.rnk): (r.neighbor_id, r.cos)
        for r in _entry("ann_cosine_topk")(
            spark, _write_embeddings(spark, vecs)
        ).collect()
    }
    dense = _dense(vecs)
    vmap = {i: v for i, _l, v in dense}
    want = {}
    for q in [i for i in vmap if i < 10]:
        scored = [(n, _cos(vmap[n], vmap[q])) for n in vmap if n != q]
        nn = sorted(
            [(n, c) for n, c in scored if c is not None],
            key=lambda t: (-t[1], t[0]),
        ) + sorted([(n, c) for n, c in scored if c is None])
        for r, (n, c) in enumerate(nn[:5]):
            want[(q, r + 1)] = (n, c)
    assert got == want, (vecs, got, want)


@given(vecs=_vecs8)
@_SETTINGS
def test_embedding_neardup_matches_naive(spark, vecs):
    """Blocked-GEMM all-pairs cosine >= 0.4 vs naive Python all-pairs;
    pairs within 2e-6 of the threshold are exempt from the set
    comparison (GEMM vs fold float paths may disagree at 6dp there)."""
    got = {
        (r.id_a, r.id_b): r.cos
        for r in _entry("embedding_neardup")(
            spark, _write_embeddings(spark, vecs)
        ).collect()
    }
    vmap = {i: v for i, _l, v in _dense(vecs)}
    ids = sorted(vmap)
    want = {}
    for ai, a in enumerate(ids):
        for b in ids[ai + 1:]:
            c = _cos(vmap[a], vmap[b])
            if c is not None and c >= 0.4:
                want[(a, b)] = c
    for k in set(got) | set(want):
        in_g, in_w = k in got, k in want
        if in_g and in_w:
            assert abs(got[k] - want[k]) <= 2e-6, (k, got[k], want[k])
        elif in_w:
            assert abs(want[k] - 0.4) <= 2e-6, (k, "missing", want[k])
        else:
            assert abs(got[k] - 0.4) <= 2e-6, (k, "extra", got[k])


def _centroids(dense):
    """label -> rounded centroid, replaying avg in row order then _r6."""
    by_lab: dict = {}
    for _i, lab, v in dense:
        by_lab.setdefault(lab, []).append(v)
    cents = {}
    for lab, vs in by_lab.items():
        cents[lab] = [
            _r6(sum(v[d] for v in vs) / len(vs)) for d in range(len(vs[0]))
        ]
    return cents


def _sqdist(v, c):
    acc = 0.0
    for x, y in zip(v, c):
        acc += (x - y) * (x - y)
    return _r6(acc)


@given(vecs=_vecs8)
@_SETTINGS
def test_label_centroid_scatter_matches_naive(spark, vecs):
    """Per-label centroid scatter stats vs direct Python replay
    (rounded centroids, sequential squared-distance folds, exact
    integer-micro mean)."""
    got = {
        r.label: (r.n_vecs, r.avg_sqdist, r.min_sqdist, r.max_sqdist)
        for r in _entry("label_centroid_scatter")(
            spark, _write_embeddings(spark, vecs)
        ).collect()
    }
    dense = _dense(vecs)
    cents = _centroids(dense)
    want = {}
    for lab, c in cents.items():
        sqs = [_sqdist(v, c) for _i, l2, v in dense if l2 == lab]
        n = len(sqs)
        avg = _r6(sum(round(s * 1e6) for s in sqs) / 1e6 / n)
        want[lab] = (n, avg, min(sqs), max(sqs))
    assert set(got) == set(want), (vecs, got, want)
    for lab, (n, avg, mn, mx) in want.items():
        gn, gavg, gmn, gmx = got[lab]
        assert gn == n and abs(gavg - avg) <= 1.1e-6
        assert abs(gmn - mn) <= 1.1e-6 and abs(gmx - mx) <= 1.1e-6


@given(vecs=_vecs8)
@_SETTINGS
def test_embedding_confusion_matches_naive(spark, vecs):
    """Closer-to-another-centroid confusion counts vs direct Python
    replay with the same (micro-rounded distance, label) argmin key."""
    got = {
        (r.label, r.nearest_other): r.n_confused
        for r in _entry("embedding_confusion")(
            spark, _write_embeddings(spark, vecs)
        ).collect()
    }
    dense = _dense(vecs)
    cents = _centroids(dense)
    counts: dict = {}
    for _i, lab, v in dense:
        if lab not in cents or len(cents) < 2:
            continue
        own = _sqdist(v, cents[lab])
        others = [
            (round(_sqdist(v, c) * 1e6), clab, _sqdist(v, c))
            for clab, c in cents.items()
            if clab != lab
        ]
        others.sort()
        nearest, other_sq = others[0][1], min(o[2] for o in others)
        if other_sq < own:
            counts[(lab, nearest)] = counts.get((lab, nearest), 0) + 1
    assert got == counts, (vecs, got, counts)


# --------------------------------------------------------------------------
# PCA: gram plumbing exact + direction against numpy eigendecomposition
# --------------------------------------------------------------------------

_pca_cases = st.tuples(
    st.lists(st.integers(1, 4), min_size=64, max_size=64),       # direction d
    st.lists(
        st.tuples(
            st.integers(1, 5),                                   # coefficient
            st.integers(0, 63),                                  # noise dim
            st.integers(-2, 2),                                  # noise k/64
        ),
        min_size=3,
        max_size=10,
    ),
)


@given(case=_pca_cases)
@_SETTINGS
def test_pca_top_component_matches_numpy(spark, case):
    """top_component vs numpy: (1) the distributed integer gram equals
    a single-process numpy replay bit-for-bit; (2) the power-iteration
    direction matches numpy's top eigenvector of that gram within 1%
    when the eigengap is healthy (rank-1-dominant corpus)."""
    from trainee_scala_module_8_kafka_streaming_etl_pipeline_spark.operators import (
        linalg,
    )

    d, specs = case
    dvec = np.array(d, dtype=np.float64) / 8.0
    vecs = []
    for coef, nd, nk in specs:
        v = coef * dvec / 4.0
        v[nd] += nk / 64.0
        vecs.append((0, [float(x) for x in v]))
    tmp = _write_embeddings(spark, vecs)

    # (1) exact integer gram equality: distributed partial sums == numpy
    from trainee_scala_module_8_kafka_streaming_etl_pipeline_spark.catalog import load
    import pyspark.sql.functions as F

    emb = load(spark, tmp, "embeddings").filter(F.col("embedding").isNotNull())
    got_cells = {
        (r.i, r.j): r.s for r in linalg.gram_cells(emb).collect()
    }
    X = np.stack([np.array(v, dtype=np.float32).astype(np.float64) for _l, v in vecs])
    A = np.trunc((X[:, :, None] * X[:, None, :]) * linalg.SCALE).astype(np.int64).sum(
        axis=0
    )
    want_cells = {
        (i + 1, j + 1): int(A[i, j]) for i in range(64) for j in range(64)
    }
    assert got_cells == want_cells

    # (2) direction vs numpy eigh, given a healthy eigengap
    evals, evecs = np.linalg.eigh(A.astype(np.float64))
    lam = evals[-1]
    assume(lam > 0 and (len(evals) < 2 or evals[-2] <= lam / 5))
    e = evecs[:, -1]
    e = e / np.max(np.abs(e))
    comp = np.array(
        [
            r.component
            for r in _entry("pca_top_component")(spark, tmp)
            .orderBy("dim")
            .collect()
        ]
    )
    if float(np.dot(e, comp)) < 0:
        e = -e
    assert np.max(np.abs(comp - e)) <= 0.01, (comp, e)
