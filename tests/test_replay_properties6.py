"""Replay properties batch 6: temperature mixture, context-window
chunking, length-drift PSI, semantic decontamination, and the column
profiler (previously mirrored-oracle-only; rationale in
tests/test_replay_properties.py).
"""

from __future__ import annotations

import hashlib
import math
import re
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from replay_profile import replay_settings

from test_replay_properties import _entry, _r6
from test_replay_properties3 import _cos, _write_embeddings
from test_replay_properties4 import _md5hex, _write_docs_src

_SETTINGS = replay_settings(10)


def _r0(x: float) -> float:
    """Spark round(x): HALF_UP at 0 dp on the shortest decimal repr."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(repr(x)).quantize(Decimal("1"), ROUND_HALF_UP))


_docs_srcs = st.lists(
    st.tuples(
        st.sampled_from(["srcA", "src3", "src12"]),
        st.text("ab \n", max_size=12),
    ),
    min_size=1,
    max_size=25,
)


@given(docs=_docs_srcs)
@_SETTINGS
def test_temperature_mixture_matches_hashlib(spark, docs):
    """sqrt-temperature rebalancing vs a hashlib + math.sqrt replay:
    basis-point buckets, target share ∝ sqrt(n_s), 50% budget, clamped
    HALF_UP rate, kept tally."""
    tmp = _write_docs_src(spark, docs)
    got = {
        r.source: (r.n_total, r.rate_bp, r.n_kept)
        for r in _entry("temperature_mixture")(spark, tmp).collect()
    }
    n_s: dict = {}
    for i, (src, _t) in enumerate(docs):
        n_s[src] = n_s.get(src, 0) + 1
    total = sum(n_s.values())
    sum_sqrt = sum(math.sqrt(n) for n in n_s.values())
    want = {}
    for src, n in n_s.items():
        rate = min(
            10000,
            int(_r0(10000.0 * 0.5 * total * math.sqrt(n) / sum_sqrt / n)),
        )
        kept = sum(
            1
            for i, (s, _t) in enumerate(docs)
            if s == src and int(_md5hex(str(i))[:15], 16) % 10000 < rate
        )
        want[src] = (n, rate, kept)
    assert got == want, (docs, got, want)


@given(docs=_docs_srcs)
@_SETTINGS
def test_doc_chunk_split_matches_hashlib(spark, docs):
    """64-token/48-stride window chunking vs a Python replay (token
    split semantics, trailing-fragment emission, md5 span hashes)."""
    tmp = _write_docs_src(spark, docs)
    got = {
        (r.doc_id, r.chunk_idx): (r.chunk_tokens, r.chunk_hash)
        for r in _entry("doc_chunk_split")(spark, tmp).collect()
    }
    want = {}
    for i, (_s, text) in enumerate(docs):
        ws = re.split(r"\s+", text.strip(" "))
        n = len(ws)
        for idx in range((n - 1) // 48 + 1):
            start = idx * 48
            want[(i, idx)] = (
                min(n - start, 64),
                hashlib.md5(" ".join(ws[start : start + 64]).encode()).hexdigest(),
            )
    assert got == want, (docs, got, want)


@given(docs=_docs_srcs)
@_SETTINGS
def test_length_drift_by_source_matches_naive(spark, docs):
    """Doc-length PSI between the id-midpoint halves vs a direct Python
    replay (width-30 bins clamp [0,19], Laplace smoothing)."""
    tmp = _write_docs_src(spark, docs)
    got = {
        r.source: (r.n_ref, r.n_cur, r.psi, r.drifted)
        for r in _entry("length_drift_by_source")(spark, tmp).collect()
    }
    ids = list(range(len(docs)))
    mid = (min(ids) + max(ids)) // 2
    counts: dict = {}
    for i, (src, t) in enumerate(docs):
        period = "ref" if i < mid else "cur"
        b = max(0, min(math.floor(len(t) / 30.0), 19))
        counts[(src, period, b)] = counts.get((src, period, b), 0) + 1
    want = {}
    for g in {s for s, _t in docs}:
        n_ref = sum(c for (s, p, _b), c in counts.items() if s == g and p == "ref")
        n_cur = sum(c for (s, p, _b), c in counts.items() if s == g and p == "cur")
        psi = 0.0
        for b in range(20):
            p_ref = (counts.get((g, "ref", b), 0) + 1) / (n_ref + 20)
            p_cur = (counts.get((g, "cur", b), 0) + 1) / (n_cur + 20)
            psi += (p_cur - p_ref) * math.log(p_cur / p_ref)
        want[g] = (n_ref, n_cur, psi)
    assert set(got) == set(want), (docs, got, want)
    for g, (n_ref, n_cur, psi) in want.items():
        assert got[g][0] == n_ref and got[g][1] == n_cur
        assert abs(got[g][2] - _r6(psi)) <= 1.1e-6
        if abs(psi - 0.1) > 1e-5:
            assert got[g][3] == int(psi >= 0.1)


_vecs8nz = st.lists(
    st.tuples(
        st.integers(0, 2),
        st.lists(
            st.integers(-64, 64).map(lambda k: k / 64.0), min_size=8, max_size=8
        ).map(lambda v: v if any(x != 0.0 for x in v) else [1 / 64.0] + v[1:]),
    ),
    min_size=2,
    max_size=16,
)


@given(vecs=_vecs8nz)
@_SETTINGS
def test_semantic_decontaminate_matches_naive(spark, vecs):
    """Max-benchmark-cosine screen vs a Python replay: bench = ids with
    id % 97 == 3, nearest by (cos, -bench_id), 0.3 contamination flag.
    Vectors are constructed nonzero, so cosines are never NULL."""
    tmp = _write_embeddings(spark, vecs)
    got = {
        r.vec_id: (r.nearest_bench_id, r.max_cos, r.contaminated)
        for r in _entry("semantic_decontaminate")(spark, tmp).collect()
    }
    vmap = {i: v for i, (_l, v) in enumerate(vecs)}
    bench = {i: v for i, v in vmap.items() if i % 97 == 3}
    want = {}
    if bench:
        for i, v in vmap.items():
            if i % 97 == 3:
                continue
            scored = [(_cos(v, bv), -b) for b, bv in bench.items()]
            c, nb = max(scored)
            want[i] = (-nb, c, int(c >= 0.3))
    assert set(got) == set(want), (vecs, got, want)
    for i, (nb, c, flag) in want.items():
        assert got[i][0] == nb and abs(got[i][1] - c) <= 1.1e-6
        if abs(c - 0.3) > 2e-6:
            assert got[i][2] == flag


_profile_orders = st.lists(
    st.tuples(
        st.integers(0, 3),                         # custkey
        st.sampled_from(["O", "F", "P"]),          # status
        st.one_of(st.none(), st.integers(0, 2000)),  # price*0.25 or NULL
        st.sampled_from(["1-URGENT", "5-LOW"]),    # priority
    ),
    min_size=1,
    max_size=20,
)


@given(raw=_profile_orders)
@_SETTINGS
def test_column_profile_matches_naive(spark, raw):
    """Catalog profiler vs direct Python: per-column null counts, exact
    distincts, and string-rendered min/max (incl. NULL columns)."""
    import datetime as dt

    tmp = tempfile.mkdtemp(prefix="replay_prof_")
    rows = [
        (i, c, s, None if p is None else p * 0.25,
         dt.datetime(2024, 1, 1) + dt.timedelta(days=i), pr)
        for i, (c, s, p, pr) in enumerate(raw)
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/orders.parquet")
    got = {
        r.column_name: (r.n_rows, r.n_null, r.n_distinct, r.min_value, r.max_value)
        for r in _entry("column_profile")(spark, tmp).collect()
    }

    n = len(rows)

    def prof(vals, render):
        nn = [v for v in vals if v is not None]
        if not nn:
            return (n, n, 0, None, None)
        return (n, n - len(nn), len(set(nn)), render(min(nn)), render(max(nn)))

    want = {
        "o_custkey": prof([r[1] for r in rows], str),
        "o_orderstatus": prof([r[2] for r in rows], str),
        "o_totalprice": prof([r[3] for r in rows], lambda v: str(_r6(v))),
        "o_orderpriority": prof([r[5] for r in rows], str),
    }
    assert got == want, (raw, got, want)
