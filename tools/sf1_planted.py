"""Planted-truth / replay correctness checks at sf~1 for the registry
entries whose DuckDB oracles are deliberate brute-force ground truths
(all-pairs rescans, iterative CTEs) and therefore cannot run on the
synthesized 10x corpus (VERDICT r8 ask #1).

Three independent verification methods, chosen per entry:

  numpy_replay      — full exact re-computation of the entry's result
                      in numpy/pure Python from the parquet inputs
                      (minhash/simhash/containment signatures, LSH
                      buckets, PQ codes, k-means, PCA, cosine math),
                      compared row-for-row with a small float tolerance
                      (2e-6) ONLY on 6dp-rounded cosine-derived values
                      (summation-order ULP can flip a rounding
                      boundary); ids/counts compare exactly.
  planted_recall    — two-sided pair check where full replay is
                      quadratic: every REPORTED pair's metric is
                      recomputed exactly (precision), and every pair
                      the method is deterministically guaranteed to
                      find (exact duplicates: identical signatures
                      share every band / hamming 0) must be reported
                      (recall on the generator's planted dups).
  replication       — the sf~1 corpus is 10 FK-shifted DISJOINT copies
                      of sf0.1 (tools/scale_gen.py), so graph results
                      derive exactly from the sf0.1 result: counts
                      scale 10x, survivor sets replicate with shifted
                      keys.  The sf0.1 result is itself the same plan
                      that is DuckDB-oracle-green at sf0.01.

Validation protocol: run with --sf /root/testdata/sf0.01 first — there
every entry is oracle-checked, so a replay that matches Spark at
sf0.01 is itself verified before it judges sf~1.

Usage:
  python tools/sf1_planted.py [--sf DIR] [--out FILE] [name ...]
"""

from __future__ import annotations

import hashlib
import json
import math
import os
import re
import sys
from decimal import ROUND_HALF_UP, Decimal

import numpy as np

sys.path.insert(0, "/root/repo")

SF1 = os.environ.get("SCALE_OUT", "/root/repo/.scale/sf1")
SF01 = "/root/testdata/sf0.1"

# --- exact 6dp rounding matching Spark/DuckDB ROUND (half away from zero)


def r6(x: float) -> float:
    if x is None or (isinstance(x, float) and math.isnan(x)):
        return x
    return float(Decimal(x).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP))


def rq(x: float, places: int) -> float:
    q = Decimal(1).scaleb(-places)
    return float(Decimal(x).quantize(q, rounding=ROUND_HALF_UP))


# --- text substrate (mirrors operators/dedup.py NORM_SQL + md5 hashing)

_NORM_RE = re.compile(r"[^a-z0-9]+")


def norm_text(t: str) -> str:
    return _NORM_RE.sub(" ", t.lower()).strip()


def h60_str(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


SHINGLE_LEN = 5
HASH_MOD = 1 << 30
MINHASH_P = 2147483647
N_HASHES = 32
N_BANDS = 8
BAND_ROWS = 4
EST_CUTOFF = 18
JACCARD_THRESHOLD = 0.8
CONTAINMENT_THRESHOLD = 0.7
SIMHASH_BITS = 60
SIMHASH_CHUNKS = 4
SIMHASH_MAX_HAMMING = 3


def _ab_pairs(n=N_HASHES):
    pairs = []
    for i in range(n):
        da = int.from_bytes(hashlib.md5(f"minhash-a-{i}".encode()).digest()[:8], "big")
        db = int.from_bytes(hashlib.md5(f"minhash-b-{i}".encode()).digest()[:8], "big")
        pairs.append(((da % (1 << 31)) | 1, db % (1 << 31)))
    return pairs


_AB_A = np.array([a for a, _ in _ab_pairs()], dtype=np.int64)
_AB_B = np.array([b for _, b in _ab_pairs()], dtype=np.int64)


class Ctx:
    """Lazily-computed shared replay state for one sf directory."""

    def __init__(self, sf: str):
        self.sf = sf
        self._cache: dict = {}
        self._spark = None
        self._spark_rows: dict = {}

    # ---- Spark side -------------------------------------------------
    @property
    def spark(self):
        if self._spark is None:
            from pyspark.sql import SparkSession

            self._spark = (
                SparkSession.builder.master("local[16]")
                .config("spark.sql.shuffle.partitions", "16")
                .config("spark.driver.memory", "16g")
                .config("spark.sql.session.timeZone", "UTC")
                .config("spark.ui.enabled", "false")
                .appName("sf1_planted")
                .getOrCreate()
            )
            self._spark.sparkContext.setLogLevel("ERROR")
        return self._spark

    def spark_rows(self, name: str):
        """Collected rows of registry entry ``name`` at self.sf."""
        if name not in self._spark_rows:
            import __spark_entry__ as entrymod

            df = entrymod.queries()[name](self.spark, self.sf)
            self._spark_rows[name] = (df.columns, df.collect())
        return self._spark_rows[name]

    def base(self):
        """A Ctx over the sf0.1 baseline sharing this ctx's session —
        the replication checks' reference side."""
        if "base_ctx" not in self._cache:
            b = Ctx(SF01)
            b._spark = self.spark
            self._cache["base_ctx"] = b
        return self._cache["base_ctx"]

    # ---- inputs ------------------------------------------------------
    def _memo(self, key, build):
        if key not in self._cache:
            self._cache[key] = build()
        return self._cache[key]

    @property
    def docs(self):
        """(doc_ids int64[], texts list[str], lang list[str], source list[str])"""

        def build():
            import pyarrow.parquet as pq

            t = pq.read_table(f"{self.sf}/documents.parquet")
            return (
                np.array(t.column("doc_id"), dtype=np.int64),
                t.column("text").to_pylist(),
                t.column("lang").to_pylist(),
                t.column("source").to_pylist(),
            )

        return self._memo("docs", build)

    @property
    def emb(self):
        """(vec_ids int64[], V float64[n, 64], labels int[]) — NULL
        vectors dropped (the _embeddings contract)."""

        def build():
            import pyarrow.parquet as pq

            t = pq.read_table(f"{self.sf}/embeddings.parquet")
            ids = np.array(t.column("vec_id"), dtype=np.int64)
            raw = t.column("embedding").to_pylist()
            keep = [i for i, v in enumerate(raw) if v is not None]
            V = np.array([raw[i] for i in keep], dtype=np.float64)
            labels = np.array(t.column("label"), dtype=np.int64)[keep]
            return ids[np.array(keep, dtype=np.int64)], V, labels

        return self._memo("emb", build)

    # ---- text-replay substrate --------------------------------------
    @property
    def shingle_h60(self):
        """doc_id -> int64 array of per-OCCURRENCE 60-bit shingle hashes
        (docs with normalized length < 5 absent, like shingles())."""

        def build():
            ids, texts, _, _ = self.docs
            out = {}
            md5 = hashlib.md5
            for did, t in zip(ids, texts):
                n = norm_text(t)
                if len(n) < SHINGLE_LEN:
                    continue
                hs = np.empty(len(n) - SHINGLE_LEN + 1, dtype=np.int64)
                enc = n.encode()
                for j in range(len(hs)):
                    hs[j] = int(md5(enc[j : j + SHINGLE_LEN]).hexdigest()[:15], 16)
                out[int(did)] = hs
            return out

        return self._memo("shingle_h60", build)

    @property
    def minhash_perdoc(self):
        """doc_id -> (sig int64[32], distinct-h60 set, n_sh)."""

        def build():
            out = {}
            for did, hs in self.shingle_h60.items():
                h = hs % HASH_MOD
                sig = ((_AB_A[:, None] * h[None, :] + _AB_B[:, None]) % MINHASH_P).min(
                    axis=1
                )
                uniq = np.unique(hs)
                out[did] = (sig, uniq, len(uniq))
            return out

        return self._memo("minhash_perdoc", build)

    @property
    def lsh_candidates(self):
        """set of (doc_a, doc_b) banding candidates, doc_a < doc_b."""

        def build():
            buckets: dict = {}
            for did, (sig, _, _) in self.minhash_perdoc.items():
                for bi in range(N_BANDS):
                    key = (bi, tuple(sig[bi * BAND_ROWS : (bi + 1) * BAND_ROWS]))
                    buckets.setdefault(key, []).append(did)
            cands = set()
            for ds in buckets.values():
                if len(ds) < 2:
                    continue
                ds.sort()
                for x in range(len(ds)):
                    for y in range(x + 1, len(ds)):
                        cands.add((ds[x], ds[y]))
            return cands

        return self._memo("lsh_candidates", build)

    @property
    def minhash_pairs(self):
        """Exact replay of verified_near_dups: {(a, b): jaccard6}."""

        def build():
            perdoc = self.minhash_perdoc
            out = {}
            for a, b in self.lsh_candidates:
                sa, ha, na = perdoc[a]
                sb, hb, nb = perdoc[b]
                if int((sa == sb).sum()) < EST_CUTOFF:
                    continue
                inter = len(np.intersect1d(ha, hb, assume_unique=True))
                j = r6(inter / (na + nb - inter))
                if j >= JACCARD_THRESHOLD:
                    out[(a, b)] = j
            return out

        return self._memo("minhash_pairs", build)

    @property
    def containment_pairs(self):
        """Exact replay of containment_pairs: {(a, b): containment6}
        (no EST_CUTOFF prefilter)."""

        def build():
            perdoc = self.minhash_perdoc
            out = {}
            for a, b in self.lsh_candidates:
                _, ha, na = perdoc[a]
                _, hb, nb = perdoc[b]
                inter = len(np.intersect1d(ha, hb, assume_unique=True))
                c = r6(inter / min(na, nb))
                if c >= CONTAINMENT_THRESHOLD:
                    out[(a, b)] = c
            return out

        return self._memo("containment_pairs", build)

    @property
    def simhash_fp(self):
        """doc_id -> 60-bit simhash (majority vote over occurrences)."""

        def build():
            bits = np.arange(SIMHASH_BITS, dtype=np.int64)
            out = {}
            for did, hs in self.shingle_h60.items():
                ones = ((hs[:, None] >> bits[None, :]) & 1).sum(axis=0)
                n = len(hs)
                fp = int(((2 * ones - n > 0).astype(np.int64) << bits).sum())
                out[did] = fp
            return out

        return self._memo("simhash_fp", build)

    @property
    def simhash_pairs(self):
        """Exact replay of simhash_near_dups: {(a, b): hamming}."""

        def build():
            chunk_bits = SIMHASH_BITS // SIMHASH_CHUNKS
            mask = (1 << chunk_bits) - 1
            buckets: dict = {}
            for did, fp in self.simhash_fp.items():
                for ci in range(SIMHASH_CHUNKS):
                    buckets.setdefault(
                        (ci, (fp >> (ci * chunk_bits)) & mask), []
                    ).append(did)
            out = {}
            fps = self.simhash_fp
            for ds in buckets.values():
                if len(ds) < 2:
                    continue
                ds.sort()
                for x in range(len(ds)):
                    for y in range(x + 1, len(ds)):
                        a, b = ds[x], ds[y]
                        if (a, b) in out:
                            continue
                        hd = bin(fps[a] ^ fps[b]).count("1")
                        if hd <= SIMHASH_MAX_HAMMING:
                            out[(a, b)] = hd
            return out

        return self._memo("simhash_pairs", build)

    @property
    def doc_clusters(self):
        """doc_id -> cluster label (min reachable id over minhash
        pairs; isolated docs are their own cluster)."""

        def build():
            adj: dict = {}
            for a, b in self.minhash_pairs:
                adj.setdefault(a, set()).add(b)
                adj.setdefault(b, set()).add(a)
            label = {}
            for start in adj:
                if start in label:
                    continue
                comp, stack, seen = [], [start], {start}
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
            ids, _, _, _ = self.docs
            return {int(d): label.get(int(d), int(d)) for d in ids}

        return self._memo("doc_clusters", build)

    @property
    def exact_dup_pairs(self):
        """Planted ground truth: pairs of docs with IDENTICAL raw text
        (and normalized length >= 5) — deterministically findable by
        minhash (identical signatures share every band, jaccard 1),
        simhash (hamming 0), and containment (1.0)."""

        def build():
            ids, texts, _, _ = self.docs
            groups: dict = {}
            for did, t in zip(ids, texts):
                if len(norm_text(t)) < SHINGLE_LEN:
                    continue
                groups.setdefault(t, []).append(int(did))
            pairs = set()
            for g in groups.values():
                if len(g) < 2:
                    continue
                g.sort()
                for x in range(len(g)):
                    for y in range(x + 1, len(g)):
                        pairs.add((g[x], g[y]))
            return pairs

        return self._memo("exact_dup_pairs", build)


# ---------------------------------------------------------------------------
# comparison helpers


def _pairs_from_rows(rows, a="doc_a", b="doc_b", val=None):
    if val is None:
        return {(r[a], r[b]) for r in (r.asDict() for r in rows)}
    return {(r[a], r[b]): r[val] for r in (r.asDict() for r in rows)}


def _check_pair_map(spark_map, replay_map, tol=0.0):
    """Exact pair-set equality + per-pair value agreement."""
    extra = sorted(set(spark_map) - set(replay_map))[:5]
    missing = sorted(set(replay_map) - set(spark_map))[:5]
    bad_vals = []
    for k, v in spark_map.items():
        e = replay_map.get(k)
        if e is None:
            continue
        if isinstance(v, float):
            if abs(v - e) > tol + 1e-12:
                bad_vals.append((k, v, e))
        elif v != e:
            bad_vals.append((k, v, e))
    ok = not extra and not missing and not bad_vals
    return ok, {
        "n_spark": len(spark_map),
        "n_replay": len(replay_map),
        "extra_in_spark": [list(map(int, p)) for p in extra],
        "missing_in_spark": [list(map(int, p)) for p in missing],
        "value_mismatches": [str(x) for x in bad_vals[:5]],
    }


CHECKS = {}


def check(name):
    def deco(fn):
        CHECKS[name] = fn
        return fn

    return deco


# ---------------------------------------------------------------------------
# near-dup family — full numpy replay + planted-exact-dup recall


@check("minhash_near_dups")
def _c_minhash(ctx):
    cols, rows = ctx.spark_rows("minhash_near_dups")
    spark = _pairs_from_rows(rows, val="jaccard")
    ok, d = _check_pair_map(spark, ctx.minhash_pairs, tol=2e-6)
    planted = ctx.exact_dup_pairs
    missed = sorted(p for p in planted if p not in spark)[:5]
    d["n_planted_exact_dups"] = len(planted)
    d["planted_missed"] = [list(map(int, p)) for p in missed]
    return {
        "method": "numpy_replay+planted_recall",
        "criteria": "pair set == full signature/banding/jaccard replay;"
        " every identical-text pair reported (exact dups share all bands)",
        "pass": bool(ok and not missed),
        **d,
    }


@check("containment_near_dups")
def _c_containment(ctx):
    cols, rows = ctx.spark_rows("containment_near_dups")
    spark = _pairs_from_rows(rows, val="containment")
    ok, d = _check_pair_map(spark, ctx.containment_pairs, tol=2e-6)
    planted = ctx.exact_dup_pairs
    missed = sorted(p for p in planted if p not in spark)[:5]
    d["n_planted_exact_dups"] = len(planted)
    d["planted_missed"] = [list(map(int, p)) for p in missed]
    return {
        "method": "numpy_replay+planted_recall",
        "criteria": "pair set == banding+containment replay; every"
        " identical-text pair reported (containment 1.0)",
        "pass": bool(ok and not missed),
        **d,
    }


@check("simhash_fingerprint")
def _c_simhash_fp(ctx):
    cols, rows = ctx.spark_rows("simhash_fingerprint")
    spark = {r["doc_id"]: r["simhash"] for r in (r.asDict() for r in rows)}
    replay = ctx.simhash_fp
    bad = [
        (k, spark.get(k), replay.get(k))
        for k in set(spark) | set(replay)
        if spark.get(k) != replay.get(k)
    ][:5]
    return {
        "method": "numpy_replay",
        "criteria": "all fingerprints bit-identical to the majority-vote replay",
        "pass": not bad,
        "n_spark": len(spark),
        "n_replay": len(replay),
        "mismatches": [str(x) for x in bad],
    }


@check("simhash_near_dups")
def _c_simhash_pairs(ctx):
    cols, rows = ctx.spark_rows("simhash_near_dups")
    spark = _pairs_from_rows(rows, val="hamming")
    ok, d = _check_pair_map(spark, ctx.simhash_pairs)
    planted = ctx.exact_dup_pairs
    missed = sorted(p for p in planted if p not in spark)[:5]
    d["n_planted_exact_dups"] = len(planted)
    d["planted_missed"] = [list(map(int, p)) for p in missed]
    return {
        "method": "numpy_replay+planted_recall",
        "criteria": "pair set == pigeonhole+hamming replay over replayed"
        " fingerprints; identical-text pairs reported (hamming 0)",
        "pass": bool(ok and not missed),
        **d,
    }


@check("dedup_clusters")
def _c_clusters(ctx):
    cols, rows = ctx.spark_rows("dedup_clusters")
    spark = {r["doc_id"]: r["cluster_id"] for r in (r.asDict() for r in rows)}
    replay = ctx.doc_clusters
    bad = [
        (k, spark.get(k), replay.get(k))
        for k in set(spark) | set(replay)
        if spark.get(k) != replay.get(k)
    ][:5]
    return {
        "method": "numpy_replay",
        "criteria": "every doc's CC label == min-reachable-id fixpoint over"
        " the replayed near-dup pair graph",
        "pass": not bad,
        "n_docs": len(spark),
        "mismatches": [str(x) for x in bad],
    }


@check("dedup_cluster_size_histogram")
def _c_cluster_hist(ctx):
    cols, rows = ctx.spark_rows("dedup_cluster_size_histogram")
    spark = {
        r["cluster_size"]: (r["n_clusters"], r["n_docs"])
        for r in (r.asDict() for r in rows)
    }
    from collections import Counter

    sizes = Counter(Counter(ctx.doc_clusters.values()).values())
    replay = {sz: (n, sz * n) for sz, n in sizes.items()}
    return {
        "method": "numpy_replay",
        "criteria": "histogram == size histogram of replayed CC labels",
        "pass": spark == replay,
        "n_rows": len(spark),
        "spark_minus_replay": str(
            {k: v for k, v in spark.items() if replay.get(k) != v}
        )[:300],
    }


def _hash_bucket(key: int, n_buckets: int = 100) -> int:
    return h60_str(str(key)) % n_buckets


def _split_of(key: int) -> str:
    b = _hash_bucket(key)
    return "train" if b < 80 else ("val" if b < 90 else "test")


@check("cluster_aware_split")
def _c_cluster_split(ctx):
    cols, rows = ctx.spark_rows("cluster_aware_split")
    spark = {
        r["split"]: (r["n_docs"], r["n_clusters"], r["n_clusters_crossing"])
        for r in (r.asDict() for r in rows)
    }
    clusters = ctx.doc_clusters
    per: dict = {}
    cl_splits: dict = {}
    for doc, cl in clusters.items():
        s = _split_of(cl)  # split keyed on cluster_id
        n_docs, cls = per.setdefault(s, [0, set()])
        per[s][0] += 1
        per[s][1].add(cl)
        cl_splits.setdefault(cl, set()).add(s)
    crossing = sum(1 for v in cl_splits.values() if len(v) > 1)
    replay = {s: (n, len(cs), crossing) for s, (n, cs) in per.items()}
    return {
        "method": "numpy_replay",
        "criteria": "per-split doc/cluster counts == md5-bucket split of"
        " replayed CC labels; crossing count == 0 by construction check",
        "pass": spark == replay,
        "spark": str(spark)[:300],
        "replay": str(replay)[:300],
    }


def _quality(text: str) -> float:
    toks = text.strip().split() if text.strip() else [""]
    n_tok = max(len(toks), 1)
    n_punct = len(re.findall(r"[.,!?;:]", text))
    stop = len(
        re.findall(r"\b(the|a|and|of|in|to|is|it)\b", text.lower())
    )
    punct_ratio = r6(n_punct / max(len(text), 1))
    stop_ratio = r6(stop / n_tok)
    len_score = min(len(text) / 200.0, 1.0)
    stop_score = min(stop_ratio * 4.0, 1.0)
    punct_penalty = min(punct_ratio * 10.0, 1.0)
    return r6(len_score * 0.4 + stop_score * 0.4 + (1.0 - punct_penalty) * 0.2)


@check("dedup_keep_best")
def _c_keep_best(ctx):
    cols, rows = ctx.spark_rows("dedup_keep_best")
    spark = {
        r["cluster_id"]: (r["keep_doc_id"], r["keep_quality"], r["n_members"])
        for r in (r.asDict() for r in rows)
    }
    ids, texts, _, _ = ctx.docs
    q = {int(d): _quality(t) for d, t in zip(ids, texts)}
    clusters = ctx.doc_clusters
    best: dict = {}
    members: dict = {}
    for doc, cl in clusters.items():
        members[cl] = members.get(cl, 0) + 1
        cur = best.get(cl)
        cand = (-q[doc], doc)
        if cur is None or cand < cur:
            best[cl] = cand
    replay = {cl: (doc, -negq, members[cl]) for cl, (negq, doc) in best.items()}
    bad = [
        (k, spark.get(k), replay.get(k))
        for k in set(spark) | set(replay)
        if spark.get(k) != replay.get(k)
    ][:5]
    return {
        "method": "numpy_replay",
        "criteria": "per-cluster argmax(quality, -id) over replayed labels"
        " with the exact quality_score formula",
        "pass": not bad,
        "n_clusters": len(spark),
        "mismatches": [str(x) for x in bad],
    }


@check("dedup_method_agreement")
def _c_method_agreement(ctx):
    cols, rows = ctx.spark_rows("dedup_method_agreement")
    r = rows[0].asDict()
    mh = set(ctx.minhash_pairs)
    sh = set(ctx.simhash_pairs)
    replay = (
        len(mh & sh),
        len(mh - sh),
        len(sh - mh),
    )
    got = (r["n_both"], r["n_minhash_only"], r["n_simhash_only"])
    return {
        "method": "numpy_replay",
        "criteria": "(both, minhash-only, simhash-only) == set algebra of"
        " the two replayed pair sets",
        "pass": got == replay,
        "spark": list(got),
        "replay": list(replay),
    }


@check("split_leakage_audit")
def _c_split_leakage(ctx):
    cols, rows = ctx.spark_rows("split_leakage_audit")
    spark = {
        (r["split_lo"], r["split_hi"]): r["n_pairs"]
        for r in (r.asDict() for r in rows)
    }
    replay: dict = {}
    for a, b in ctx.minhash_pairs:
        sa, sb = _split_of(a), _split_of(b)
        key = (min(sa, sb), max(sa, sb))
        replay[key] = replay.get(key, 0) + 1
    return {
        "method": "numpy_replay",
        "criteria": "cross-split pair counts == replayed near-dup pairs"
        " bucketed by the md5 hash split of each endpoint",
        "pass": spark == replay,
        "spark": str(sorted(spark.items()))[:300],
        "replay": str(sorted(replay.items()))[:300],
    }


@check("streaming_minhash_dedup")
def _c_streaming_minhash(ctx):
    cols, rows = ctx.spark_rows("streaming_minhash_dedup")
    spark = {
        r["doc_id"]: (r["dup_of"], r["jaccard"])
        for r in (r.asDict() for r in rows)
    }
    agg: dict = {}
    for (a, b), j in ctx.minhash_pairs.items():
        cur = agg.get(b)
        if cur is None or a < cur[0]:
            agg[b] = (a, j)
    bad = [
        (k, spark.get(k), agg.get(k))
        for k in set(spark) | set(agg)
        if spark.get(k) is None
        or agg.get(k) is None
        or spark[k][0] != agg[k][0]
        or abs(spark[k][1] - agg[k][1]) > 2e-6
    ][:5]
    return {
        "method": "numpy_replay",
        "criteria": "flagged set == per-later-doc min earlier near-dup over"
        " the replayed pair set (batch-split invariance)",
        "pass": not bad,
        "n_flagged": len(spark),
        "mismatches": [str(x) for x in bad],
    }


@check("ngram_jaccard")
def _c_ngram_jaccard(ctx):
    """Two-sided: full replay is quadratic per (lang, source) block, so
    verify every reported pair exactly + recall on identical-text pairs
    within the same block (bigram jaccard 1.0 >= 0.3)."""
    cols, rows = ctx.spark_rows("ngram_jaccard")
    ids, texts, lang, source = ctx.docs
    idx = {int(d): i for i, d in enumerate(ids)}

    def bigrams(i):
        w = norm_text(texts[i]).split()
        if len(w) < 2:
            return None
        return {f"{w[j]} {w[j+1]}" for j in range(len(w) - 1)}

    bad = []
    for r in (r.asDict() for r in rows):
        ia, ib = idx[r["doc_a"]], idx[r["doc_b"]]
        ga, gb = bigrams(ia), bigrams(ib)
        okblock = (lang[ia], source[ia]) == (lang[ib], source[ib])
        if ga is None or gb is None or not okblock:
            bad.append((r["doc_a"], r["doc_b"], "ineligible"))
            continue
        inter = len(ga & gb)
        j = r6(inter / (len(ga) + len(gb) - inter))
        if j < 0.3 or abs(j - r["jaccard"]) > 2e-6:
            bad.append((r["doc_a"], r["doc_b"], j, r["jaccard"]))
    spark_pairs = _pairs_from_rows([r for r in rows])
    by_block: dict = {}
    missed = []
    for a, b in ctx.exact_dup_pairs:
        ia, ib = idx[a], idx[b]
        if (lang[ia], source[ia]) != (lang[ib], source[ib]):
            continue
        if len(norm_text(texts[ia]).split()) < 2:
            continue
        if (a, b) not in spark_pairs:
            missed.append((a, b))
    return {
        "method": "planted_recall",
        "criteria": "every reported pair block-eligible with exact bigram"
        " jaccard >= 0.3 (precision); every same-block identical-text"
        " pair reported (recall)",
        "pass": not bad and not missed,
        "n_pairs": len(rows),
        "bad_reported": [str(x) for x in bad[:5]],
        "planted_missed": [list(map(int, p)) for p in missed[:5]],
    }


# ---------------------------------------------------------------------------
# embedding / ANN family — numpy replays of the deterministic index math


def r6v(x: np.ndarray) -> np.ndarray:
    """Vectorized 6dp HALF-UP (away from zero) in double space — matches
    Spark/DuckDB ROUND except at exact .5-ULP boundaries (measure ~0 on
    gaussian data; comparisons carry a 2e-6 tolerance anyway)."""
    return np.where(x >= 0, np.floor(x * 1e6 + 0.5), np.ceil(x * 1e6 - 0.5)) / 1e6


def _emb_state(ctx):
    def build():
        ids, V, labels = ctx.emb
        norms = np.sqrt((V * V).sum(axis=1))
        return ids, V, labels, norms

    return ctx._memo("emb_state", build)


def _cos6_block(V, norms, rows_idx, all_idx=None):
    """r6v cosine of V[rows_idx] against V[all_idx] (COS_SQL semantics:
    dot/(|a||b|), zero norm -> nan)."""
    A = V[rows_idx]
    B = V if all_idx is None else V[all_idx]
    nb = norms if all_idx is None else norms[all_idx]
    with np.errstate(divide="ignore", invalid="ignore"):
        s = (A @ B.T) / (norms[rows_idx][:, None] * nb[None, :])
    return r6v(s)


def _topk_rows(scored, k, desc=True):
    """scored: list[(score, id)] -> list[(id, score, rnk)] top-k by
    (score desc|asc, id asc)."""
    key = (lambda t: (-t[0], t[1])) if desc else (lambda t: (t[0], t[1]))
    out = []
    for r, (s, i) in enumerate(sorted(scored, key=key)[:k], start=1):
        out.append((i, s, r))
    return out


def _compare_topk(ctx, name, expected_by_q, score_col, tol=2e-6,
                  extra_cols=()):
    cols, rows = ctx.spark_rows(name)
    got: dict = {}
    for r in (r.asDict() for r in rows):
        got.setdefault(r["query_id"], []).append(r)
    bad = []
    for q, exp in expected_by_q.items():
        g = sorted(got.get(q, []), key=lambda r: r["rnk"])
        if len(g) != len(exp):
            bad.append((q, "count", len(g), len(exp)))
            continue
        for r, (nid, score, rnk) in zip(g, exp):
            if r["neighbor_id"] != nid or r["rnk"] != rnk:
                bad.append((q, "ids", r["neighbor_id"], nid, rnk))
                break
            if abs(r[score_col] - score) > tol:
                bad.append((q, "score", r[score_col], score))
                break
    n_extra_q = [q for q in got if q not in expected_by_q]
    return {
        "pass": not bad and not n_extra_q,
        "n_rows": len(rows),
        "n_queries": len(expected_by_q),
        "mismatches": [str(x) for x in bad[:5]],
        "unexpected_queries": n_extra_q[:5],
    }


def _brute_force_replay(ctx, n_queries=10, k=5):
    def build():
        ids, V, labels, norms = _emb_state(ctx)
        qpos = np.nonzero(ids < n_queries)[0]
        out = {}
        for p in qpos:
            c = _cos6_block(V, norms, np.array([p]))[0]
            scored = [
                (c[j], int(ids[j]))
                for j in range(len(ids))
                if j != p and not math.isnan(c[j])
            ]
            out[int(ids[p])] = _topk_rows(scored, k)
        return out

    return ctx._memo("brute_force_replay", build)


@check("ann_cosine_topk")
def _c_ann_cosine(ctx):
    d = _compare_topk(ctx, "ann_cosine_topk", _brute_force_replay(ctx), "cos")
    return {
        "method": "numpy_replay",
        "criteria": "per-query exact top-5 by (cos6 desc, id) over the full"
        " corpus == numpy rescan (sampled-exact, all 10 queries)",
        **d,
    }


def _ivf_state(ctx, stride=50):
    """(cent_ids, assignment row->centroid_id) replaying ivf_assign."""

    def build():
        ids, V, labels, norms = _emb_state(ctx)
        cpos = np.nonzero(ids % stride == 0)[0]
        cids = ids[cpos]
        order = np.argsort(cids)  # ascending centroid id for tie-breaks
        cpos, cids = cpos[order], cids[order]
        M = _cos6_block(V, norms, np.arange(len(ids)), cpos)
        M = np.nan_to_num(M, nan=-np.inf)
        best = np.argmax(M, axis=1)  # first max = lowest centroid id
        return cids, cpos, M, best

    return ctx._memo(f"ivf_state_{stride}", build)


def _ivf_topk_replay(ctx, n_queries=10, k=5, nprobe=2):
    def build():
        ids, V, labels, norms = _emb_state(ctx)
        cids, cpos, M, best = _ivf_state(ctx)
        assigned_cid = cids[best]
        qpos = np.nonzero(ids < n_queries)[0]
        out = {}
        for p in qpos:
            row = M[p]
            probe_order = sorted(
                range(len(cids)), key=lambda j: (-row[j], cids[j])
            )[:nprobe]
            probed = {int(cids[j]) for j in probe_order}
            cand = np.nonzero(np.isin(assigned_cid, list(probed)))[0]
            cand = cand[cand != p]
            c = _cos6_block(V, norms, np.array([p]), cand)[0]
            scored = [
                (c[j], int(ids[cand[j]]))
                for j in range(len(cand))
                if not math.isnan(c[j])
            ]
            out[int(ids[p])] = _topk_rows(scored, k)
        return out

    return ctx._memo("ivf_topk_replay", build)


@check("ann_ivf_topk")
def _c_ann_ivf(ctx):
    d = _compare_topk(ctx, "ann_ivf_topk", _ivf_topk_replay(ctx), "cos")
    return {
        "method": "numpy_replay",
        "criteria": "stride centroids, max-cos6 assignment (low-id ties),"
        " nprobe=2 probes, in-cluster top-5 — full index replay",
        **d,
    }


def _lsh_planes_mat(n_tables=4, n_planes=8, dim=64):
    mats = []
    for t in range(n_tables):
        planes = []
        for p in range(n_planes):
            bits = hashlib.md5(f"lshplane-{t}-{p}".encode()).digest() * (
                (dim + 127) // 128 + 1
            )
            planes.append(
                [1.0 if (bits[i // 8] >> (i % 8)) & 1 else -1.0 for i in range(dim)]
            )
        mats.append(np.array(planes, dtype=np.float64).T)  # (dim, planes)
    return mats


def _lsh_buckets_replay(ctx):
    """row -> int32[4] bucket per table (sign bits of V @ planes)."""

    def build():
        ids, V, labels, norms = _emb_state(ctx)
        mats = _lsh_planes_mat()
        w = 1 << np.arange(8)
        cols = []
        for mat in mats:
            bits = (V @ mat) > 0
            cols.append((bits * w).sum(axis=1).astype(np.int64))
        return np.stack(cols, axis=1)  # (n, 4)

    return ctx._memo("lsh_buckets_replay", build)


def _lsh_cand_pairs(ctx):
    """set of (row_a, row_b) positions sharing any (table, bucket)."""

    def build():
        B = _lsh_buckets_replay(ctx)
        pairs = set()
        for t in range(B.shape[1]):
            buckets: dict = {}
            for p, b in enumerate(B[:, t]):
                buckets.setdefault(int(b), []).append(p)
            for ps in buckets.values():
                for x in range(len(ps)):
                    for y in range(x + 1, len(ps)):
                        pairs.add((ps[x], ps[y]))
        return pairs

    return ctx._memo("lsh_cand_pairs", build)


def _lsh_topk_replay(ctx, n_queries=10, k=5):
    def build():
        ids, V, labels, norms = _emb_state(ctx)
        B = _lsh_buckets_replay(ctx)
        qpos = np.nonzero(ids < n_queries)[0]
        out = {}
        for p in qpos:
            cand = set()
            for t in range(B.shape[1]):
                cand.update(np.nonzero(B[:, t] == B[p, t])[0].tolist())
            cand.discard(int(p))
            cand = np.array(sorted(cand), dtype=np.int64)
            if len(cand) == 0:
                out[int(ids[p])] = []
                continue
            c = _cos6_block(V, norms, np.array([p]), cand)[0]
            scored = [
                (c[j], int(ids[cand[j]]))
                for j in range(len(cand))
                if not math.isnan(c[j])
            ]
            out[int(ids[p])] = _topk_rows(scored, k)
        return out

    return ctx._memo("lsh_topk_replay", build)


@check("ann_lsh_topk")
def _c_ann_lsh(ctx):
    d = _compare_topk(ctx, "ann_lsh_topk", _lsh_topk_replay(ctx), "cos")
    return {
        "method": "numpy_replay",
        "criteria": "md5 hyperplane sign buckets (4 tables x 8 planes),"
        " bucket-union candidates, exact cos6 top-5 — full index replay",
        **d,
    }


PQ_SUBS, PQ_DSUB, PQ_CODES, PQ_CW_STRIDE = 8, 8, 8, 25


def _micro_v(d2: np.ndarray) -> np.ndarray:
    """round(round(d2, 6) * 1e6) as int64 (all values >= 0)."""
    return np.floor(r6v(d2) * 1e6 + 0.5).astype(np.int64)


def _pq_state(ctx):
    """(codewords (8, 8, 8dims), codes (n, 8) int) replaying pq_encode."""

    def build():
        ids, V, labels, norms = _emb_state(ctx)
        cpos_by_code = {}
        for p, i in enumerate(ids):
            if i % PQ_CW_STRIDE == 0 and i < PQ_CODES * PQ_CW_STRIDE:
                cpos_by_code[int(i // PQ_CW_STRIDE)] = p
        codes_avail = sorted(cpos_by_code)
        CW = np.stack([V[cpos_by_code[c]] for c in codes_avail])  # (C, 64)
        n = len(ids)
        codes = np.empty((n, PQ_SUBS), dtype=np.int64)
        for s in range(PQ_SUBS):
            sl = slice(s * PQ_DSUB, (s + 1) * PQ_DSUB)
            diff = V[:, None, sl] - CW[None, :, sl]
            dmic = _micro_v((diff * diff).sum(axis=2))
            codes[:, s] = np.array(codes_avail)[np.argmin(dmic, axis=1)]
        return np.array(codes_avail), CW, codes

    return ctx._memo("pq_state", build)


def _pq_scores(ctx, qp):
    """int64 admic of every corpus row against query at position qp."""
    ids, V, labels, norms = _emb_state(ctx)
    codes_avail, CW, codes = _pq_state(ctx)
    admic = np.zeros(len(ids), dtype=np.int64)
    for s in range(PQ_SUBS):
        sl = slice(s * PQ_DSUB, (s + 1) * PQ_DSUB)
        diff = V[qp, sl][None, :] - CW[:, sl]
        dmic = _micro_v((diff * diff).sum(axis=1))  # (C,)
        code_to_d = {int(c): int(dmic[j]) for j, c in enumerate(codes_avail)}
        admic += np.array([code_to_d[int(c)] for c in codes[:, s]])
    return admic


def _pq_topk_replay(ctx, n_queries=10, k=5):
    def build():
        ids, V, labels, norms = _emb_state(ctx)
        qpos = np.nonzero(ids < n_queries)[0]
        out = {}
        for p in qpos:
            admic = _pq_scores(ctx, p)
            scored = [
                (int(admic[j]), int(ids[j])) for j in range(len(ids)) if j != p
            ]
            top = _topk_rows(scored, k, desc=False)
            out[int(ids[p])] = [(i, m / 1e6, r) for i, m, r in top]
        return out

    return ctx._memo("pq_topk_replay", build)


@check("ann_pq_topk")
def _c_ann_pq(ctx):
    d = _compare_topk(
        ctx, "ann_pq_topk", _pq_topk_replay(ctx), "approx_d2", tol=3e-6
    )
    return {
        "method": "numpy_replay",
        "criteria": "PQ codebook encode (integer micro-units, low-code"
        " ties) + asymmetric distance top-5 — full index replay",
        **d,
    }


def _ivf_pq_topk_replay(ctx, n_queries=10, k=5, nprobe=2):
    def build():
        ids, V, labels, norms = _emb_state(ctx)
        cids, cpos, M, best = _ivf_state(ctx)
        assigned_cid = cids[best]
        qpos = np.nonzero(ids < n_queries)[0]
        out = {}
        for p in qpos:
            row = M[p]
            probe_order = sorted(
                range(len(cids)), key=lambda j: (-row[j], cids[j])
            )[:nprobe]
            probed = {int(cids[j]) for j in probe_order}
            cand = np.nonzero(np.isin(assigned_cid, list(probed)))[0]
            cand = cand[cand != p]
            admic = _pq_scores(ctx, p)
            scored = [(int(admic[j]), int(ids[j])) for j in cand]
            top = _topk_rows(scored, k, desc=False)
            out[int(ids[p])] = [(i, m / 1e6, r) for i, m, r in top]
        return out

    return ctx._memo("ivf_pq_topk_replay", build)


@check("ann_ivf_pq_topk")
def _c_ann_ivf_pq(ctx):
    d = _compare_topk(
        ctx, "ann_ivf_pq_topk", _ivf_pq_topk_replay(ctx), "approx_d2", tol=3e-6
    )
    return {
        "method": "numpy_replay",
        "criteria": "IVF probes restrict candidates, PQ integer micro-unit"
        " distances rank them — full two-level index replay",
        **d,
    }


@check("ann_rank_fusion")
def _c_rank_fusion(ctx):
    ivf = _ivf_topk_replay(ctx)
    lsh = _lsh_topk_replay(ctx)
    expected = {}
    for q in set(ivf) | set(lsh):
        ra = {i: r for i, _, r in ivf.get(q, [])}
        rb = {i: r for i, _, r in lsh.get(q, [])}
        scored = []
        for nid in set(ra) | set(rb):
            s = (1.0 / (60 + ra[nid]) if nid in ra else 0.0) + (
                1.0 / (60 + rb[nid]) if nid in rb else 0.0
            )
            scored.append((r6(s), nid))
        expected[q] = _topk_rows(scored, 5)
    d = _compare_topk(ctx, "ann_rank_fusion", expected, "rrf_score", tol=2e-6)
    return {
        "method": "numpy_replay",
        "criteria": "RRF (c=60) over the replayed IVF and LSH rankings,"
        " re-ranked top-5",
        **d,
    }


def _recall_check(ctx, name, approx_replay):
    cols, rows = ctx.spark_rows(name)
    exact = _brute_force_replay(ctx)
    expected = {}
    for q, ex in exact.items():
        ex_ids = {i for i, _, _ in ex}
        ap_ids = {i for i, _, _ in approx_replay.get(q, [])}
        n = len(ex_ids & ap_ids)
        expected[q] = (n, r6(n / 5.0))
    got = {
        r["query_id"]: (r["n_hits"], r["recall_at_5"])
        for r in (r.asDict() for r in rows)
    }
    return {
        "method": "numpy_replay",
        "criteria": "per-query overlap of the replayed exact and approx"
        " top-5 sets (both fully replayed)",
        "pass": got == expected,
        "spark": str(sorted(got.items()))[:300],
        "replay": str(sorted(expected.items()))[:300],
    }


@check("ann_recall_eval")
def _c_recall_eval(ctx):
    return _recall_check(ctx, "ann_recall_eval", _lsh_topk_replay(ctx))


@check("ann_pq_recall_eval")
def _c_pq_recall_eval(ctx):
    return _recall_check(ctx, "ann_pq_recall_eval", _pq_topk_replay(ctx))


def _exact_pairs_04(ctx, threshold=0.4):
    """cosine_pairs_blocked replay: normalized GEMM + np.round(.., 6)
    (the operator's own numeric path), blocked over rows."""

    def build():
        ids, V, labels, norms = _emb_state(ctx)
        with np.errstate(divide="ignore", invalid="ignore"):
            Vn = V / norms[:, None]
        Vn = np.nan_to_num(Vn)
        n = len(ids)
        out = {}
        step = 2048
        for a0 in range(0, n, step):
            A = Vn[a0 : a0 + step]
            s = A @ Vn.T
            # pre-filter must admit everything that ROUNDS to the
            # threshold: raw values in [t - 5e-7, t) round up to t
            r, c = np.nonzero(s >= threshold - 5.1e-7)
            for i, j in zip(r, c):
                gi, gj = a0 + int(i), int(j)
                if gi >= gj:
                    continue
                v = float(np.round(s[i, j], 6))
                if v >= threshold:
                    out[(int(ids[gi]), int(ids[gj]))] = v
        return out

    return ctx._memo(f"exact_pairs_{threshold}", build)


@check("embedding_neardup")
def _c_embedding_neardup(ctx):
    cols, rows = ctx.spark_rows("embedding_neardup")
    spark = {
        (r["id_a"], r["id_b"]): r["cos"] for r in (r.asDict() for r in rows)
    }
    ok, d = _check_pair_map(spark, _exact_pairs_04(ctx), tol=2e-6)
    return {
        "method": "numpy_replay",
        "criteria": "pair set == exact blocked-GEMM all-pairs cos >= 0.4"
        " (the full quadratic rescan, feasible in numpy where SQL is not)",
        "pass": ok,
        **d,
    }


@check("embedding_lsh_recall_eval")
def _c_emb_lsh_recall(ctx):
    cols, rows = ctx.spark_rows("embedding_lsh_recall_eval")
    r = rows[0].asDict()
    ids, V, labels, norms = _emb_state(ctx)
    exact = set(_exact_pairs_04(ctx))
    cand_pos = _lsh_cand_pairs(ctx)
    cand = {
        (int(ids[a]), int(ids[b])) if ids[a] < ids[b] else (int(ids[b]), int(ids[a]))
        for a, b in cand_pos
    }
    found = len(exact & cand)
    expected = (len(exact), found, r6(found / max(len(exact), 1)))
    got = (r["n_exact_pairs"], r["n_found"], r["recall"])
    return {
        "method": "numpy_replay",
        "criteria": "exact >=0.4 pair set (full numpy rescan) intersected"
        " with replayed LSH bucket candidates",
        "pass": got[0] == expected[0]
        and got[1] == expected[1]
        and abs(got[2] - expected[2]) <= 2e-6,
        "spark": list(got),
        "replay": list(expected),
    }


@check("embedding_similarity_histogram")
def _c_sim_histogram(ctx):
    cols, rows = ctx.spark_rows("embedding_similarity_histogram")
    spark = {
        r["bin"]: (r["cos_lo"], r["n_pairs"]) for r in (r.asDict() for r in rows)
    }
    ids, V, labels, norms = _emb_state(ctx)
    pairs = sorted(_lsh_cand_pairs(ctx))
    counts: dict = {}
    step = 200_000
    for i0 in range(0, len(pairs), step):
        chunk = pairs[i0 : i0 + step]
        A = np.array([a for a, _ in chunk])
        Bp = np.array([b for _, b in chunk])
        dots = np.einsum("ij,ij->i", V[A], V[Bp])
        with np.errstate(divide="ignore", invalid="ignore"):
            c = r6v(dots / (norms[A] * norms[Bp]))
        c = c[~np.isnan(c)]
        bins = np.minimum(np.floor(c / 0.05), 19).astype(np.int64)
        for b in bins:
            counts[int(b)] = counts.get(int(b), 0) + 1
    replay = {b: (r6(b * 0.05), n) for b, n in counts.items()}
    bad = {
        b
        for b in set(spark) | set(replay)
        if spark.get(b) is None
        or replay.get(b) is None
        or spark[b][1] != replay[b][1]
        or abs(spark[b][0] - replay[b][0]) > 1e-9
    }
    return {
        "method": "numpy_replay",
        "criteria": "per-bin counts == cos6 histogram over the replayed LSH"
        " candidate pair set",
        "pass": not bad,
        "n_bins": len(spark),
        "bad_bins": sorted(bad)[:5],
    }


@check("streaming_embedding_dedup")
def _c_streaming_embdedup(ctx):
    cols, rows = ctx.spark_rows("streaming_embedding_dedup")
    spark = {
        r["vec_id"]: (r["dup_of"], r["cos"]) for r in (r.asDict() for r in rows)
    }
    ids, V, labels, norms = _emb_state(ctx)
    agg: dict = {}
    pairs = sorted(_lsh_cand_pairs(ctx))
    A = np.array([a for a, _ in pairs], dtype=np.int64)
    Bp = np.array([b for _, b in pairs], dtype=np.int64)
    # normalize orientation by vec_id
    swap = ids[A] > ids[Bp]
    A2 = np.where(swap, Bp, A)
    B2 = np.where(swap, A, Bp)
    dots = np.einsum("ij,ij->i", V[A2], V[B2])
    with np.errstate(divide="ignore", invalid="ignore"):
        c = r6v(dots / (norms[A2] * norms[B2]))
    for i in range(len(pairs)):
        if math.isnan(c[i]) or c[i] < 0.4:
            continue
        ia, ib = int(ids[A2[i]]), int(ids[B2[i]])
        cur = agg.get(ib)
        if cur is None or ia < cur[0]:
            agg[ib] = (ia, float(c[i]))
    bad = [
        (k, spark.get(k), agg.get(k))
        for k in set(spark) | set(agg)
        if spark.get(k) is None
        or agg.get(k) is None
        or spark[k][0] != agg[k][0]
        or abs(spark[k][1] - agg[k][1]) > 2e-6
    ][:5]
    return {
        "method": "numpy_replay",
        "criteria": "flagged set == per-later-vector min earlier LSH-bucket"
        " near-dup (cos6 >= 0.4) over the replayed bucket index",
        "pass": not bad,
        "n_flagged": len(spark),
        "mismatches": [str(x) for x in bad],
    }


@check("semantic_decontaminate")
def _c_semantic_decon(ctx):
    cols, rows = ctx.spark_rows("semantic_decontaminate")
    spark = {
        r["vec_id"]: (r["nearest_bench_id"], r["max_cos"], r["contaminated"])
        for r in (r.asDict() for r in rows)
    }
    ids, V, labels, norms = _emb_state(ctx)
    bench = np.nonzero(ids % 97 == 3)[0]
    corpus = np.nonzero(ids % 97 != 3)[0]
    border = np.argsort(ids[bench])  # ascending bench id for ties
    bench = bench[border]
    M = _cos6_block(V, norms, corpus, bench)
    M = np.nan_to_num(M, nan=-np.inf)
    best = np.argmax(M, axis=1)  # first max = lowest bench id
    replay = {}
    for i, p in enumerate(corpus):
        mc = float(M[i, best[i]])
        if mc == -np.inf:
            continue
        replay[int(ids[p])] = (
            int(ids[bench[best[i]]]),
            mc,
            1 if mc >= 0.3 else 0,
        )
    bad = [
        (k, spark.get(k), replay.get(k))
        for k in set(spark) | set(replay)
        if spark.get(k) is None
        or replay.get(k) is None
        or spark[k][0] != replay[k][0]
        or abs(spark[k][1] - replay[k][1]) > 2e-6
        or spark[k][2] != replay[k][2]
    ][:5]
    return {
        "method": "numpy_replay",
        "criteria": "per-corpus-vector max cos6 against the deterministic"
        " bench set (id%97==3), low-id ties, 0.3 flag — full replay",
        "pass": not bad,
        "n_rows": len(spark),
        "mismatches": [str(x) for x in bad],
    }


@check("hard_negative_mining")
def _c_hard_negatives(ctx):
    cols, rows = ctx.spark_rows("hard_negative_mining")
    ids, V, labels, norms = _emb_state(ctx)
    qpos = np.nonzero(ids < 10)[0]
    expected = {}
    for p in qpos:
        c = _cos6_block(V, norms, np.array([p]))[0]
        same, other = [], []
        for j in range(len(ids)):
            if j == p or math.isnan(c[j]):
                continue
            (same if labels[j] == labels[p] else other).append((c[j], int(ids[j])))
        expected[(int(ids[p]), True)] = _topk_rows(same, 3)
        expected[(int(ids[p]), False)] = _topk_rows(other, 3)
    got: dict = {}
    for r in (r.asDict() for r in rows):
        got.setdefault((r["query_id"], r["label_match"]), []).append(r)
    bad = []
    for key, exp in expected.items():
        g = sorted(got.get(key, []), key=lambda r: r["rnk"])
        if len(g) != len(exp):
            bad.append((key, "count", len(g), len(exp)))
            continue
        for r, (nid, score, rnk) in zip(g, exp):
            if r["neighbor_id"] != nid or r["rnk"] != rnk or abs(r["cos"] - score) > 2e-6:
                bad.append((key, r["neighbor_id"], nid))
                break
    return {
        "method": "numpy_replay",
        "criteria": "per (anchor, label_match) top-3 by (cos6 desc, id) over"
        " the full corpus — exact rescan",
        "pass": not bad,
        "n_rows": len(rows),
        "mismatches": [str(x) for x in bad[:5]],
    }


@check("kmeans_embeddings")
def _c_kmeans(ctx):
    cols, rows = ctx.spark_rows("kmeans_embeddings")
    spark = {
        r["cluster_id"]: (r["n_members"], r["centroid_sum"])
        for r in (r.asDict() for r in rows)
    }
    ids, V, labels, norms = _emb_state(ctx)
    stride = 100
    cpos = np.nonzero(ids % stride == 0)[0]
    cids = ids[cpos]
    order = np.argsort(cids)
    cpos, cids = cpos[order], cids[order]
    C = V[cpos].copy()
    cid_list = [int(c) for c in cids]  # ascending — argmax ties -> low id
    assign_ids = None
    for _ in range(2):
        cn = np.sqrt((C * C).sum(axis=1))
        with np.errstate(divide="ignore", invalid="ignore"):
            M = r6v((V @ C.T) / (norms[:, None] * cn[None, :]))
        M = np.nan_to_num(M, nan=-np.inf)
        assign_ids = np.array(cid_list)[np.argmax(M, axis=1)]
        # recompute means per ASSIGNED cluster id; empty clusters drop
        # out of the centroid table (groupBy semantics)
        new_ids = sorted(set(int(c) for c in assign_ids))
        C = np.stack(
            [r6v(V[assign_ids == c].mean(axis=0)) for c in new_ids]
        )
        cid_list = new_ids
    replay = {}
    for j, c in enumerate(cid_list):
        n = int((assign_ids == c).sum())
        if n:
            replay[c] = (n, r6(float(C[j].sum())))
    bad = [
        (k, spark.get(k), replay.get(k))
        for k in set(spark) | set(replay)
        if spark.get(k) is None
        or replay.get(k) is None
        or spark[k][0] != replay[k][0]
        or abs(spark[k][1] - replay[k][1]) > 5e-6
    ][:5]
    return {
        "method": "numpy_replay",
        "criteria": "2 Lloyd rounds (stride init, cos6 argmax assignment,"
        " 6dp-rounded means) fully replayed; sizes exact, sums tol 5e-6",
        "pass": not bad,
        "n_clusters": len(spark),
        "mismatches": [str(x) for x in bad],
    }


@check("pca_top_component")
def _c_pca(ctx):
    cols, rows = ctx.spark_rows("pca_top_component")
    spark = {r["dim"]: r["component"] for r in (r.asDict() for r in rows)}
    ids, V, labels, norms = _emb_state(ctx)
    scale, vscale, iters, dim = 10**9, 10**6, 4, 64
    A = np.zeros((dim, dim), dtype=object)
    acc = np.zeros((dim, dim), dtype=np.int64)
    for s in range(0, len(V), 512):
        xs = V[s : s + 512]
        P = np.trunc((xs[:, :, None] * xs[:, None, :]) * scale)
        acc += P.astype(np.int64).sum(axis=0)
    A = [[int(acc[i, j]) for j in range(dim)] for i in range(dim)]
    v = [vscale] * dim
    for _ in range(iters):
        w = [sum(A[i][j] * v[j] for j in range(dim)) for i in range(dim)]
        m = max(abs(x) for x in w)
        if m == 0:
            break
        v = [(abs(x) * vscale) // m * (1 if x >= 0 else -1) for x in w]
    replay = {i + 1: r6(v[i] / vscale) for i in range(dim)}
    bad = [
        (k, spark.get(k), replay.get(k))
        for k in spark
        if abs(spark[k] - replay[k]) > 1e-9
    ][:5]
    return {
        "method": "numpy_replay",
        "criteria": "integer-quantized gram + 4-round integer power"
        " iteration replayed exactly (bit-identical arithmetic)",
        "pass": not bad and len(spark) == dim,
        "mismatches": [str(x) for x in bad],
    }


@check("embedding_confusion")
def _c_confusion(ctx):
    cols, rows = ctx.spark_rows("embedding_confusion")
    spark = {
        (r["label"], r["nearest_other"]): r["n_confused"]
        for r in (r.asDict() for r in rows)
    }
    ids, V, labels, norms = _emb_state(ctx)
    labs = np.unique(labels)
    cent = {int(l): r6v(V[labels == l].mean(axis=0)) for l in labs}
    counts: dict = {}
    for l in labs:
        idxs = np.nonzero(labels == l)[0]
        Vl = V[idxs]
        sq = {}
        for cl, cv in cent.items():
            d = Vl - cv[None, :]
            sq[cl] = r6v((d * d).sum(axis=1))
        own = sq[int(l)]
        others = sorted(cl for cl in cent if cl != int(l))
        micro = np.stack(
            [np.floor(sq[cl] * 1e6 + 0.5).astype(np.int64) for cl in others],
            axis=1,
        )
        raw = np.stack([sq[cl] for cl in others], axis=1)
        nearest = np.argmin(micro, axis=1)  # first min = lowest label
        other_sq = raw.min(axis=1)
        confused = other_sq < own
        for j in np.nonzero(confused)[0]:
            key = (int(l), int(others[nearest[j]]))
            counts[key] = counts.get(key, 0) + 1
    return {
        "method": "numpy_replay",
        "criteria": "per-vector own-centroid vs min other-centroid sqdist"
        " (6dp rounds, micro-int ties) fully replayed; group counts exact",
        "pass": spark == counts,
        "n_groups": len(spark),
        "spark_minus_replay": str(
            {k: v for k, v in spark.items() if counts.get(k) != v}
        )[:300],
        "replay_minus_spark": str(
            {k: v for k, v in counts.items() if spark.get(k) != v}
        )[:300],
    }


@check("corpus_build_pipeline")
def _c_corpus_build(ctx):
    cols, rows = ctx.spark_rows("corpus_build_pipeline")
    spark = {
        (r["split"], r["source"], r["bin"]): (
            r["n_docs"],
            r["tokens_packed"],
            r["first_doc"],
            r["last_doc"],
        )
        for r in (r.asDict() for r in rows)
    }
    ids, texts, lang, source = ctx.docs
    idx = {int(d): i for i, d in enumerate(ids)}
    q = {int(d): _quality(t) for d, t in zip(ids, texts)}
    clusters = ctx.doc_clusters
    best: dict = {}
    for doc, cl in clusters.items():
        cand = (-q[doc], doc)
        if cl not in best or cand < best[cl]:
            best[cl] = cand
    kept = [
        (doc, -negq) for negq, doc in best.values() if -negq >= 0.3
    ]
    per: dict = {}
    for doc, _ in kept:
        i = idx[doc]
        t = texts[i].strip()
        tok = len(t.split()) if t else 1  # size(split('')) == 1
        per.setdefault((_split_of(doc), source[i]), []).append((doc, tok))
    replay: dict = {}
    for (sp, src), docs_ in per.items():
        docs_.sort()
        cum = 0
        for doc, tok in docs_:
            b = cum // 2000  # (cum - tok) div budget with cum updated after
            cum += tok
            key = (sp, src, b)
            n, tk, lo, hi = replay.get(key, (0, 0, doc, doc))
            replay[key] = (n + 1, tk + tok, min(lo, doc), max(hi, doc))
    bad = [
        (k, spark.get(k), replay.get(k))
        for k in set(spark) | set(replay)
        if spark.get(k) != replay.get(k)
    ][:5]
    return {
        "method": "numpy_replay",
        "criteria": "keep-best (replayed labels + exact quality) -> 0.3"
        " gate -> md5 split -> per-(split, source) prefix-sum packing"
        " at budget 2000 — manifest replayed exactly",
        "pass": not bad,
        "n_bins": len(spark),
        "mismatches": [str(x) for x in bad],
    }


# ---------------------------------------------------------------------------
# graph family — replication invariance: the sf~1 corpus is 10 DISJOINT
# FK-shifted copies of sf0.1 (tools/scale_gen.py), so the co-purchase /
# trade graphs are 10 isomorphic components and results derive exactly
# from the sf0.1 run of the same (sf0.01-oracle-green) plan.

_COPIES = 10
_SHIFT = {"part": 20_000, "customer": 15_000, "supplier": 1_000}


def _assert_replicated_premise(ctx):
    """Spot-verify the generator property the replication oracle rests
    on: copy i of lineitem IS the base with shifted keys."""

    def build():
        import pyarrow.parquet as pq

        sf1 = pq.read_table(
            f"{ctx.sf}/lineitem.parquet",
            columns=["l_orderkey", "l_partkey", "l_suppkey"],
        )
        base = pq.read_table(
            f"{SF01}/lineitem.parquet",
            columns=["l_orderkey", "l_partkey", "l_suppkey"],
        )
        nb = base.num_rows
        if sf1.num_rows != _COPIES * nb:
            return False
        ok = np.array(sf1.column("l_partkey"))[nb : 2 * nb] - np.array(
            base.column("l_partkey")
        )
        ok2 = np.array(sf1.column("l_orderkey"))[nb : 2 * nb] - np.array(
            base.column("l_orderkey")
        )
        return bool((ok == 20_000).all() and (ok2 == 150_000).all())

    return ctx._memo("replicated_premise", build)


@check("triangle_count")
def _c_triangle(ctx):
    if ctx.sf == SF01 or not _assert_replicated_premise(ctx):
        return {
            "method": "replication",
            "pass": False,
            "err": "sf dir is not a 10x FK-shifted replica of sf0.1",
        }
    base_cols, base_rows = ctx.base().spark_rows("triangle_count")
    cols, rows = ctx.spark_rows("triangle_count")
    b, g = base_rows[0].asDict(), rows[0].asDict()
    expected = {k: _COPIES * v for k, v in b.items()}
    return {
        "method": "replication",
        "criteria": "10 disjoint isomorphic copies => (n_nodes, n_edges,"
        " n_triangles) = 10x the sf0.1 result (premise spot-verified)",
        "pass": g == expected,
        "sf1": g,
        "expected": expected,
    }


@check("kcore_peel")
def _c_kcore(ctx):
    if ctx.sf == SF01 or not _assert_replicated_premise(ctx):
        return {
            "method": "replication",
            "pass": False,
            "err": "sf dir is not a 10x FK-shifted replica of sf0.1",
        }
    base_cols, base_rows = ctx.base().spark_rows("kcore_peel")
    cols, rows = ctx.spark_rows("kcore_peel")
    expected = set()
    for r in (r.asDict() for r in base_rows):
        for i in range(_COPIES):
            expected.add(
                (r["node"] + i * _SHIFT["part"], r["core_degree"], r["converged"])
            )
    got = {(r["node"], r["core_degree"], r["converged"]) for r in rows}
    return {
        "method": "replication",
        "criteria": "survivor set = sf0.1 survivors replicated with"
        " partkey+i*20000, identical core degrees and converged flag",
        "pass": got == expected,
        "n_sf1": len(got),
        "n_expected": len(expected),
        "diff_sample": [str(x) for x in sorted(got ^ expected)[:5]],
    }


def _shift_node_label(label: str, i: int) -> str:
    if label.startswith("c"):
        return f"c{int(label[1:]) + i * _SHIFT['customer']}"
    return f"s{int(label[1:]) + i * _SHIFT['supplier']}"


@check("pagerank_3iter")
def _c_pagerank(ctx):
    if ctx.sf == SF01 or not _assert_replicated_premise(ctx):
        return {
            "method": "replication",
            "pass": False,
            "err": "sf dir is not a 10x FK-shifted replica of sf0.1",
        }
    base_cols, base_rows = ctx.base().spark_rows("pagerank_3iter")
    cols, rows = ctx.spark_rows("pagerank_3iter")
    base = [(r["node"], r["rank"]) for r in base_rows]  # top-20 at sf0.1
    # each sf0.1 node appears 10x at sf~1 with shifted labels; the sf~1
    # top-20 is the first 20 of the replicated list sorted by
    # (rank desc, label asc).  Deriving it only needs the sf0.1 top-2
    # distinct nodes (2 x 10 >= 20) — require strict rank separation
    # from rank 3 so the cut is unambiguous.
    if len(base) >= 3 and base[1][1] == base[2][1]:
        replicated = None  # ambiguous cut; fall back to multiset check
    else:
        replicated = []
        for label, rank in base[:2]:
            for i in range(_COPIES):
                replicated.append((_shift_node_label(label, i), rank))
        replicated.sort(key=lambda t: (-t[1], t[0]))
        replicated = replicated[:20]
    got = [(r["node"], r["rank"]) for r in rows]
    got_sorted = sorted(got, key=lambda t: (-t[1], t[0]))
    if replicated is not None:
        ok = got_sorted == replicated
        detail = {"expected_head": replicated[:3], "got_head": got_sorted[:3]}
    else:
        from collections import Counter

        exp_ranks = Counter()
        for _, rank in base[:2]:
            exp_ranks[rank] += _COPIES
        ok = Counter(r for _, r in got) == exp_ranks
        detail = {"note": "rank-2/3 tie at sf0.1; multiset check"}
    return {
        "method": "replication",
        "criteria": "top-20 = sf0.1 top-2 nodes x 10 label-shifted copies,"
        " ordered by (rank desc, label) — integer ranks replicate exactly",
        "pass": bool(ok),
        **detail,
    }


def main() -> int:
    args = sys.argv[1:]
    sf = SF1
    out_path = None
    if "--sf" in args:
        i = args.index("--sf")
        sf = args[i + 1]
        args = args[:i] + args[i + 2 :]
    if "--out" in args:
        i = args.index("--out")
        out_path = args[i + 1]
        args = args[:i] + args[i + 2 :]
    names = args or list(CHECKS)
    ctx = Ctx(sf)
    results = {}
    for n in names:
        fn = CHECKS.get(n)
        if fn is None:
            print(f"{n:32s} SKIP (no check defined)")
            continue
        try:
            r = fn(ctx)
        except Exception as e:  # noqa: BLE001 - record and continue
            import traceback

            traceback.print_exc()
            r = {"method": "error", "pass": False, "err": f"{type(e).__name__}: {e}"}
        results[n] = r
        print(f"{n:32s} {'OK ' if r['pass'] else 'FAIL'} {r['method']}")
    n_pass = sum(1 for r in results.values() if r["pass"])
    print(json.dumps({"n": len(results), "n_pass": n_pass}))
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(
                {
                    "sf": sf,
                    "n": len(results),
                    "n_pass": n_pass,
                    "results": {k: results[k] for k in sorted(results)},
                },
                fh,
                indent=1,
            )
    if ctx._spark is not None:
        ctx._spark.stop()
    return 0 if n_pass == len(results) else 1


if __name__ == "__main__":
    raise SystemExit(main())
