"""Synthesize an sf~1 corpus (10x sf0.1) for the local scale-slope
measurement (SCALING.md) — the driver only ships sf<=0.1, so the
second decade of scale is generated here with the same table shapes
and generator rules as TESTDATA.md's corpus:

- TPC-H-ish tables replicate with FK-CONSISTENT key shifts: copy ``i``
  adds ``i * |base keys|`` to every key and foreign key, so join
  fan-outs, key cardinalities, and value distributions scale exactly
  linearly (copy 0 is the original data, preserving all planted
  structure).  nation/region stay fixed, as in TPC-H.
- events: 10x rows in the SAME 30-day window (stream density grows
  with corpus size; the user population scales 10x).
- documents: copies regenerate TEXT by sampling the empirical word
  distribution of the base corpus with the base length distribution,
  then plant per-copy exact-dup and near-dup pairs at the base rate —
  verbatim replication would plant every doc in a 10-way dup cluster
  and make every dedup slope quadratic BY DATA, not by plan.
- embeddings: per-label gaussian resample (empirical centroid/std per
  label), keeping the 10-cluster structure without cross-copy
  near-identical vectors.

Deterministic (seed 42).  Output: $SCALE_OUT (default
/root/repo/.scale/sf1) — gitignored.  Usage:
  python tools/scale_gen.py [factor]            # sf~1 (factor 10)
  SCALE_OUT=/root/repo/.scale/sf10 python tools/scale_gen.py 100
Big tables stream copy-by-copy through a ParquetWriter; factor > 10
switches document synthesis to one vectorized token draw per copy
(identical construction, hours -> seconds at 99 copies).
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

BASE = "/root/testdata/sf0.1"
OUT = os.environ.get("SCALE_OUT", "/root/repo/.scale/sf1")

# (table, key column -> base cardinality) — every key/FK shifts by
# copy_index * base_cardinality so referential integrity holds per copy
_SHIFTS = {
    "customer": {"c_custkey": 15_000},
    "supplier": {"s_suppkey": 1_000},
    "part": {"p_partkey": 20_000},
    "orders": {"o_orderkey": 150_000, "o_custkey": 15_000},
    "lineitem": {
        "l_orderkey": 150_000,
        "l_partkey": 20_000,
        "l_suppkey": 1_000,
    },
    "events": {"event_id": 100_000, "user_id": 1_500},
}


def _read(table: str) -> pa.Table:
    return pq.read_table(f"{BASE}/{table}.parquet")


def _write(table: str, tbl: pa.Table) -> None:
    os.makedirs(OUT, exist_ok=True)
    pq.write_table(tbl, f"{OUT}/{table}.parquet")
    print(f"{table}: {tbl.num_rows} rows")


def _shift_replicate(table: str, factor: int) -> None:
    """Write base + (factor-1) key-shifted copies INCREMENTALLY — at
    factor 100 (the sf~10 decade) materializing all copies before one
    concat would hold ~10 GB of arrow buffers."""
    base = _read(table)
    shifts = _SHIFTS[table]
    os.makedirs(OUT, exist_ok=True)
    n = 0
    with pq.ParquetWriter(f"{OUT}/{table}.parquet", base.schema) as w:
        for i in range(factor):
            if i == 0:
                copy = base
            else:
                cols = []
                for name in base.column_names:
                    col = base.column(name)
                    if name in shifts:
                        col = pa.compute.add(col, i * shifts[name])
                    cols.append(col)
                copy = pa.table(cols, names=base.column_names)
            w.write_table(copy)
            n += copy.num_rows
    print(f"{table}: {n} rows")


def _scale_documents(factor: int) -> None:
    con = duckdb.connect()
    base = con.sql(f"select * from '{BASE}/documents.parquet'").arrow()
    texts = base.column("text").to_pylist()
    langs = base.column("lang").to_pylist()
    sources = base.column("source").to_pylist()
    n = len(texts)
    # empirical word distribution + per-doc word-length distribution
    vocab: dict[str, int] = {}
    lengths = []
    for t in texts:
        words = t.split()
        lengths.append(len(words))
        for w in words:
            vocab[w] = vocab.get(w, 0) + 1
    words_arr = np.array(list(vocab.keys()))
    probs = np.array(list(vocab.values()), dtype="float64")
    probs /= probs.sum()
    dup_pairs = n - len(set(texts))  # planted exact-dup mass per copy

    # factor <= 10 keeps the original per-doc sampling loop so the
    # committed sf~1 corpus regenerates byte-identically; the third
    # decade (factor 100) draws each copy's full token mass in ONE
    # rng.choice call (the per-doc loop rebuilds the vocab cumsum 5000x
    # per copy — hours at 99 copies, seconds vectorized).
    vectorized = factor > 10

    os.makedirs(OUT, exist_ok=True)
    writer = None
    for i in range(factor):
        if i == 0:
            copy = base
        else:
            rng = np.random.default_rng(42 + i)
            lens = rng.choice(lengths, size=n)
            if vectorized:
                flat = rng.choice(words_arr, size=int(lens.sum()), p=probs)
                bounds = np.cumsum(lens)[:-1]
                new_texts = [
                    " ".join(chunk) for chunk in np.split(flat, bounds)
                ]
            else:
                new_texts = [
                    " ".join(rng.choice(words_arr, size=ln, p=probs))
                    for ln in lens
                ]
            # plant the base corpus's dup rate within this copy: exact
            # dups, plus the same number of 2-word-mutated near dups
            for _ in range(dup_pairs):
                a, b = rng.integers(0, n, size=2)
                new_texts[a] = new_texts[b]
            for _ in range(dup_pairs):
                a, b = rng.integers(0, n, size=2)
                w = new_texts[b].split()
                for _ in range(min(2, len(w))):
                    w[int(rng.integers(0, len(w)))] = str(
                        words_arr[int(rng.integers(0, len(words_arr)))]
                    )
                new_texts[a] = " ".join(w)
            copy = pa.table(
                {
                    "doc_id": pa.array(
                        np.arange(n, dtype="int64") + i * n
                    ),
                    "text": pa.array(new_texts),
                    "lang": base.column("lang"),
                    "source": base.column("source"),
                    "n_chars": pa.array(
                        np.array([len(t) for t in new_texts], dtype="int64")
                    ),
                }
            )
        if writer is None:
            writer = pq.ParquetWriter(f"{OUT}/documents.parquet", copy.schema)
        writer.write_table(copy)
    writer.close()
    print(f"documents: {n * factor} rows")
    del langs, sources


def _scale_embeddings(factor: int) -> None:
    base = _read("embeddings")
    vecs = np.array(base.column("embedding").to_pylist(), dtype="float32")
    labels = np.array(base.column("label").to_pylist())
    n, dim = vecs.shape
    stats = {
        lab: (
            vecs[labels == lab].mean(axis=0),
            vecs[labels == lab].std(axis=0),
        )
        for lab in np.unique(labels)
    }
    os.makedirs(OUT, exist_ok=True)
    writer = None
    for i in range(factor):
        if i == 0:
            copy = base
        else:
            rng = np.random.default_rng(1042 + i)
            new = np.empty_like(vecs)
            for lab, (mu, sd) in stats.items():
                mask = labels == lab
                new[mask] = mu + sd * rng.standard_normal(
                    (int(mask.sum()), dim)
                ).astype("float32")
            copy = pa.table(
                {
                    "vec_id": pa.array(np.arange(n, dtype="int64") + i * n),
                    "embedding": pa.array(
                        [v for v in new.astype("float32")],
                        type=pa.list_(pa.float32()),
                    ),
                    "label": base.column("label"),
                }
            )
        if writer is None:
            writer = pq.ParquetWriter(f"{OUT}/embeddings.parquet", copy.schema)
        writer.write_table(copy)
    writer.close()
    print(f"embeddings: {n * factor} rows")


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    for table in ("region", "nation"):  # fixed dimensions, as in TPC-H
        _write(table, _read(table))
    for table in _SHIFTS:
        _shift_replicate(table, factor)
    _scale_documents(factor)
    _scale_embeddings(factor)


if __name__ == "__main__":
    main()
