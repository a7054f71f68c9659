"""Registry-wide degenerate-input robustness sweep.

Round 4 ran four *manual* degenerate sweeps and each found a real crash
(ANSI divide-by-zero on zero-variance / zero-norm / zero-denominator
inputs), so the class was clearly not exhausted.  This harness runs
EVERY `queries()` entry against systematically degenerate variants of
the ten test tables and asserts the plan neither fails to build nor
fails to execute.  NULL / empty outputs are fine — an exception is the
only failure.  Empty-input robustness is reference behavior, not
gold-plating: the reference's own live-update demo starts from
near-empty state (/root/reference/README.md:654-679).

Variants (built once from sf0.001 with pyarrow, schema forced nullable):

- ``empty``     — every table with 0 rows.
- ``single``    — every table cut to its first row (one group, n=1
                  statistics, self-join singletons).
- ``nullvals``  — first 40 rows, all measure-ish columns all-NULL
                  (acctbal/price/discount/value/props/text/embedding) —
                  the "missing measurement" shape ADVICE caught in
                  winsorized_mean.
- ``onegroup``  — first 40 rows, every categorical grouping column
                  collapsed to a single constant value (one group,
                  zero between-group variance).
- ``constvals`` — first 40 rows, every measure column a constant and
                  every timestamp a single instant (zero variance, zero
                  spans, all-identical documents and embeddings).

Usage:
    python tools/degenerate.py [--variants v1,v2] [--queries q1 q2 ...]
                               [--out DEGEN.json] [--regen]

Writes the report incrementally after every variant so a crashed or
interrupted sweep still leaves a usable artifact.
"""

from __future__ import annotations

import json
import os
import shutil
import sys

sys.path.insert(0, "/root/repo")

import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.001"
WORK = "/tmp/spark_degen"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

# measure-ish columns: NULLed in `nullvals`, constant in `constvals`
MEASURES = {
    "customer": ["c_acctbal"],
    "supplier": ["s_acctbal"],
    "part": ["p_retailprice", "p_size"],
    "orders": ["o_totalprice"],
    "lineitem": ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
    "events": ["value", "props"],
    "documents": ["text", "n_chars"],
    "embeddings": ["embedding"],
}

# categorical grouping columns: collapsed to one value in `onegroup`
GROUPS = {
    "region": ["r_name"],
    "nation": ["n_name"],
    "customer": ["c_mktsegment"],
    "part": ["p_brand", "p_type"],
    "orders": ["o_orderstatus", "o_orderpriority"],
    "lineitem": ["l_returnflag", "l_linestatus"],
    "events": ["event_type", "user_id"],
    "documents": ["lang", "source"],
    "embeddings": ["label"],
}

# timestamp columns: pinned to one instant in `constvals` and `onets`
TIMESTAMPS = {
    "orders": ["o_orderdate"],
    "lineitem": ["l_shipdate"],
    "events": ["ts"],
}

# join/partition key columns: collapsed to ONE value in `onekey` (max
# skew — every row lands in a single hash partition, self-joins go
# quadratic, salting decisions face their worst case) and made ALL
# DISTINCT in `allkeysdistinct` (every group size 1 — window frames,
# n-1 denominators, and lead/lag all hit their degenerate edge)
KEYS = {
    "customer": ["c_custkey", "c_nationkey"],
    "supplier": ["s_suppkey", "s_nationkey"],
    "part": ["p_partkey"],
    "orders": ["o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["user_id"],
    "embeddings": ["label"],
}

VARIANTS = [
    # value-shaped (round 5)
    "empty", "single", "nullvals", "onegroup", "constvals",
    # shape-adversarial (round 6)
    "onekey", "allkeysdistinct", "onets", "wsdocs", "zerovec",
    # all numeric measures exactly 0 (round 6 continuation): zero sums
    # and zero corpus means hit every x/sum(x) seasonal-index-style
    # divide — the shape that caught the dow_seasonality ANSI crash
    # the constvals variant (constant = 1) could not
    "zerovals",
]
SAMPLE_ROWS = 40


def _nullable(tbl: pa.Table) -> pa.Table:
    schema = pa.schema([f.with_nullable(True) for f in tbl.schema])
    return tbl.cast(schema)


def _first_valid(col: pa.ChunkedArray):
    for v in col.to_pylist():
        if v is not None:
            return v
    return None


def _const_for(field: pa.Field, col: pa.ChunkedArray):
    """A deterministic constant of the column's type."""
    t = field.type
    if pa.types.is_floating(t):
        return 1.0
    if pa.types.is_integer(t):
        return 1
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "the same document text in every row"
    # lists (embedding), timestamps, anything else: first non-null value
    return _first_valid(col)


def _replace(tbl: pa.Table, name: str, values) -> pa.Table:
    i = tbl.schema.get_field_index(name)
    field = tbl.schema.field(i)
    arr = pa.array(values, type=field.type)
    return tbl.set_column(i, field.with_nullable(True), arr)


def _make_variant(variant: str, tbl: pa.Table, table_name: str) -> pa.Table:
    tbl = _nullable(tbl)
    if variant == "empty":
        return tbl.slice(0, 0)
    if variant == "single":
        return tbl.slice(0, 1)
    tbl = tbl.slice(0, SAMPLE_ROWS)
    n = tbl.num_rows
    if variant == "nullvals":
        for c in MEASURES.get(table_name, []):
            tbl = _replace(tbl, c, [None] * n)
        return tbl
    if variant == "onegroup":
        for c in GROUPS.get(table_name, []):
            v = _first_valid(tbl.column(c))
            tbl = _replace(tbl, c, [v] * n)
        return tbl
    if variant == "constvals":
        for c in MEASURES.get(table_name, []):
            i = tbl.schema.get_field_index(c)
            v = _const_for(tbl.schema.field(i), tbl.column(c))
            tbl = _replace(tbl, c, [v] * n)
        for c in TIMESTAMPS.get(table_name, []):
            v = _first_valid(tbl.column(c))
            tbl = _replace(tbl, c, [v] * n)
        return tbl
    if variant == "onekey":  # max skew: one hash partition gets everything
        for c in KEYS.get(table_name, []):
            v = _first_valid(tbl.column(c))
            tbl = _replace(tbl, c, [v] * n)
        return tbl
    if variant == "allkeysdistinct":  # every group size 1
        for c in KEYS.get(table_name, []) + GROUPS.get(table_name, []):
            i = tbl.schema.get_field_index(c)
            t = tbl.schema.field(i).type
            if pa.types.is_integer(t):
                vals = list(range(n))
            elif pa.types.is_string(t) or pa.types.is_large_string(t):
                vals = [f"v{j}" for j in range(n)]
            else:
                continue
            tbl = _replace(tbl, c, vals)
        return tbl
    if variant == "onets":  # all timestamps one instant, values real
        for c in TIMESTAMPS.get(table_name, []):
            v = _first_valid(tbl.column(c))
            tbl = _replace(tbl, c, [v] * n)
        return tbl
    if variant == "wsdocs":  # whitespace-only / unicode-only corpora
        if table_name == "documents":
            vals = [
                "  \t\n   " if j % 2 == 0 else "日本語のテキスト、トークン化境界なし"
                for j in range(n)
            ]
            tbl = _replace(tbl, "text", vals)
            tbl = _replace(tbl, "n_chars", [len(v) for v in vals])
        return tbl
    if variant == "zerovals":  # every numeric measure exactly 0
        for c in MEASURES.get(table_name, []):
            i = tbl.schema.get_field_index(c)
            t = tbl.schema.field(i).type
            if pa.types.is_floating(t):
                tbl = _replace(tbl, c, [0.0] * n)
            elif pa.types.is_integer(t):
                tbl = _replace(tbl, c, [0] * n)
        return tbl
    if variant == "zerovec":  # zero-norm embedding corpus
        if table_name == "embeddings":
            first = _first_valid(tbl.column("embedding"))
            dim = len(first) if first else 64
            tbl = _replace(tbl, "embedding", [[0.0] * dim] * n)
        return tbl
    raise ValueError(f"unknown variant {variant}")


def build_variants(variants, regen: bool = False) -> dict[str, str]:
    dirs = {}
    for variant in variants:
        vdir = os.path.join(WORK, variant)
        dirs[variant] = vdir
        if os.path.isdir(vdir) and not regen:
            continue
        shutil.rmtree(vdir, ignore_errors=True)
        os.makedirs(vdir)
        for t in TABLES:
            tbl = pq.read_table(os.path.join(SRC, f"{t}.parquet"))
            out = _make_variant(variant, tbl, t)
            pq.write_table(out, os.path.join(vdir, f"{t}.parquet"))
    return dirs


def main() -> int:
    args = sys.argv[1:]
    variants = list(VARIANTS)
    out_path = "DEGEN.json"
    only: list[str] = []
    regen = False
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--variants":
            variants = args[i + 1].split(",")
            i += 2
        elif a == "--out":
            out_path = args[i + 1]
            i += 2
        elif a == "--regen":
            regen = True
            i += 1
        else:
            only.append(a)
            i += 1
    for v in variants:
        if v not in VARIANTS:
            print(f"unknown variant {v}; choose from {VARIANTS}", file=sys.stderr)
            return 2

    dirs = build_variants(variants, regen=regen)

    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .appName("degenerate-sweep")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs = entrymod.queries()
    names = [n for n in qs if not only or n in only]
    report: dict = {
        "source": SRC,
        "sample_rows": SAMPLE_ROWS,
        "variants": variants,
        "n_queries": len(names),
        "method": (
            "each queries() entry executed (.collect) against degenerate"
            " rebuilds of all ten tables; failure = any raised exception;"
            " NULL/empty outputs pass"
        ),
        "results": {},
    }

    def flush():
        tmp = out_path + ".tmp"
        fails = sorted(
            f"{v}:{q}"
            for v, qmap in report["results"].items()
            for q, r in qmap.items()
            if r != "ok"
        )
        report["n_fail"] = len(fails)
        report["failures"] = fails
        with open(tmp, "w") as fh:
            json.dump(report, fh, indent=1)
        os.replace(tmp, out_path)

    for variant in variants:
        vdir = dirs[variant]
        vres: dict[str, str] = {}
        report["results"][variant] = vres
        for k, name in enumerate(names):
            try:
                rows = qs[name](spark, vdir).collect()
                vres[name] = "ok"
            except Exception as e:  # noqa: BLE001 — the sweep's whole point
                msg = f"{type(e).__name__}: {e}"
                vres[name] = msg[:400]
                print(f"[{variant}] {name} FAIL {msg[:200]}", flush=True)
            if (k + 1) % 25 == 0:
                print(
                    f"[{variant}] {k + 1}/{len(names)} done,"
                    f" {sum(1 for r in vres.values() if r != 'ok')} failing",
                    flush=True,
                )
                flush()
        flush()
        print(
            f"[{variant}] complete: {sum(1 for r in vres.values() if r != 'ok')}"
            f"/{len(names)} failing",
            flush=True,
        )
    print(json.dumps({"n_fail": report["n_fail"], "failures": report["failures"][:40]}))
    spark.stop()
    return 1 if report["n_fail"] else 0


if __name__ == "__main__":
    sys.exit(main())
