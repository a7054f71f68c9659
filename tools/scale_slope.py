"""Measure sf0.1 -> sf~1 wall-clock slopes for the most expensive
headline queries (SCALING.md's second decade of scale; VERDICT r7 ask
#4).  Generates nothing — run tools/scale_gen.py first.

Method mirrors bench.py: one untimed warmup pass per sf, then
min-of-N timed passes with clearCache() + forced GC between queries.
10x data -> slope ~= the query's data exponent (fixed-cost-dominated
queries land well under 10; a slope >> 10 flags a super-linear plan).

Usage: python tools/scale_slope.py [passes] [query ...]
Writes SCALE_SLOPE.json next to the repo root.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod
from bench import build_session

SF01 = "/root/testdata/sf0.1"
SF1 = os.environ.get("SCALE_OUT", "/root/repo/.scale/sf1")

# the bench top by r7/r8 cost, per VERDICT r7 ask #4
DEFAULT_QUERIES = [
    "flagship_shipped_orders",
    "interval_join_bucketed",
    "triangle_count",
    "pagerank_3iter",
    "kcore_peel",
    "minhash_near_dups",
    "simhash_near_dups",
    "dup_ngram_coverage",
    "corpus_clean",
    "text_stats",
]


def bench_dir(spark, queries, names, sf_dir, passes):
    timings: dict[str, float] = {}
    for name in names:  # warmup (JIT, codegen, memo build)
        queries[name](spark, sf_dir).collect()
    spark.catalog.clearCache()
    for _ in range(passes):
        for name in names:
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            queries[name](spark, sf_dir).collect()
            dt = time.perf_counter() - t0
            timings[name] = min(timings.get(name, dt), dt)
        spark.catalog.clearCache()
    return timings


def main() -> int:
    args = sys.argv[1:]
    passes = int(args[0]) if args and args[0].isdigit() else 2
    names = [a for a in args if not a.isdigit()] or DEFAULT_QUERIES
    spark = build_session(
        app_name="scale_slope",
        extra_conf={"spark.driver.memory": "24g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()

    small = bench_dir(spark, queries, names, SF01, passes)
    big = bench_dir(spark, queries, names, SF1, passes)
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALE_SLOPE.json",
    )
    # Merge into the existing table so a subset re-measurement (after a
    # plan change) refreshes only its own rows.
    out = {"sf_small": SF01, "sf_big": SF1, "passes": passes, "queries": {}}
    if os.path.exists(path):
        with open(path) as fh:
            prior = json.load(fh)
        out["queries"] = prior.get("queries", {})
    out["queries"].update(
        {
            n: {
                "sf0.1_sec": round(small[n], 3),
                "sf1_sec": round(big[n], 3),
                "slope_10x": round(big[n] / small[n], 2),
            }
            for n in names
        }
    )
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(json.dumps(out["queries"], indent=1, sort_keys=True))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
