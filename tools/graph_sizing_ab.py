"""Same-session A/B of the programmatic graph shuffle sizing (round-10
VERDICT ask #2 "done" evidence).

Runs triangle_count / kcore_peel registry entries at a big scale dir
twice per pass — once with wedge_partitions() forced OFF (the pre-r10
plan: every exchange at the session's spark.sql.shuffle.partitions)
and once with the shipped automatic sizing — alternating within one
session so host drift cancels.  min-of-N per arm.

Usage: SF=/root/repo/.scale/sf10 PASSES=3 python tools/graph_sizing_ab.py
Prints one JSON line; results recorded in SCALING.md by hand.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from trainee_scala_module_8_kafka_streaming_etl_pipeline_spark.operators import graph
from trainee_scala_module_8_kafka_streaming_etl_pipeline_spark.session import build_session


def main() -> int:
    sf_dir = os.environ.get("SF", "/root/repo/.scale/sf10")
    passes = int(os.environ.get("PASSES", "3"))
    names = sys.argv[1:] or ["triangle_count", "kcore_peel"]
    spark = build_session(
        app_name="graph_sizing_ab",
        extra_conf={"spark.driver.memory": "24g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    real_sizing = graph.wedge_partitions

    def run(name: str, auto: bool) -> float:
        graph.wedge_partitions = real_sizing if auto else (lambda *_: None)
        try:
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            return time.perf_counter() - t0
        finally:
            graph.wedge_partitions = real_sizing

    out = {"sf": sf_dir, "passes": passes, "queries": {}}
    for name in names:
        run(name, auto=True)  # untimed warmup (page cache, codegen)
        off = on = float("inf")
        for _ in range(passes):
            off = min(off, run(name, auto=False))
            on = min(on, run(name, auto=True))
        out["queries"][name] = {
            "session_width_sec": round(off, 2),
            "auto_sized_sec": round(on, 2),
            "auto_over_session": round(on / off, 3),
        }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
