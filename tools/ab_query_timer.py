"""Time a subset of `queries()` entries from an arbitrary checkout of
this repo — the per-query half of an interleaved A/B (round 11,
r10 VERDICT ask #6: attribute bench drift to host vs code).

Runs in its own process so two checkouts never share a JVM or module
namespace; the caller alternates invocations A/B/A/B in one session
(the repo's noise methodology: only adjacent runs are comparable) and
takes per-query minima per side.

Usage:
    python tools/ab_query_timer.py REPO_DIR SF_DIR query [query ...]
Prints one JSON line: {"repo": ..., "queries": {name: best_sec}}.
Methodology mirrors bench.py: noop-write execution (nothing collected),
one untimed warmup pass, then PASSES (default 2) timed passes, min.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> int:
    repo, sf_dir, *names = sys.argv[1:]
    sys.path.insert(0, repo)
    import __spark_entry__ as entrymod
    from trainee_scala_module_8_kafka_streaming_etl_pipeline_spark.session import (
        build_session,
    )

    passes = int(os.environ.get("PASSES", "2"))
    spark = build_session(
        app_name="ab_query_timer", extra_conf={"spark.driver.memory": "16g"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    out = {}
    for name in names:
        fn = qs[name]
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = float("inf")
        for _ in range(passes):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 3)
    print(json.dumps({"repo": repo, "queries": out}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
