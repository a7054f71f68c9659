"""Itemize the per-StreamingQuery fixed floor below durationMs
granularity (round 12, VERDICT ask #4): a minimal availableNow query
(1-row parquet source, pass-through projection, memory sink) is timed
phase by phase — writer construction, ``start()`` (checkpoint dir +
offset-log init + stream thread launch), ``awaitTermination()`` (the
micro-batch itself plus end-detection), and the post-stop teardown —
so the irreducible engine cost per streaming entry is a measured
number, not a guess.  Run AFTER a warmup query so JIT/codegen of the
streaming machinery is amortized, mirroring the bench's steady state.

Usage: python tools/profile_stream_floor.py [reps]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from trainee_scala_module_8_kafka_streaming_etl_pipeline_spark.session import (
    build_session,
)


def one_run(spark, src: str, name: str) -> dict[str, float]:
    t = {}
    t0 = time.perf_counter()
    stream = spark.readStream.schema("id long").parquet(src)
    writer = (
        stream.select("id")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
    )
    t1 = time.perf_counter()
    q = writer.start()
    t2 = time.perf_counter()
    q.awaitTermination()
    t3 = time.perf_counter()
    spark.catalog.dropTempView(name)
    t4 = time.perf_counter()
    t["build"] = t1 - t0
    t["start"] = t2 - t1
    t["await"] = t3 - t2
    t["teardown"] = t4 - t3
    t["total"] = t4 - t0
    # per-batch engine components from the progress log
    for p in q.recentProgress:
        for k, v in (p.get("durationMs") or {}).items():
            t[f"durationMs.{k}"] = t.get(f"durationMs.{k}", 0.0) + v / 1000.0
    return t


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = build_session(app_name="stream_floor")
    spark.sparkContext.setLogLevel("ERROR")
    src = tempfile.mkdtemp(prefix="floor_src_")
    spark.range(1).write.mode("overwrite").parquet(src)

    one_run(spark, src, "floor_warmup")  # JIT/codegen warmup
    agg: dict[str, float] = {}
    for i in range(reps):
        for k, v in one_run(spark, src, f"floor_{i}").items():
            agg[k] = min(agg.get(k, float("inf")), v)
    print(f"min-of-{reps} per phase (seconds):")
    for k in sorted(agg):
        print(f"  {k:28s} {agg[k]:.3f}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
