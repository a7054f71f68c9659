"""Time the individual sub-steps of the keyed-upsert foreachBatch merge
while the flagship streaming entry runs — splits addBatch into
batch-materialization (localCheckpoint) / empty probe / state read /
parquet write / vacuum, which the durationMs profile
(tools/profile_streaming.py) cannot see.

Usage: python tools/profile_upsert_internals.py [entry ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from pyspark.sql import DataFrame
from trainee_scala_module_8_kafka_streaming_etl_pipeline_spark.session import (
    build_session,
)
from trainee_scala_module_8_kafka_streaming_etl_pipeline_spark.streaming import upsert

LOG: list[tuple[str, float]] = []


def timed(label, fn):
    def wrap(*a, **kw):
        t0 = time.perf_counter()
        out = fn(*a, **kw)
        LOG.append((label, time.perf_counter() - t0))
        return out

    return wrap


def main() -> int:
    names = [a for a in sys.argv[1:] if not a.startswith("-")] or [
        "streaming_flagship_golden"
    ]
    spark = build_session(
        app_name="profile_upsert", extra_conf={"spark.driver.memory": "16g"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    sf_dir = os.environ.get("SF", "/root/testdata/sf0.1")

    upsert.read_state = timed("read_state", upsert.read_state)
    upsert.vacuum_versions = timed("vacuum", upsert.vacuum_versions)
    upsert.write_version = timed("write_version", upsert.write_version)
    DataFrame.isEmpty = timed("isEmpty", DataFrame.isEmpty)
    DataFrame.localCheckpoint = timed("localCheckpoint", DataFrame.localCheckpoint)

    for name in names:
        fn = qs[name]
        # warmup (codegen/JIT)
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        LOG.clear()
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        print(f"=== {name}: wall={wall:.3f}")
        for label, sec in LOG:
            print(f"  {sec*1000:8.1f} ms  {label}")
        LOG.clear()
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
