"""SparkSession factory tuned for this engine.

Defaults are chosen for correctness-at-scale first:

- **AQE on** (plus skew-join handling): at 100 TB the static plan is
  always wrong somewhere; AQE re-plans shuffles at runtime, coalesces
  small partitions and splits skewed ones.
- **Session time zone UTC**: event-time semantics must not depend on the
  host TZ (the reference parses naive event timestamps,
  /root/reference/README.md:413-414).
- **Arrow enabled**: every Python<->JVM hop is Arrow-batched, so the few
  Pandas UDFs we do use (multimodal stubs) aren't row-at-a-time.
- **Broadcast threshold 64 MB**: the reference's enrichment join
  (stream-table, README.md:448-458) has a small dimension side; at scale
  the customer dim of a 100 TB fact table still fits executor memory and
  broadcasting removes the big-side shuffle entirely.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_LOCAL_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def build_session(
    app_name: str = "kafka-etl-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's tuned defaults.

    ``shuffle_partitions`` defaults to the local core count — on a real
    cluster set it (or rely on AQE coalescing) to ~2-3x total cores.
    """
    master = master or f"local[{_LOCAL_CPUS}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(_LOCAL_CPUS) if _LOCAL_CPUS.isdigit() else 32

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # parallelismFirst stays at its default (true): measured A/B at
        # sf0.1 showed byte-sized coalescing (`parallelismFirst=false`)
        # starves CPU-bound post-shuffle stages (triangle_count's
        # array-intersect pass regressed 5.3s -> 7.4s) while saving
        # nothing on scan-bound entries — this engine's small shuffles
        # are compute-heavy, not task-launch-heavy.
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # driver test data carries INT64 TIMESTAMP(NANOS) columns; see
        # catalog.load(), which also sets this at runtime for
        # driver-owned sessions
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.sql.shuffle.spill.compress", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
