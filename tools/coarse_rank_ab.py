"""Same-session A/B of rank-within-coarse-groups plans on a planted
single-group corpus (round-10 window-skew audit evidence).

The hazard: Window.partitionBy(low-cardinality key) puts each group's
entire row set in ONE task's window buffer, and AQE cannot split a
window partition.  This tool plants the worst case — every row in one
group — and times the single-window plan against
operators/skew.coarse_group_rank's two-pass range-partitioned rank.
Both plans produce identical (rnk, n_le, np); equality is asserted on
a sample before timing.

Usage: N_ROWS=20000000 PASSES=3 python tools/coarse_rank_ab.py
Prints one JSON line; recorded in SCALING.md by hand.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F
from trainee_scala_module_8_kafka_streaming_etl_pipeline_spark.operators import skew
from trainee_scala_module_8_kafka_streaming_etl_pipeline_spark.session import build_session


def main() -> int:
    n_rows = int(os.environ.get("N_ROWS", "20000000"))
    passes = int(os.environ.get("PASSES", "3"))
    spark = build_session(
        app_name="coarse_rank_ab",
        extra_conf={"spark.driver.memory": "24g"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    # one group; values repeat every 1000 ids so rank ties exist
    df = spark.range(n_rows).select(
        F.col("id"),
        F.lit(0).alias("g"),
        F.pmod(F.xxhash64("id"), F.lit(1_000_000)).alias("v"),
    )

    def window_plan(d):
        w = Window.partitionBy("g").orderBy("v")
        return d.select(
            "id", "g", "v",
            F.rank().over(w).alias("rnk"),
            F.count(F.lit(1)).over(w).alias("n_le"),
            F.count(F.lit(1)).over(Window.partitionBy("g")).alias("np"),
        )

    # equality spot-check on a small DETERMINISTIC slice before timing
    # (limit() would sample different rows per execution)
    small = df.filter(F.col("id") < 20_000)
    a = {r.id: (r.rnk, r.n_le, r.np) for r in window_plan(small).collect()}
    b = {
        r.id: (r.rnk, r.n_le, r.np)
        for r in skew.coarse_group_rank(small, ["g"], "v").collect()
    }
    assert a == b, "plans disagree on the sample"

    def run(frame_fn) -> float:
        frame_fn(df).write.format("noop").mode("overwrite").save()  # warmup
        best = float("inf")
        for _ in range(passes):
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            frame_fn(df).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        return round(best, 2)

    win = run(window_plan)
    two = run(lambda d: skew.coarse_group_rank(d, ["g"], "v"))
    print(json.dumps({
        "n_rows": n_rows,
        "groups": 1,
        "window_sec": win,
        "two_pass_sec": two,
        "two_pass_over_window": round(two / win, 3),
        "passes": passes,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
