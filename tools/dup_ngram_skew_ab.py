"""Same-session A/B of dup_ngram_coverage's two df plans on a planted
boilerplate-gram corpus (round-10 VERDICT ask #1 "done" evidence).

Plants ONE 5-gram into a configurable share of a synthetic corpus,
writes it to parquet (file-backed, above the probe floor, so the auto
gate runs its real path), then times the window form vs the two-level
aggregate form with bench.py's methodology (untimed warmup, min-of-N,
forced GC, cache clear).  Also times the sampled skew probe itself and
reports which plan the auto gate selects.

Usage: python tools/dup_ngram_skew_ab.py [N_DOCS=3000000] [SHARE=2]
       [PASSES=3] — prints one JSON line and appends nothing; results
       are recorded in SCALING.md by hand.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry
from pyspark.sql import functions as F
from trainee_scala_module_8_kafka_streaming_etl_pipeline_spark.session import build_session


def planted_corpus(spark, n_docs: int, share: int):
    """1/share of docs ARE the boilerplate 5-gram (pure repeated
    boilerplate — the pathological corpus the gate exists for: the
    planted gram's occ rows are a constant fraction of the WHOLE occ
    table, all landing in one window partition); the rest each carry
    one unique 5-gram."""
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.when(
            F.col("id") % share == 0,
            F.lit("alpha beta gamma delta epsilon"),
        )
        .otherwise(
            F.format_string("a%d b%d c%d d%d e%d", "id", "id", "id", "id", "id")
        )
        .alias("text"),
    )


def main() -> int:
    n_docs = int(os.environ.get("N_DOCS", "8000000"))
    share = int(os.environ.get("SHARE", "2"))
    passes = int(os.environ.get("PASSES", "3"))
    spark = build_session(
        app_name="dup_ngram_skew_ab",
        extra_conf={"spark.driver.memory": "16g"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    tmp = tempfile.mkdtemp(prefix="dupngram_ab_", dir="/root/repo/.tmp")
    path = os.path.join(tmp, "planted.parquet")
    try:
        planted_corpus(spark, n_docs, share).write.parquet(path)
        d = spark.read.parquet(path)
        scan_mb = round((entry._scan_bytes(d) or 0) / 2**20, 1)
        d.count()  # touch the scan so the probe timing excludes first-run
        # codegen/IO warmup (the probe is otherwise the session's first job)

        t0 = time.perf_counter()
        skewed = entry._dup_ngram_skewed(d)
        probe_sec = round(time.perf_counter() - t0, 3)
        auto_form = "twolevel" if skewed else "window"

        def run(form: str) -> float:
            frame = entry._dup_ngram_coverage_frame(d, form)
            frame.write.format("noop").mode("overwrite").save()  # warmup
            best = float("inf")
            for _ in range(passes):
                spark.catalog.clearCache()
                spark.sparkContext._jvm.System.gc()
                t0 = time.perf_counter()
                entry._dup_ngram_coverage_frame(d, form).write.format(
                    "noop"
                ).mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            return round(best, 3)

        window_sec = run("window")
        twolevel_sec = run("twolevel")
        print(json.dumps({
            "n_docs": n_docs,
            "planted_share": round(1 / share, 3),
            "scan_mb": scan_mb,
            "probe_sec": probe_sec,
            "probe_detected_skew": skewed,
            "auto_form": auto_form,
            "window_sec": window_sec,
            "twolevel_sec": twolevel_sec,
            "twolevel_over_window": round(twolevel_sec / window_sec, 2),
            "passes": passes,
        }))
        return 0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
