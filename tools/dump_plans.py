"""Dump `explain("formatted")` of named registry entries to files.

Usage: python tools/dump_plans.py OUT_DIR SUFFIX q1 [q2 ...]
    [REPO=/root/repo] [SF=/root/testdata/sf0.1]

Writes OUT_DIR/<query>_<SUFFIX>.txt.  REPO selects which checkout's
__spark_entry__ builds the plan (run it from a worktree for "before"
plans).  Streaming entries are skipped with a note (their plans are
per-micro-batch; see tools/profile_streaming.py durationMs evidence).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout


def main() -> int:
    out_dir, suffix, *names = sys.argv[1:]
    repo = os.environ.get("REPO", "/root/repo")
    sf_dir = os.environ.get("SF", "/root/testdata/sf0.1")
    sys.path.insert(0, repo)
    import __spark_entry__ as entrymod
    from trainee_scala_module_8_kafka_streaming_etl_pipeline_spark.session import (
        build_session,
    )

    spark = build_session(app_name="dump_plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        if name.startswith("streaming_"):
            with open(path, "w") as fh:
                fh.write(
                    "streaming entry: plan is per-micro-batch; see the\n"
                    "durationMs profiles in OPTIMIZATION_r11.md\n"
                )
            continue
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {path}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
