"""Same-session A/B of the four round-11 window-skew close-outs on
planted worst-case inputs (r10 VERDICT asks #1-#3).

Each case plants the hazard the audit named — a LOW-cardinality (or
empty) window partition key whose partition mass grows with the data —
and times the naive single-window plan against the sliced form from
operators/skew.py.  Equality is asserted on a small full comparison
before timing (a filtered slice would change running-max/cumsum
semantics, so the equality input is a complete small frame, not a
slice of the big one).

Cases:
  ooo    out_of_order_audit  — ONE event type, strictly-preceding
         running max over N rows (coarse_running_max).
  skew   skew_audit          — group-less rank over N distinct keys
         folding into the Gini aggregate (coarse_group_rank, no
         group columns).
  vocab  vocab_coverage      — group-less rank + row-order cumulative
         sum over an N-term vocabulary (sum_col extension).
  snm    sorted_neighborhood_pairs — ONE brand block, lead(1)/lead(2)
         over N distinct names vs sliced rank + neighbor equi-join.

Usage: N_ROWS=20000000 PASSES=3 [CASES=ooo,skew] python tools/window_slice_ab.py
Prints one JSON line per case; recorded in SCALING.md by hand.
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


def _timer(spark, passes):
    def run(df_fn) -> float:
        df_fn().write.format("noop").mode("overwrite").save()  # warmup
        best = float("inf")
        for _ in range(passes):
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            df_fn().write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        return round(best, 2)

    return run


def _events_like(spark, n):
    # one type; ids are the arrival order, values pseudo-random so
    # roughly half the rows are "late" vs the running max
    return spark.range(n).select(
        F.col("id"),
        F.lit("purchase").alias("g"),
        F.pmod(F.xxhash64("id"), F.lit(1_000_000_000)).alias("v"),
    )


def case_ooo(spark, n, run):
    def window_plan(d):
        w = (
            Window.partitionBy("g")
            .orderBy("id")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        return d.select("id", "g", "v", F.max("v").over(w).alias("run_max"))

    def sliced_plan(d):
        return skew.coarse_running_max(d, ["g"], "id", "v")

    small = _events_like(spark, 50_000)
    a = {r.id: r.run_max for r in window_plan(small).collect()}
    b = {r.id: r.run_max for r in sliced_plan(small).collect()}
    assert a == b, "ooo plans disagree"
    big = _events_like(spark, n)
    return run(lambda: window_plan(big)), run(lambda: sliced_plan(big))


def _keys_like(spark, n):
    # N distinct keys with zipf-ish counts — the per-key aggregate a
    # skew audit ranks; cardinality == data size is the hazard
    return spark.range(n).select(
        F.col("id").alias("k"),
        (F.pmod(F.xxhash64("id"), F.lit(1000)) + 1).alias("c"),
    )


def _gini_agg(rk, i_col, n_col, tot):
    return rk.agg(
        F.max(n_col).cast("bigint").alias("n_keys"),
        tot.cast("bigint").alias("n_rows"),
        F.max("c").alias("max_key_rows"),
        F.round(F.max("c").cast("double") * F.max(n_col) / tot, 6).alias(
            "max_skew_ratio"
        ),
        F.round(
            F.sum((2 * F.col(i_col) - F.col(n_col) - F.lit(1)) * F.col("c"))
            .cast("double")
            / (F.max(n_col).cast("double") * tot),
            6,
        ).alias("gini"),
    )


def case_skew(spark, n, run):
    def window_plan(d):
        wr = Window.orderBy("c", "k")
        wall = Window.partitionBy()
        rk = d.select(
            "c",
            F.row_number().over(wr).alias("i"),
            F.count(F.lit(1)).over(wall).alias("nn"),
            F.sum("c").over(wall).alias("tot"),
        )
        return _gini_agg(rk, "i", "nn", F.max("tot"))

    def sliced_plan(d):
        rk = skew.coarse_group_rank(d, [], "c", extra_order_cols=("k",))
        return _gini_agg(rk, "rnk", "np", F.sum("c"))

    small = _keys_like(spark, 50_000)
    assert sorted(map(tuple, window_plan(small).collect())) == sorted(
        map(tuple, sliced_plan(small).collect())
    ), "skew plans disagree"
    big = _keys_like(spark, n)
    return run(lambda: window_plan(big)), run(lambda: sliced_plan(big))


def _vocab_like(spark, n):
    return spark.range(n).select(
        F.format_string("t%012d", "id").alias("term"),
        (F.pmod(F.xxhash64("id"), F.lit(1_000_000)) + 1).alias("n_occur"),
    )


def case_vocab(spark, n, run):
    top = 50

    def window_plan(d):
        w = Window.orderBy(F.desc("n_occur"), "term")
        wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        wall = Window.partitionBy()
        return d.select(
            "term",
            "n_occur",
            F.row_number().over(w).alias("term_rank"),
            F.round(
                F.sum("n_occur").over(wcum).cast("double")
                / F.sum("n_occur").over(wall),
                6,
            ).alias("cum_share"),
        ).filter(F.col("term_rank") <= top)

    def sliced_plan(d):
        neg = d.withColumn("_neg", -F.col("n_occur"))
        rk = skew.coarse_group_rank(
            neg, [], "_neg", extra_order_cols=("term",), sum_col="n_occur"
        )
        return rk.filter(F.col("rnk") <= top).select(
            "term",
            "n_occur",
            F.col("rnk").cast("int").alias("term_rank"),
            F.round(
                F.col("cum_sum").cast("double") / F.col("sum_tot"), 6
            ).alias("cum_share"),
        )

    small = _vocab_like(spark, 50_000)
    assert sorted(map(tuple, window_plan(small).collect())) == sorted(
        map(tuple, sliced_plan(small).collect())
    ), "vocab plans disagree"
    big = _vocab_like(spark, n)
    return run(lambda: window_plan(big)), run(lambda: sliced_plan(big))


def _names_like(spark, n):
    # ONE brand block of N distinct sortable ASCII names; hashed digits
    # keep lexicographic neighbors non-trivially distant so the
    # levenshtein filter does real work in both plans
    return spark.range(n).select(
        F.lit("Brand#11").alias("p_brand"),
        F.format_string(
            "name %012d %04d", "id", F.pmod(F.xxhash64("id"), F.lit(10_000))
        ).alias("p_name"),
    )


def case_snm(spark, n, run):
    surrogate = (
        "cast(conv(hex(rpad(substr(p_name, 1, 8), 8, ' ')), 16, 10)"
        " as double)"
    )

    def window_plan(d):
        w = Window.partitionBy("p_brand").orderBy("p_name")
        s = d.select(
            "p_brand",
            "p_name",
            F.lead("p_name", 1).over(w).alias("n1"),
            F.lead("p_name", 2).over(w).alias("n2"),
        )
        c1 = s.filter(F.col("n1").isNotNull()).select(
            "p_brand",
            F.col("p_name").alias("name_a"),
            F.col("n1").alias("name_b"),
            F.lit(1).alias("w_off"),
        )
        c2 = s.filter(F.col("n2").isNotNull()).select(
            "p_brand",
            F.col("p_name").alias("name_a"),
            F.col("n2").alias("name_b"),
            F.lit(2).alias("w_off"),
        )
        return c1.unionAll(c2).withColumn(
            "dist", F.levenshtein("name_a", "name_b")
        )

    def sliced_plan(d):
        rk = skew.coarse_group_rank(
            d, ["p_brand"], "p_name", slice_col=surrogate
        ).select("p_brand", "p_name", "rnk")
        probes = rk.select(
            "p_brand",
            F.col("p_name").alias("name_a"),
            F.col("rnk").alias("_ra"),
            F.explode(F.array(F.col("rnk") + 1, F.col("rnk") + 2)).alias(
                "_rb"
            ),
        )
        targets = rk.select(
            F.col("p_brand").alias("_b2"),
            F.col("p_name").alias("name_b"),
            F.col("rnk").alias("_rt"),
        )
        return probes.join(
            targets,
            (probes["p_brand"] == targets["_b2"])
            & (probes["_rb"] == targets["_rt"]),
        ).select(
            "p_brand",
            "name_a",
            "name_b",
            (F.col("_rb") - F.col("_ra")).cast("int").alias("w_off"),
            F.levenshtein("name_a", "name_b").alias("dist"),
        )

    small = _names_like(spark, 50_000)
    assert sorted(map(tuple, window_plan(small).collect())) == sorted(
        map(tuple, sliced_plan(small).collect())
    ), "snm plans disagree"
    big = _names_like(spark, n)
    return run(lambda: window_plan(big)), run(lambda: sliced_plan(big))


CASES = {"ooo": case_ooo, "skew": case_skew, "vocab": case_vocab,
         "snm": case_snm}


def main() -> int:
    n_rows = int(os.environ.get("N_ROWS", "20000000"))
    passes = int(os.environ.get("PASSES", "3"))
    which = os.environ.get("CASES", "ooo,skew,vocab,snm").split(",")
    spark = build_session(
        app_name="window_slice_ab",
        extra_conf={"spark.driver.memory": "24g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    run = _timer(spark, passes)
    for name in which:
        win, sl = CASES[name](spark, n_rows, run)
        print(json.dumps({
            "case": name,
            "n_rows": n_rows,
            "window_sec": win,
            "sliced_sec": sl,
            "sliced_over_window": round(sl / win, 3),
            "passes": passes,
        }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
