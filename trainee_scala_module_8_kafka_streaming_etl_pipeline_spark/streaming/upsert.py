"""Keyed-upsert sink with delete propagation (reference S9/E2).

The reference's Elasticsearch sink writes each record under doc ``_id`` =
record key, so re-delivery and key updates overwrite idempotently
(/root/reference/README.md:487-493; ES connector manifest: "idempotent
write semantics guarantees exactly once"), and tombstones/__deleted rows
remove the key (README.md:361-364).

Spark-first equivalent: a **versioned parquet state table** maintained by
``foreachBatch``.  Each micro-batch MERGE is:

    new_state = apply_changelog(prior_state ∪ batch)

i.e. latest-offset-per-key wins, keys whose latest record is a delete
are dropped — then written as a new version directory with an atomically
swapped pointer file.  Readers never see a half-written version; a
failed batch leaves the old pointer (re-run is idempotent because the
merge is deterministic in (prior, batch)).

At scale the same surface is one ``MERGE INTO`` on a Delta/Iceberg table
(WHEN MATCHED AND __deleted THEN DELETE); the versioned-parquet
implementation keeps the semantics dependency-free.  State writes are
partitioned by key hash so a 1000-executor MERGE shuffles once on the
key, never the full history.
"""

from __future__ import annotations

import os
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.compaction import latest_by_offset

_POINTER = "_LATEST"

# (version-dir path -> StructType) recorded by write_version at commit
# time: read_state then declares the schema instead of re-running parquet
# footer inference (~60 ms of driver latency per read — every micro-batch
# merge reads 1-2 state tables, round 11).  Keyed by the immutable
# version dir (never rewritten in place; vacuumed dirs simply age out of
# use), with inference as the fallback for readers in a fresh process
# (crash replay, external readers).
_SCHEMA_MEMO: dict[str, object] = {}


def _state_version(state_dir: str) -> int | None:
    try:
        with open(os.path.join(state_dir, _POINTER)) as fh:
            return int(fh.read().strip())
    except (FileNotFoundError, ValueError):
        return None


def read_state(spark: SparkSession, state_dir: str) -> DataFrame | None:
    """Current state table, or None before the first committed version."""
    v = _state_version(state_dir)
    if v is None:
        return None
    path = os.path.join(state_dir, f"v={v}")
    schema = _SCHEMA_MEMO.get(path)
    if schema is not None:
        return spark.read.schema(schema).parquet(path)
    return spark.read.parquet(path)


def upsert_batch(
    batch_df: DataFrame,
    state_dir: str,
    keys: Sequence[str],
    offset_col: str,
    deleted_col: str | None = "__deleted",
    allow_schema_evolution: bool = False,
    retain: int | None = 2,
    skip_empty_probe: bool = False,
) -> None:
    """One MERGE: fold ``batch_df`` into the state table at ``state_dir``.

    Rows are compacted per key by ``offset_col`` (arrival order); if
    ``deleted_col`` is present, keys whose winning row is a delete are
    removed from the state (tombstone propagation).  Prior-state rows
    re-enter the merge with ``__deleted=false`` and their stored offset,
    so a stale re-delivery (offset lower than the state's) never
    regresses a key THAT IS STILL IN STATE.

    Delivery-model boundary (found by the hypothesis suite): an applied
    tombstone is physically dropped, so the state keeps no memory of
    the deleted key's offset — re-delivering a batch OLDER than the
    delete would resurrect the key.  That is exactly Kafka's
    ``delete.retention.ms`` contract (tombstones must outlive consumer
    lag) and the reference ES sink's exposure too.  It cannot occur
    under checkpointed ``foreachBatch``, which only ever re-runs the
    LAST batch; feeding this sink from a transport that can re-deliver
    arbitrary old batches requires retaining tombstone rows for the
    re-delivery window instead of dropping them at apply time.

    ``allow_schema_evolution=True`` handles the CDC widen case — an
    upstream ``ALTER TABLE ADD COLUMN`` makes Debezium envelopes grow a
    field mid-stream (the reference's schemas come from Schema Registry
    and may evolve, /root/reference/README.md:389).  The merge then
    unions by name with nulls for columns either side lacks: prior-state
    rows read NULL for the new column until a change re-writes their
    key, exactly how a keyed ES index behaves.  Dropped columns are kept
    (new rows carry NULL).  Off by default so unexpected schema drift in
    a fixed-schema pipeline still fails loudly.
    """
    spark = batch_df.sparkSession
    prior = read_state(spark, state_dir)
    # Empty-batch fast path (round 11): availableNow runs trailing
    # no-data micro-batches (watermark advancement), and folding an
    # empty batch into existing state is a provable no-op — merged =
    # prior, latest_by_offset(prior) = prior (already compacted), the
    # tombstone filter re-removes nothing (applied deletes were
    # physically dropped).  Profiled at sf0.1: the flagship pipeline's
    # no-data batch paid the full 1.3 s read+merge+write; the limit-1
    # probe costs one cheap batch-plan execution instead.  Only valid
    # when prior state exists (first batch must still write v=0 even if
    # empty) and because ``transform`` is row-bounded (enrichment joins
    # never invent rows from an empty batch).  ``skip_empty_probe``
    # (round 12): keyed_upsert_sink probes the RAW persisted batch
    # before its transform — re-probing the transformed plan here would
    # re-execute the enrichment for nothing.
    if not skip_empty_probe and prior is not None and batch_df.isEmpty():
        return
    cols = [c for c in batch_df.columns]
    if deleted_col and deleted_col not in cols:
        batch_df = batch_df.withColumn(deleted_col, F.lit(False))
    if prior is not None:
        if deleted_col and deleted_col not in prior.columns:
            prior = prior.withColumn(deleted_col, F.lit(False))
        merged = prior.unionByName(
            batch_df, allowMissingColumns=allow_schema_evolution
        )
    else:
        merged = batch_df
    value_cols = [
        c for c in merged.columns if c not in keys and c != offset_col
    ]
    compacted = latest_by_offset(merged, keys, offset_col, value_cols=value_cols)
    if deleted_col:
        compacted = compacted.filter(~F.col(deleted_col)).drop(deleted_col)

    write_version(compacted, state_dir, retain=retain)


def write_version(
    df: DataFrame, state_dir: str, retain: int | None = 2
) -> None:
    """Commit ``df`` as the next state version with an atomic pointer
    swap — the shared primitive under every state table (upsert MERGE,
    sketch register merges).

    After a successful swap, versions older than the newest ``retain``
    are vacuumed (pass ``retain=None`` to keep everything, e.g. for a
    time-travel fixture).  Without retention every micro-batch leaves a
    full state copy behind, so the sink's disk footprint grows with
    batch COUNT × state size rather than state size.  Every sink
    factory (keyed_upsert_sink, topn_sink, the sketch/bars/ewma/drift/
    reservoir/cohort merges) threads its own ``retain`` through to
    here, so a deployment with external time-travel readers opts out at
    the sink it configures rather than patching call sites.
    """
    prev = _state_version(state_dir)
    next_v = 0 if prev is None else prev + 1
    os.makedirs(state_dir, exist_ok=True)
    vdir = os.path.join(state_dir, f"v={next_v}")
    df.write.mode("overwrite").parquet(vdir)
    # keep only the newest version's schema per state dir — a long-lived
    # sink must not grow the memo by one entry per batch
    prefix = os.path.join(state_dir, "v=")
    for k in [k for k in _SCHEMA_MEMO if k.startswith(prefix)]:
        del _SCHEMA_MEMO[k]
    _SCHEMA_MEMO[vdir] = df.schema
    tmp = os.path.join(state_dir, f"{_POINTER}.tmp")
    with open(tmp, "w") as fh:
        fh.write(str(next_v))
    os.replace(tmp, os.path.join(state_dir, _POINTER))
    if retain is not None:
        vacuum_versions(state_dir, keep=retain)


def vacuum_versions(state_dir: str, keep: int = 2) -> list[int]:
    """Drop state versions older than the newest ``keep`` (never the
    current pointer).  The MERGE writes a whole new version per batch,
    so without retention the sink's footprint grows with batch COUNT
    rather than state SIZE — at one batch/minute that is 1440 full
    copies a day.  Safe because readers resolve the pointer first and
    only the newest version is ever the pointer target; ``keep >= 2``
    leaves an in-flight reader's version on disk. Returns the dropped
    version numbers.
    """
    import shutil

    cur = _state_version(state_dir)
    if cur is None:
        return []
    versions = sorted(
        int(d.split("=", 1)[1])
        for d in os.listdir(state_dir)
        if d.startswith("v=") and d.split("=", 1)[1].isdigit()
    )
    live = set(versions[-keep:]) | {cur}
    dropped = []
    for v in versions:
        if v not in live:
            shutil.rmtree(os.path.join(state_dir, f"v={v}"), ignore_errors=True)
            dropped.append(v)
    return dropped


def keyed_upsert_sink(
    state_dir: str,
    keys: Sequence[str],
    offset_col: str,
    deleted_col: str | None = "__deleted",
    transform: Callable[[DataFrame], DataFrame] | None = None,
    allow_schema_evolution: bool = False,
    retain: int | None = 2,
) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` function maintaining a keyed-upsert state table —
    the writeStream side of reference S9/E2.  ``transform`` (optional)
    runs inside the batch before the merge, e.g. the temporal J1
    enrichment against another state table."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        # When a transform is attached, materialize the raw micro-batch
        # ONCE (round 12, guide §5 "localCheckpoint is a cheaper way to
        # cut lineage"): a foreachBatch frame RE-EXECUTES its batch
        # plan on every action, and this sink takes two (the empty
        # probe and the merge write) — for the flagship's interval
        # join that meant running the join's batch plan twice per
        # micro-batch, the second time wrapped in the enrichment join
        # (profiled: 1.1 s probe + ~1.0 s write at sf0.1; interleaved
        # A/B: flagship 6.51 -> 5.86 s).  For transform-free sinks the
        # batch plan is the streaming operator's own cheap output and
        # the materialization job costs MORE than the limit-1 probe it
        # saves (cdc_upsert +60 ms measured), so those keep the lazy
        # path.  localCheckpoint rather than persist(): the
        # checkpointed frame is a plain RDD scan, so the state read +
        # enrichment join plans never go through CacheManager plan
        # matching (a persist() here hit a cross-micro-batch
        # cached-plan attribute mismatch — "key not found: id#N" —
        # because consecutive batch plans canonicalize identically).
        # Blocks are dropped by the context cleaner once unreachable;
        # micro-batch output is bounded by the trigger.
        if transform is not None:
            batch_df = batch_df.localCheckpoint(eager=True)
            # Probe the RAW batch BEFORE the transform (round 12): the
            # round-11 probe ran after enrichment, so the trailing
            # no-data batch still paid the transform's state read +
            # join build.  Valid because ``transform`` is row-bounded
            # (documented in upsert_batch) — an empty input cannot
            # become non-empty.  On the checkpointed frame the probe
            # is a metadata-cheap limit-1.
            if _state_version(state_dir) is not None and batch_df.isEmpty():
                return
            out_df = transform(batch_df)
            upsert_batch(
                out_df,
                state_dir,
                keys,
                offset_col,
                deleted_col,
                allow_schema_evolution=allow_schema_evolution,
                retain=retain,
                skip_empty_probe=True,
            )
            return
        upsert_batch(
            batch_df,
            state_dir,
            keys,
            offset_col,
            deleted_col,
            allow_schema_evolution=allow_schema_evolution,
            retain=retain,
        )

    return _sink
