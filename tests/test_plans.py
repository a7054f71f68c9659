"""Physical-plan regression tests: the plan *shapes* the 100 TB design
arguments rely on, asserted so a refactor cannot silently regress them.
These read `explain("formatted")` output of the real queries at sf0.001
(plan shape is scale-independent; AQE initial plans still show the
chosen join strategies)."""

import pytest

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = entrymod._REGISTRY[name][0](spark, SF)
    return spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_no_cartesian_products_anywhere_cheap(spark):
    """No all-pairs joins in the scale-sensitive pipelines (the
    brute-force ANN baseline is exempt by design — it IS all-pairs)."""
    for name in [
        "embedding_neardup",
        "minhash_near_dups",
        "simhash_near_dups",
        "triangle_count",
        "basket_lift",
        "flagship_shipped_orders",
    ]:
        plan = _plan(spark, name)
        assert "CartesianProduct" not in plan, name


def test_dimension_joins_broadcast(spark):
    for name in ["stream_table_enrich", "flagship_shipped_orders"]:
        assert "BroadcastHashJoin" in _plan(spark, name), name


def test_bloom_filter_prunes_at_scan(spark):
    """The bloom membership test must sit scan-side (a Filter over the
    parquet scan with the literal bitmap), not after the join."""
    plan = _plan(spark, "bloom_semi_join")
    assert "BroadcastHashJoin LeftSemi" in plan
    assert "element_at" in plan  # the literal-bitmap probe expression


def test_scans_prune_columns(spark):
    """Narrow projections must reach ReadSchema — a documents scan for
    text_stats should never read the embedding-sized text twice, and
    project_filter reads only its four orders columns."""
    plan = _plan(spark, "project_filter")
    scan = plan[plan.index("ReadSchema") :].splitlines()[0]
    assert "o_orderkey" in scan and "o_totalprice" in scan
    assert "o_orderdate" not in scan


def test_filters_push_down(spark):
    plan = _plan(spark, "project_filter")
    assert "PushedFilters: [" in plan
    assert "GreaterThan(o_totalprice,50000.0)" in plan or "o_totalprice" in (
        plan[plan.index("PushedFilters") :].splitlines()[0]
    )


def test_compaction_is_aggregate_not_window(spark):
    """latest_by_offset must stay a hash aggregate (map-side combine),
    never regress to the row_number-over-window formulation."""
    plan = _plan(spark, "latest_by_offset")
    assert "max_by" in plan
    assert "Window" not in plan


def test_interval_join_bucketed_is_equi_join(spark):
    """The bucketed interval join must run as a hash equi-join on
    (key, bucket) — SortMergeJoin/ShuffledHashJoin both fine — with the
    range predicate as a post-join condition, not a nested loop."""
    plan = _plan(spark, "interval_join_bucketed")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    """Hive-style partitioned layout + partition pruning: a day filter
    over a day-partitioned table must prune at planning time (listed
    directories, not row filters) — the layout contract every 100 TB
    event table relies on."""
    from pyspark.sql import functions as F

    from trainee_scala_module_8_kafka_streaming_etl_pipeline_spark.catalog import load

    path = str(tmp_path / "ev_by_day")
    (
        load(spark, SF, "events")
        .withColumn("day", F.to_date("ts"))
        .write.partitionBy("day")
        .mode("overwrite")
        .parquet(path)
    )
    back = spark.read.parquet(path).filter(F.col("day") == "2024-01-05")
    plan = spark._jvm.PythonSQLUtils.explainString(
        back._jdf.queryExecution(), "formatted"
    )
    scan = plan[plan.index("PartitionFilters") :].splitlines()[0]
    assert "day" in scan  # the filter reached partition pruning
    assert back.count() > 0
    # pruning must also be observable: one selected partition directory
    n_days = (
        spark.read.parquet(path).select("day").distinct().count()
    )
    assert n_days > 1
    files = back.select(F.input_file_name()).distinct().collect()
    assert all("day=2024-01-05" in r[0] for r in files)


def test_corpus_build_pipeline_manifest(spark):
    """The composed corpus build emits a consistent shard manifest:
    doc counts per bin sum to the kept-doc count, bins are contiguous
    per (split, source), and every kept doc passed the quality gate."""
    import __spark_entry__ as entrymod
    from trainee_scala_module_8_kafka_streaming_etl_pipeline_spark.catalog import load
    from trainee_scala_module_8_kafka_streaming_etl_pipeline_spark.functions import (
        text as T,
    )
    from trainee_scala_module_8_kafka_streaming_etl_pipeline_spark.operators import (
        dedup,
    )
    import pyspark.sql.functions as F

    sf = "/root/testdata/sf0.001"
    rows = entrymod.queries()["corpus_build_pipeline"](spark, sf).collect()
    assert rows
    docs = load(spark, sf, "documents")
    keep = dedup.keep_best_per_cluster(docs, quality_col=T.quality_score())
    n_kept = keep.filter(F.col("keep_quality") >= 0.3).count()
    assert sum(r.n_docs for r in rows) == n_kept
    by_key = {}
    for r in rows:
        by_key.setdefault((r.split, r.source), []).append(r.bin)
    for bins in by_key.values():
        assert sorted(bins) == list(range(len(bins)))  # contiguous from 0


def test_corr_matrix_is_one_pass(spark):
    """All nine moment sums come from ONE aggregate over one scan —
    no join, no window, no second exchange."""
    plan = _plan(spark, "corr_matrix")
    # one scan NODE (the formatted plan repeats it in the detail list)
    assert plan.count("Location: InMemoryFileIndex") == 1
    assert "Join" not in plan and "Window" not in plan


def test_pareto_frontier_collapses_before_window(spark):
    """The skyline window must run over the distinct (price, size)
    signatures — i.e. a HashAggregate feeds the Window, not the raw
    part scan."""
    plan = _plan(spark, "pareto_frontier")
    assert "Window" in plan and "HashAggregate" in plan
    assert plan.index("HashAggregate") > plan.index("Window")  # formatted plans list operators top-down from the sink


def test_sequence_pack_partitions_by_source(spark):
    """Packing parallelizes per source shard: the window partition key
    is `source`, never an empty (global) partition spec."""
    plan = _plan(spark, "sequence_pack")
    assert "Window" in plan
    # the window's partition expression names the source column
    win_line = [ln for ln in plan.splitlines() if "windowspecdefinition" in ln.lower()]
    assert win_line and "source" in win_line[0]


def test_dup_ngram_counts_df_over_hashed_key_window(spark):
    """Gram shuffles must key on the xxhash64 gram, not the gram string
    (shuffle bytes argument in the docstring), and document frequency
    must come from ONE gram-keyed window over occ — not a second full
    gram pass joined back (scale argument in the docstring)."""
    plan = _plan(spark, "dup_ngram_coverage")
    assert "xxhash64" in plan
    assert "Window" in plan
    assert "Join" not in plan


def test_semantic_decontaminate_broadcasts_benchmark(spark):
    """The benchmark side must broadcast (no corpus shuffle before the
    expansion) and the N x B collapse must be a hash aggregate, not a
    window sort."""
    plan = _plan(spark, "semantic_decontaminate")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "Window" not in plan
    assert "max_by" in plan


def test_gopher_filter_is_narrow_projection(spark):
    """Pure per-row rules: no shuffle at all in the plan."""
    plan = _plan(spark, "gopher_quality_filter")
    assert "Exchange" not in plan


def test_weighted_sample_plans_heap_merge(spark):
    """orderBy+limit must plan as TakeOrderedAndProject (per-partition
    k-heaps), never a global Sort exchange."""
    plan = _plan(spark, "weighted_sample_topk")
    assert "TakeOrderedAndProject" in plan
    assert "Sort " not in plan


def test_psi_drift_single_fact_aggregate(spark):
    """The fact table feeds ONE count aggregate; everything after is
    O(groups x bins).  No window over events, no cartesian growth."""
    plan = _plan(spark, "psi_drift")
    assert "Window" not in plan
    assert "CartesianProduct" not in plan


def test_round4_entries_no_cartesian(spark):
    """The round-4 additions keep the no-all-pairs discipline: IVF-PQ
    probes clusters, BM25 joins filtered postings, RRF joins two
    top-k lists, the histogram/dedup paths ride LSH buckets, and the
    splitter/report/chunker are narrow or keyed."""
    for name in [
        "ann_ivf_pq_topk",
        "bm25_topk",
        "ann_rank_fusion",
        "embedding_similarity_histogram",
        "cluster_aware_split",
        "source_quality_report",
        "doc_chunk_split",
        "ltv_cohort_curve",
        "ship_lag_percentiles",
    ]:
        assert "CartesianProduct" not in _plan(spark, name), name


def test_bm25_small_sides_broadcast(spark):
    """BM25's df table and corpus stats must broadcast onto the
    postings — a shuffle there would move the fact-sized side for a
    3-row dimension."""
    plan = _plan(spark, "bm25_topk")
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row stats attach


def test_ivf_pq_lookup_tables_broadcast(spark):
    """IVF-PQ's per-query distance tables and probe lists must
    broadcast; only the candidate-to-codes meet may shuffle."""
    plan = _plan(spark, "ann_ivf_pq_topk")
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan
