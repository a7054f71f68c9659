"""Property-style tests on randomized (seeded) data for the invariants
no fixed fixture exercises: compaction-formulation equivalence, MERGE
batch-split associativity, and exactness of the metric-blocked
embedding near-dup join on data with PLANTED near-duplicates (the
driver corpus has no cos>0.7 pairs, so this path needs synthetic
geometry)."""

import random

import pyspark.sql.functions as F
from pyspark.sql import Window

from trainee_scala_module_8_kafka_streaming_etl_pipeline_spark.operators.compaction import (
    latest_by_offset,
)
from trainee_scala_module_8_kafka_streaming_etl_pipeline_spark.operators.similarity import (
    cosine_pairs_blocked,
    neardup_pairs,
)
from trainee_scala_module_8_kafka_streaming_etl_pipeline_spark.streaming.upsert import (
    read_state,
    upsert_batch,
)


def _random_changelog(seed, n=400, keys=40):
    rnd = random.Random(seed)
    return [
        (rnd.randrange(keys), rnd.randrange(1000), rnd.random() < 0.15, i)
        for i in range(n)
    ]


def test_latest_by_offset_equals_window_formulation(spark):
    rows = _random_changelog(1)
    df = spark.createDataFrame(rows, ["k", "v", "d", "off"])
    agg = latest_by_offset(df, keys=["k"], offset_col="off", value_cols=["v", "d"])
    w = Window.partitionBy("k").orderBy(F.desc("off"))
    win = (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("k", "v", "d", "off")
    )
    assert {tuple(r) for r in agg.collect()} == {tuple(r) for r in win.collect()}


def test_upsert_batch_split_invariance(spark, tmp_path):
    """Folding a changelog through the MERGE sink in any batch split
    yields the same final state as one batch (associativity — what makes
    micro-batch boundaries semantically invisible)."""
    rows = _random_changelog(2)
    cols = ["k", "v", "__deleted", "off"]

    def run(splits, name):
        state = str(tmp_path / name)
        for lo, hi in splits:
            upsert_batch(
                spark.createDataFrame(rows[lo:hi], cols),
                state, keys=["k"], offset_col="off",
            )
        return {tuple(r) for r in read_state(spark, state).collect()}

    once = run([(0, 400)], "s1")
    twice = run([(0, 150), (150, 400)], "s2")
    thrice = run([(0, 50), (50, 300), (300, 400)], "s3")
    assert once == twice == thrice


def _planted_vectors(seed, n_clusters=12, per_cluster=6, dim=16):
    """Clusters of near-identical vectors (tiny jitter) -> every
    intra-cluster pair has cosine ~1; inter-cluster pairs are far."""
    rnd = random.Random(seed)
    rows = []
    vid = 0
    for _ in range(n_clusters):
        center = [rnd.gauss(0, 1) for _ in range(dim)]
        for _ in range(per_cluster):
            vec = [c + rnd.gauss(0, 0.004) for c in center]
            rows.append((vid, [float(x) for x in vec]))
            vid += 1
    return rows


def test_metric_blocked_neardup_is_exact(spark):
    """neardup_pairs (triangle-inequality centroid blocking) must return
    EXACTLY the brute-force pair set at a tight threshold."""
    rows = _planted_vectors(3)
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"]).select(
        "vec_id", F.col("embedding").cast("array<float>").alias("embedding")
    )
    blocked = {
        (r.id_a, r.id_b)
        for r in neardup_pairs(emb, threshold=0.99, centroid_stride=7).collect()
    }
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("v_a"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("v_b"))
    from trainee_scala_module_8_kafka_streaming_etl_pipeline_spark.operators.similarity import (
        cosine_col,
    )

    brute = {
        (r.id_a, r.id_b)
        for r in a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cosine_col("v_a", "v_b").alias("cos"))
        .filter(F.col("cos") >= 0.99)
        .collect()
    }
    assert blocked == brute
    assert len(brute) >= 100  # the planted clusters actually produce pairs


def test_blocked_gemm_matches_bruteforce(spark):
    """cosine_pairs_blocked (applyInPandas GEMM) == brute force at a
    moderate threshold on random data."""
    rows = _planted_vectors(4, n_clusters=8, per_cluster=5)
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"]).select(
        "vec_id", F.col("embedding").cast("array<float>").alias("embedding")
    )
    from trainee_scala_module_8_kafka_streaming_etl_pipeline_spark.operators.similarity import (
        cosine_col,
    )

    gemm = {
        (r.id_a, r.id_b)
        for r in cosine_pairs_blocked(emb, threshold=0.5, n_blocks=4).collect()
    }
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("v_a"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("v_b"))
    brute = {
        (r.id_a, r.id_b)
        for r in a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cosine_col("v_a", "v_b").alias("cos"))
        .filter(F.col("cos") >= 0.5)
        .collect()
    }
    assert gemm == brute


def test_salted_join_matches_plain_join(spark):
    """Salting must not change join results — only the key distribution.
    Skewed fact: 80% of rows on one hot key."""
    rnd = random.Random(5)
    fact = spark.createDataFrame(
        [(i, 1 if rnd.random() < 0.8 else rnd.randrange(2, 30), rnd.random())
         for i in range(2000)],
        ["row_id", "k", "x"],
    )
    dim = spark.createDataFrame(
        [(k, f"name{k}") for k in range(0, 30, 2)], ["dk", "name"]
    )
    from trainee_scala_module_8_kafka_streaming_etl_pipeline_spark.operators.skew import (
        salted_join,
    )

    salted = salted_join(fact, dim, on=[("k", "dk")], salt_partitions=4)
    plain = fact.join(dim, fact["k"] == dim["dk"])
    key = lambda r: (r.row_id, r.dk)
    assert sorted(map(key, salted.collect())) == sorted(map(key, plain.collect()))


def test_hash_split_deterministic_and_partition_invariant(spark):
    from trainee_scala_module_8_kafka_streaming_etl_pipeline_spark.operators.sampling import (
        hash_split,
    )

    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    a = hash_split(df).select("doc_id", "split")
    b = hash_split(df.repartition(13)).select("doc_id", "split")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    frac = {
        r["split"]: r["n"]
        for r in a.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    # md5 buckets over 2000 keys: expect ~80/10/10 within a loose band
    assert 0.7 < frac["train"] / 2000 < 0.9
    assert 0.05 < frac["val"] / 2000 < 0.15
    assert 0.05 < frac["test"] / 2000 < 0.15


def test_pack_shards_budget_and_order_invariants(spark):
    from trainee_scala_module_8_kafka_streaming_etl_pipeline_spark.operators.sampling import (
        pack_shards,
    )

    rnd = random.Random(7)
    rows = [(i, f"g{i % 3}", rnd.randrange(1, 200)) for i in range(600)]
    df = spark.createDataFrame(rows, ["doc_id", "lang", "n_tok"])
    out = pack_shards(df, token_col="n_tok", group_cols=("lang",), budget=500)
    per_shard = (
        out.groupBy("lang", "shard_id")
        .agg(F.sum("n_tok").alias("tok"), F.max("n_tok").alias("mx"))
        .collect()
    )
    # each shard holds < budget before its last doc was added: total
    # stays under budget + that doc's size
    assert all(r["tok"] <= 500 + r["mx"] for r in per_shard)
    # shard ids are dense consecutive per group starting at 0
    for g in ("g0", "g1", "g2"):
        ids = sorted(
            r["shard_id"] for r in per_shard if r["lang"] == g
        )
        assert ids == list(range(len(ids)))


def test_lsh_topk_neighbors_subset_of_bruteforce_space(spark):
    from trainee_scala_module_8_kafka_streaming_etl_pipeline_spark.operators.similarity import (
        brute_force_topk,
        lsh_topk,
    )

    rnd = random.Random(11)
    rows = [
        (i, [rnd.gauss(0, 1) for _ in range(64)]) for i in range(300)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    lsh = lsh_topk(df, n_queries=5, k=3)
    exact = brute_force_topk(df, n_queries=5, k=300)
    # every LSH result is a real (query, neighbor) pair with the exact
    # cosine the brute-force path computes
    joined = lsh.alias("l").join(
        exact.alias("e"),
        (F.col("l.query_id") == F.col("e.query_id"))
        & (F.col("l.neighbor_id") == F.col("e.neighbor_id")),
    )
    assert joined.count() == lsh.count()
    assert joined.filter(F.col("l.cos") != F.col("e.cos")).count() == 0


def test_neardup_clusters_label_propagation(spark):
    from trainee_scala_module_8_kafka_streaming_etl_pipeline_spark.operators.dedup import (
        neardup_clusters,
    )

    docs = spark.createDataFrame([(i,) for i in range(8)], ["doc_id"])
    # two chains (0-1-2, 5-6) and isolated nodes 3, 4, 7; chain edges
    # deliberately not transitive pairs, so propagation must iterate
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (5, 6)], ["doc_a", "doc_b"]
    )
    out = {
        r["doc_id"]: r["cluster_id"]
        for r in neardup_clusters(docs, pairs=pairs).collect()
    }
    assert out == {0: 0, 1: 0, 2: 0, 3: 3, 4: 4, 5: 5, 6: 5, 7: 7}
