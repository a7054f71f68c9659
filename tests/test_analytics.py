"""Edge-case tests for the analytics queries added on top of the
reference surface: strict funnel ordering, retention day boundaries,
quantization guards, and TF-IDF ranking — run against handcrafted tiny
tables by substituting the catalog loader, so they pin the *semantics*
the DuckDB oracles then re-verify at scale factor."""

import pyspark.sql.functions as F
import pytest

import __spark_entry__ as entrymod


def _fake_load(tables):
    def load(spark, sf_dir, name):
        return tables[name]

    return load


@pytest.fixture()
def patch_load(monkeypatch):
    def apply(tables):
        # swapping the fake catalog = a new corpus snapshot: the shared
        # stage memos (trigram tables, cluster labels, ANN indexes) are
        # keyed per (app, sf dir, stage) and would otherwise serve the
        # PREVIOUS corpus's materialization under the same "i" token
        entrymod._STAGE_CACHE.clear()
        monkeypatch.setattr(entrymod, "load", _fake_load(tables))

    return apply


def _events_df(spark, rows):
    return spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).withColumn("ts", F.to_timestamp("ts"))


def test_event_funnel_strict_ordering(spark, patch_load):
    rows = [
        # user 1: full ordered funnel
        (1, "2024-01-01 10:00:00", 1, "view", 1.0, "{}"),
        (2, "2024-01-01 10:01:00", 1, "click", 1.0, "{}"),
        (3, "2024-01-01 10:02:00", 1, "purchase", 1.0, "{}"),
        # user 2: click BEFORE first view must not count; purchase
        # without a qualifying click must not count either
        (4, "2024-01-01 09:00:00", 2, "click", 1.0, "{}"),
        (5, "2024-01-01 10:00:00", 2, "view", 1.0, "{}"),
        (6, "2024-01-01 11:00:00", 2, "purchase", 1.0, "{}"),
        # user 3: never views
        (7, "2024-01-01 10:00:00", 3, "purchase", 1.0, "{}"),
    ]
    patch_load({"events": _events_df(spark, rows)})
    out = {
        r.user_id: r.funnel_depth
        for r in entrymod.queries()["event_funnel"](spark, "ignored").collect()
    }
    assert out == {1: 3, 2: 1, 3: 0}


def test_event_funnel_equal_ts_not_after(spark, patch_load):
    # click at exactly first_view's timestamp is NOT strictly after
    rows = [
        (1, "2024-01-01 10:00:00", 1, "view", 1.0, "{}"),
        (2, "2024-01-01 10:00:00", 1, "click", 1.0, "{}"),
    ]
    patch_load({"events": _events_df(spark, rows)})
    [r] = entrymod.queries()["event_funnel"](spark, "ignored").collect()
    assert r.funnel_depth == 1 and r.first_click is None


def test_user_retention_day_boundary(spark, patch_load):
    rows = [
        # day 1: users 1, 2; day 2: user 1 only (23:59 still day 1)
        (1, "2024-01-01 08:00:00", 1, "view", 1.0, "{}"),
        (2, "2024-01-01 23:59:59", 2, "view", 1.0, "{}"),
        (3, "2024-01-02 00:00:00", 1, "view", 1.0, "{}"),
    ]
    patch_load({"events": _events_df(spark, rows)})
    out = {
        str(r.day)[:10]: (r.n_active, r.n_retained)
        for r in entrymod.queries()["user_retention"](spark, "ignored").collect()
    }
    assert out == {"2024-01-01": (2, 1), "2024-01-02": (1, 0)}


def test_embedding_quantize_range_and_zero_guard(spark, patch_load):
    emb = spark.createDataFrame(
        [(1, [0.5, -0.5, 0.25, 0.0], 0), (2, [0.0, 0.0, 0.0, 0.0], 0)],
        ["vec_id", "embedding", "label"],
    ).withColumn("embedding", F.col("embedding").cast("array<float>"))
    patch_load({"embeddings": emb})
    out = {
        r.vec_id: r for r in entrymod.queries()["embedding_quantize"](spark, "i").collect()
    }
    # max-abs 0.5 -> scale 254; -0.5 maps to exactly -127, bounds hold
    assert out[1].q == [127, -127, 64, 0]
    assert out[1].scale == 254.0
    # all-zero vector: guarded scale, quantized to zeros (no inf/NaN)
    assert out[2].q == [0, 0, 0, 0]


def test_tfidf_ranks_distinctive_terms_first(spark, patch_load):
    docs = spark.createDataFrame(
        [
            (1, "apple banana banana", "en", "s", 0),
            (2, "apple cherry", "en", "s", 0),
            (3, "apple durian", "en", "s", 0),
        ],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    patch_load({"documents": docs})
    out = entrymod.queries()["tfidf_top_terms"](spark, "i").collect()
    top = {
        r.doc_id: r.term for r in out if r.term_rank == 1
    }
    # the doc-unique term always outranks the corpus-wide 'apple'
    assert top == {1: "banana", 2: "cherry", 3: "durian"}
    # idf of a term present in every doc is ln(4/4)=0 -> tfidf 0
    apple = [r for r in out if r.term == "apple"]
    assert apple and all(r.tfidf == 0.0 for r in apple)


def test_vocab_coverage_cumulative_monotone(spark, patch_load):
    docs = spark.createDataFrame(
        [(1, "a a a b b c", "en", "s", 0)],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    patch_load({"documents": docs})
    rows = sorted(
        entrymod.queries()["vocab_coverage"](spark, "i").collect(),
        key=lambda r: r.term_rank,
    )
    assert [r.term for r in rows] == ["a", "b", "c"]
    assert [r.cum_share for r in rows] == [0.5, pytest.approx(5 / 6, abs=1e-6), 1.0]


def test_cube_agg_grouping_id_bitmask(spark, patch_load):
    orders = spark.createDataFrame(
        [
            (1, 10, "O", 100.0, "2024-01-01", "1-URGENT"),
            (2, 11, "O", 200.0, "2024-01-02", "5-LOW"),
            (3, 12, "F", 400.0, "2024-01-03", "1-URGENT"),
        ],
        [
            "o_orderkey", "o_custkey", "o_orderstatus",
            "o_totalprice", "o_orderdate", "o_orderpriority",
        ],
    )
    patch_load({"orders": orders})
    rows = entrymod.queries()["cube_agg"](spark, "i").collect()
    # 4 grouping sets: (s,p)=gid 0, (s,*)=gid 1, (*,p)=gid 2, (*,*)=gid 3
    by_gid = {}
    for r in rows:
        by_gid.setdefault(r.gid, []).append(r)
    assert set(by_gid) == {0, 1, 2, 3}
    grand = by_gid[3]
    assert len(grand) == 1 and grand[0].n_orders == 3
    assert grand[0].total_price == 700.0
    # status subtotal rows null out priority only
    assert all(r.o_orderpriority is None and r.o_orderstatus is not None
               for r in by_gid[1])


def test_interarrival_gaps_exact_and_per_user(spark, patch_load):
    rows = [
        (1, "2024-01-01 10:00:00", 1, "view", 1.0, "{}"),
        (2, "2024-01-01 10:00:01", 1, "view", 1.0, "{}"),
        (3, "2024-01-01 10:01:01", 1, "view", 1.0, "{}"),
        (4, "2024-01-01 09:00:00", 2, "view", 1.0, "{}"),  # single event -> no gap
    ]
    patch_load({"events": _events_df(spark, rows)})
    out = {r.user_id: r for r in
           entrymod.queries()["interarrival_stats"](spark, "i").collect()}
    assert out[1].n_gaps == 2
    assert out[1].min_gap_us == 1_000_000
    assert out[1].max_gap_us == 60_000_000
    assert out[1].total_gap_us == 61_000_000
    # a lone event yields zero gaps, not a null row dropped
    assert out[2].n_gaps == 0 and out[2].total_gap_us is None


def test_value_quartiles_deterministic_ties(spark, patch_load):
    # 8 equal values: ntile(4) must split 2/2/2/2 with event_id tiebreak
    rows = [(i, "2024-01-01 10:00:00", 1, "view", 5.0, "{}") for i in range(8)]
    patch_load({"events": _events_df(spark, rows)})
    out = sorted(
        entrymod.queries()["value_quartiles"](spark, "i").collect(),
        key=lambda r: r.quartile,
    )
    assert [r.quartile for r in out] == [1, 2, 3, 4]
    assert all(r.n == 2 and r.lo == 5.0 and r.hi == 5.0 for r in out)


def _docs_df(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text", "lang", "source", "n_chars"])


def test_boilerplate_ngrams_threshold_and_short_docs(spark, patch_load):
    docs = _docs_df(spark, [
        # "x y z" appears in 3 docs -> boilerplate; "p q r" in only 2 -> not
        (1, "x y z p q r", "en", "s", 0),
        (2, "x y z p q r", "en", "s", 0),
        (3, "x y z unique words here", "en", "s", 0),
        (4, "too short", "en", "s", 0),  # < 3 tokens: no grams, excluded
    ])
    patch_load({"documents": docs})
    out = {r.doc_id: r for r in
           entrymod.queries()["boilerplate_ngrams"](spark, "i").collect()}
    assert 4 not in out
    # doc 1 grams: "x y z","y z p","z p q","p q r" -> only "x y z" shared by 3
    assert out[1].n_grams == 4 and out[1].n_boiler == 1
    assert out[1].boiler_ratio == 0.25
    assert out[3].n_boiler == 1  # shares only "x y z"
    # a doc with zero boilerplate still appears with ratio 0.0
    docs2 = _docs_df(spark, [(9, "a b c d", "en", "s", 0),
                             (1, "x y z", "en", "s", 0),
                             (2, "x y z", "en", "s", 0),
                             (3, "x y z", "en", "s", 0)])
    patch_load({"documents": docs2})
    out2 = {r.doc_id: r for r in
            entrymod.queries()["boilerplate_ngrams"](spark, "i").collect()}
    assert out2[9].n_boiler == 0 and out2[9].boiler_ratio == 0.0


def test_common_ngrams_rank_ties_break_on_gram(spark, patch_load):
    docs = _docs_df(spark, [
        (1, "a b c", "en", "s", 0),
        (2, "a b c", "en", "s", 0),
        (3, "z z z", "en", "s", 0),
        (4, "z z z", "en", "s", 0),
    ])
    patch_load({"documents": docs})
    rows = sorted(entrymod.queries()["common_ngrams"](spark, "i").collect(),
                  key=lambda r: r.rnk)
    # both grams have nd=2; lexicographic tiebreak fixes the order
    assert [(r.gram, r.nd) for r in rows] == [("a b c", 2), ("z z z", 2)]


def test_bigram_lm_score_add_one_smoothing(spark, patch_load):
    docs = _docs_df(spark, [(1, "a b a b", "en", "s", 0),
                            (2, "a b", "en", "s", 0)])
    patch_load({"documents": docs})
    out = {r.doc_id: r for r in
           entrymod.queries()["bigram_lm_score"](spark, "i").collect()}
    # C(a b)=3, C(b a)=1, ctx a=3, ctx b=1, V=2
    # logp(a b) = ln(4/5) = -0.223144 ; logp(b a) = ln(2/3) = -0.405465
    assert out[2].n_bigrams == 1
    assert out[2].avg_logprob == pytest.approx(-0.223144, abs=1e-9)
    assert out[1].n_bigrams == 3
    # exact integer-micro average: round((-223144*2 - 405465)/3)/1e6
    assert out[1].avg_logprob == pytest.approx(-0.283918, abs=1e-9)


def test_scd2_history_interval_chain(spark, patch_load):
    rows = [
        (1, "2024-01-01 10:00:00", 1, "purchase", 10.0, "{}"),
        (2, "2024-01-02 10:00:00", 1, "purchase", 20.0, "{}"),
        (3, "2024-01-03 10:00:00", 1, "view", 99.0, "{}"),  # non-purchase ignored
        (4, "2024-01-01 10:00:00", 2, "purchase", 5.0, "{}"),
    ]
    patch_load({"events": _events_df(spark, rows)})
    out = sorted(entrymod.queries()["scd2_history"](spark, "i").collect(),
                 key=lambda r: (r.user_id, r.event_id))
    u1 = [r for r in out if r.user_id == 1]
    assert len(u1) == 2
    # first version closes exactly at the next version's valid_from
    assert u1[0].valid_to == u1[1].valid_from and not u1[0].is_current
    assert u1[1].valid_to is None and u1[1].is_current
    u2 = [r for r in out if r.user_id == 2]
    assert len(u2) == 1 and u2[0].is_current


def test_sole_blame_requires_multi_supplier_and_unique_r(spark, patch_load):
    li_rows = [
        # order 1: two suppliers, only supp 10 has R -> blamed
        (1, 1, 10, 1, 1.0, 10.0, 0.0, 0.0, "R", "F", "1995-01-01"),
        (1, 2, 20, 2, 1.0, 10.0, 0.0, 0.0, "N", "F", "1995-01-01"),
        # order 2: single supplier with R -> NOT blamed (no coworker)
        (2, 1, 10, 1, 1.0, 10.0, 0.0, 0.0, "R", "F", "1995-01-01"),
        # order 3: two R suppliers -> neither blamed
        (3, 1, 10, 1, 1.0, 10.0, 0.0, 0.0, "R", "F", "1995-01-01"),
        (3, 2, 30, 2, 1.0, 10.0, 0.0, 0.0, "R", "F", "1995-01-01"),
    ]
    li = spark.createDataFrame(li_rows, [
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
        "l_linestatus", "l_shipdate"])
    orders = spark.createDataFrame(
        [(1, 1, "F", 1.0, "1995-01-01", "1-URGENT"),
         (2, 1, "F", 1.0, "1995-01-01", "1-URGENT"),
         (3, 1, "F", 1.0, "1995-01-01", "1-URGENT")],
        ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
         "o_orderdate", "o_orderpriority"])
    supplier = spark.createDataFrame(
        [(10, "Supp#10", 1, 100.0), (20, "Supp#20", 1, 100.0),
         (30, "Supp#30", 1, 100.0)],
        ["s_suppkey", "s_name", "s_nationkey", "s_acctbal"])
    patch_load({"lineitem": li, "orders": orders, "supplier": supplier})
    out = entrymod.queries()["sole_blame_supplier"](spark, "i").collect()
    assert [(r.s_name, r.numwait) for r in out] == [("Supp#10", 1)]


def test_ohlc_bars_ties_and_single_tick(spark, patch_load):
    rows = [
        # same-timestamp ticks: open/close must follow event_id order
        (1, "2024-01-01 10:00:00", 1, "click", 5.0, "{}"),
        (2, "2024-01-01 10:00:00", 1, "click", 9.0, "{}"),
        (3, "2024-01-01 11:00:00", 1, "click", 1.0, "{}"),
        # single tick in its bucket: open=high=low=close
        (4, "2024-01-02 00:00:00", 1, "click", 7.0, "{}"),
    ]
    patch_load({"events": _events_df(spark, rows)})
    out = {
        str(r["bucket_ts"]): r
        for r in entrymod._REGISTRY["ohlc_bars"][0](spark, "ignored").collect()
    }
    d1 = out["2024-01-01 00:00:00"]
    assert (d1["open"], d1["high"], d1["low"], d1["close"]) == (5.0, 9.0, 1.0, 1.0)
    d2 = out["2024-01-02 00:00:00"]
    assert (d2["open"], d2["high"], d2["low"], d2["close"]) == (7.0, 7.0, 7.0, 7.0)
    assert d2["n_ticks"] == 1


def test_time_weighted_avg_locf_weights(spark, patch_load):
    rows = [
        # value 10 held 30s, value 20 held 10s, last sample no weight
        (1, "2024-01-01 10:00:00", 1, "click", 10.0, "{}"),
        (2, "2024-01-01 10:00:30", 1, "click", 20.0, "{}"),
        (3, "2024-01-01 10:00:40", 1, "click", 99.0, "{}"),
        # single-sample user: no spans, must not appear
        (4, "2024-01-01 10:00:00", 2, "click", 5.0, "{}"),
    ]
    patch_load({"events": _events_df(spark, rows)})
    out = entrymod._REGISTRY["time_weighted_avg"][0](spark, "ignored").collect()
    assert {r["user_id"] for r in out} == {1}
    r = out[0]
    assert r["twa_value"] == pytest.approx((10 * 30 + 20 * 10) / 40)
    assert r["span_us"] == 40_000_000
    assert r["n_spans"] == 2


def test_gap_fill_locf_fills_interior_days_only(spark, patch_load):
    rows = [
        # user 1 observed on day 1 and day 4 -> days 2,3 filled with day-1 close
        (1, "2024-01-01 09:00:00", 1, "click", 3.0, "{}"),
        (2, "2024-01-01 10:00:00", 1, "click", 4.0, "{}"),
        (3, "2024-01-04 10:00:00", 1, "click", 8.0, "{}"),
    ]
    patch_load({"events": _events_df(spark, rows)})
    out = sorted(
        entrymod._REGISTRY["gap_fill_locf"][0](spark, "ignored").collect(),
        key=lambda r: str(r["day"]),
    )
    assert [str(r["day"])[:10] for r in out] == [
        "2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04",
    ]
    # day-1 close is the later event (event_id 2), carried through the gap
    assert [r["value"] for r in out] == [4.0, 4.0, 4.0, 8.0]
    assert [r["is_filled"] for r in out] == [False, True, True, False]


# --- round-2 batch: pagerank / packing / skyline / diff semantics -----------


def test_pagerank_fixed_star_graph(spark):
    """Hub of a 3-spoke undirected star ends with the highest rank, all
    spokes tie, and total arithmetic is reproducible integer math."""
    from trainee_scala_module_8_kafka_streaming_etl_pipeline_spark.operators import (
        graph,
    )

    e = spark.createDataFrame(
        [("h", "a"), ("h", "b"), ("h", "c")], ["src", "dst"]
    )
    bi = e.unionAll(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    out = {r.node: r.rank for r in graph.pagerank_fixed(bi, iterations=3).collect()}
    assert out["a"] == out["b"] == out["c"]
    assert out["h"] > out["a"]

    # exact check: replay the operator's integer recurrence
    # (rank div outdeg, then base + (85 * inflow) div 100) in Python
    def model(iters):
        scale, base = 10**9, 150_000_000
        edges_py = [(s, d) for s in "h" for d in "abc"] + [
            (d, "h") for d in "abc"
        ]
        outdeg = {"h": 3, "a": 1, "b": 1, "c": 1}
        rank = {n: scale for n in "habc"}
        for _ in range(iters):
            inflow = {n: 0 for n in rank}
            for s, d in edges_py:
                inflow[d] += rank[s] // outdeg[s]
            rank = {n: base + (85 * inflow[n]) // 100 for n in rank}
        return rank

    assert out == model(3)
    # exact determinism across runs
    out2 = {r.node: r.rank for r in graph.pagerank_fixed(bi, iterations=3).collect()}
    assert out == out2


def test_pagerank_fixed_dangling_node(spark):
    """A sink node (no out-edges) still receives rank; its inflow never
    returns (simplified PR: lost mass is acceptable and deterministic)."""
    from trainee_scala_module_8_kafka_streaming_etl_pipeline_spark.operators import (
        graph,
    )

    e = spark.createDataFrame([("a", "b")], ["src", "dst"])
    out = {r.node: r.rank for r in graph.pagerank_fixed(e, iterations=1).collect()}
    assert out["b"] == 150_000_000 + (85 * 10**9) // 100
    assert out["a"] == 150_000_000  # no inflow


def test_sequence_pack_bins_are_contiguous(spark, patch_load):
    """Cumulative binning: bin id = exclusive-prefix-sum div budget, so
    a doc lands in the bin its first token falls into; doc order within
    a source is doc_id order."""
    docs = spark.createDataFrame(
        [
            # source s: 3 docs x 1500 tokens -> cum 0,1500,3000 -> bins 0,0,1
            (1, " ".join(["w"] * 1500), "en", "s", 1),
            (2, " ".join(["w"] * 1500), "en", "s", 1),
            (3, " ".join(["w"] * 1500), "en", "s", 1),
        ],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    patch_load({"documents": docs})
    rows = {
        (r.source, r.bin): (r.n_docs, r.first_doc, r.last_doc)
        for r in entrymod.queries()["sequence_pack"](spark, "x").collect()
    }
    assert rows[("s", 0)] == (2, 1, 2)
    assert rows[("s", 1)] == (1, 3, 3)


def test_pareto_frontier_dominance(spark, patch_load):
    """Only non-dominated (price asc, size desc) points survive; equal
    price + smaller size is dominated; duplicate signatures collapse."""
    parts = spark.createDataFrame(
        [
            (1, "x", "m", "b", "t", 10, "c", 5.0, "z"),
            (2, "x", "m", "b", "t", 8, "c", 5.0, "z"),   # same price, smaller size: dominated
            (3, "x", "m", "b", "t", 12, "c", 7.0, "z"),  # pricier but bigger: frontier
            (4, "x", "m", "b", "t", 9, "c", 9.0, "z"),   # pricier and smaller: dominated
            (5, "x", "m", "b", "t", 10, "c", 5.0, "z"),  # duplicate of 1
        ],
        [
            "p_partkey", "p_name", "p_mfgr", "p_brand", "p_type",
            "p_size", "p_container", "p_retailprice", "p_comment",
        ],
    )
    patch_load({"part": parts})
    out = {
        (r.price, r.psize): r.n_parts
        for r in entrymod.queries()["pareto_frontier"](spark, "x").collect()
    }
    assert out == {(5.0, 10): 2, (7.0, 12): 1}


def test_snapshot_diff_statuses(spark, patch_load):
    rows = [
        # user 1: events both before and after cutoff -> changed
        (1, "2024-01-10 00:00:00", 1, "view", 1.0, "{}"),
        (2, "2024-01-20 00:00:00", 1, "click", 2.0, "{}"),
        # user 2: only post-cutoff -> added
        (3, "2024-01-16 00:00:00", 2, "view", 1.0, "{}"),
        # user 3: only pre-cutoff -> unchanged (same latest event id)
        (4, "2024-01-01 00:00:00", 3, "purchase", 9.0, "{}"),
    ]
    patch_load({"events": _events_df(spark, rows)})
    out = {
        r.user_id: r.status
        for r in entrymod.queries()["snapshot_diff"](spark, "x").collect()
    }
    assert out == {1: "changed", 2: "added", 3: "unchanged"}


def test_dup_ngram_coverage_shared_vs_unique(spark, patch_load):
    """A 5-gram repeated across docs counts toward dup coverage; a
    within-doc-only repeat does not (df is per-document)."""
    shared = "alpha beta gamma delta epsilon"
    docs = spark.createDataFrame(
        [
            (1, shared + " zeta", "en", "s", 1),      # grams: shared..., 2 grams
            (2, shared + " theta", "en", "s", 1),
            (3, "one two three four five", "en", "s", 1),  # unique grams
        ],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    patch_load({"documents": docs})
    out = {
        r.doc_id: (r.n_grams, r.n_dup_grams)
        for r in entrymod.queries()["dup_ngram_coverage"](spark, "x").collect()
    }
    # docs 1/2 share exactly the first 5-gram "alpha beta gamma delta epsilon"
    assert out[1] == (2, 1) and out[2] == (2, 1)
    assert out[3] == (1, 0)


def test_attribution_last_touch_window(spark, patch_load):
    """Purchase credits the latest click <=24h before it; older clicks
    leave the purchase unattributed (-1)."""
    rows = [
        (1, "2024-01-01 09:00:00", 1, "click", 0.0, "{}"),
        (2, "2024-01-01 10:00:00", 1, "purchase", 5.0, "{}"),   # -> hour 9
        (3, "2024-01-05 10:00:00", 1, "purchase", 7.0, "{}"),   # click too old -> -1
        (4, "2024-01-02 00:00:00", 2, "purchase", 3.0, "{}"),   # user never clicked -> -1
    ]
    patch_load({"events": _events_df(spark, rows)})
    out = {
        r.attr_hour: (r.n_purchases, r.attributed_value)
        for r in entrymod.queries()["attribution_last_touch"](spark, "x").collect()
    }
    assert out[9] == (1, 5.0)
    assert out[-1] == (2, 10.0)


def test_time_grain_rollup_pyramid(spark, patch_load):
    """One event appears once per grain; week buckets align Mondays."""
    rows = [
        (1, "2024-01-03 10:30:00", 1, "view", 2.0, "{}"),  # Wed -> week of Jan 1
        (2, "2024-01-03 11:30:00", 1, "view", 4.0, "{}"),
    ]
    patch_load({"events": _events_df(spark, rows)})
    got = entrymod.queries()["time_grain_rollup"](spark, "x").collect()
    by_grain = {}
    for r in got:
        by_grain.setdefault(r.grain, []).append(r)
    assert len(by_grain["hour"]) == 2          # two distinct hours
    assert len(by_grain["day"]) == 1
    assert len(by_grain["week"]) == 1
    wk = by_grain["week"][0]
    assert str(wk.bucket) == "2024-01-01 00:00:00" and wk.total_value == 6.0


def test_sorted_neighborhood_adjacent_only(spark, patch_load):
    """Only next-1/next-2 neighbors in name order are compared, within
    the brand block."""
    parts = spark.createDataFrame(
        [
            (1, "abcde", "B1", "t", 1, 1.0),
            (2, "abcdf", "B1", "t", 1, 1.0),   # lev 1 from abcde, adjacent
            (3, "zzzzz", "B1", "t", 1, 1.0),   # far in sort AND in distance
            (4, "abcdg", "B2", "t", 1, 1.0),   # other block: never paired
        ],
        ["p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"],
    )
    patch_load({"part": parts})
    out = {
        (r.name_a, r.name_b): r.dist
        for r in entrymod.queries()["sorted_neighborhood_pairs"](spark, "x").collect()
    }
    assert out == {("abcde", "abcdf"): 1}


def test_quantile_sketch_interpolation(spark, patch_load):
    """10 values 0..9 with bin width 5: p50 target k=5 falls in bin 0
    (cum 5), est = 0 + 5*(5-0)/5 = 5.0; p90 k=9 in bin 1: 5 + 5*(9-5)/5."""
    rows = [
        (i, "2024-01-01 10:00:00", 1, "view", float(i), "{}") for i in range(10)
    ]
    patch_load({"events": _events_df(spark, rows)})
    out = {
        r.event_type: (r.n, r.p50_est, r.p90_est)
        for r in entrymod.queries()["quantile_sketch"](spark, "x").collect()
    }
    assert out["view"] == (10, 5.0, 9.0)


def test_incremental_agg_merge_equals_full(spark, patch_load):
    """Partial-state merge must equal the one-pass aggregate, including
    a user whose events all land in one side of the split."""
    rows = [
        (10, "2024-01-01 10:00:00", 1, "view", 1.5, "{}"),   # delta (id%10==0)
        (11, "2024-01-01 11:00:00", 1, "view", 2.5, "{}"),   # base
        (13, "2024-01-01 12:00:00", 2, "view", 4.0, "{}"),   # base only
    ]
    patch_load({"events": _events_df(spark, rows)})
    out = {
        r.user_id: (r.n_events, r.total_value, r.last_offset)
        for r in entrymod.queries()["incremental_agg_merge"](spark, "x").collect()
    }
    assert out == {1: (2, 4.0, 11), 2: (1, 4.0, 13)}


def test_per_group_sample_deterministic(spark, patch_load):
    docs = spark.createDataFrame(
        [(i, "t", "en" if i % 2 else "de", "s", 1) for i in range(10)],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    patch_load({"documents": docs})
    run = lambda: sorted(
        (r.lang, r.rk, r.doc_id)
        for r in entrymod.queries()["per_group_sample"](spark, "x").collect()
    )
    first = run()
    assert first == run()                      # reproducible
    assert len([x for x in first if x[0] == "en"]) == 3
    assert len([x for x in first if x[0] == "de"]) == 3


def test_cohort_matrix_offsets(spark, patch_load):
    """Users cohort at their first week; later-week activity lands at
    the right offset; retention is active/cohort_size."""
    rows = [
        # u1 first week of Jan 1 (Mon), active again week of Jan 8
        (1, "2024-01-02 10:00:00", 1, "view", 1.0, "{}"),
        (2, "2024-01-09 10:00:00", 1, "view", 1.0, "{}"),
        # u2 same cohort, never returns
        (3, "2024-01-03 10:00:00", 2, "view", 1.0, "{}"),
    ]
    patch_load({"events": _events_df(spark, rows)})
    out = {
        (str(r.cohort_week), r.week_offset): (r.n_active, r.retention)
        for r in entrymod.queries()["cohort_matrix"](spark, "x").collect()
    }
    assert out[("2024-01-01 00:00:00", 0)] == (2, 1.0)
    assert out[("2024-01-01 00:00:00", 1)] == (1, 0.5)


def test_skew_audit_gini_extremes(spark, patch_load):
    """Uniform keys -> gini ~0; one dominant key -> high gini and
    max_skew_ratio = hottest/fair-share."""
    uniform = [
        (i, "2024-01-01 10:00:00", i % 4, "view", 1.0, "{}") for i in range(8)
    ]
    patch_load({"events": _events_df(spark, uniform)})
    [r] = entrymod.queries()["skew_audit"](spark, "x").collect()
    assert r.n_keys == 4 and r.n_rows == 8 and r.max_key_rows == 2
    assert r.max_skew_ratio == 1.0
    assert abs(r.gini) < 0.01

    hot = [(i, "2024-01-01 10:00:00", 0 if i < 9 else 1, "view", 1.0, "{}")
           for i in range(10)]
    patch_load({"events": _events_df(spark, hot)})
    [r] = entrymod.queries()["skew_audit"](spark, "x").collect()
    assert r.max_key_rows == 9 and r.max_skew_ratio == 1.8
    assert r.gini > 0.3


def test_benford_digit_extraction_truncates(spark, patch_load):
    """999.6 must yield digit 9 (floor), not 1 (round-to-1000)."""
    orders = spark.createDataFrame(
        [(1, 1, "O", 999.6, "2024-01-01", "1-URGENT"),
         (2, 1, "O", 23.4, "2024-01-01", "1-URGENT")],
        ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
         "o_orderdate", "o_orderpriority"],
    )
    patch_load({"orders": orders})
    out = {r.d: r.n for r in entrymod.queries()["benford_audit"](spark, "x").collect()}
    assert out == {9: 1, 2: 1}


def test_changepoint_finds_mean_shift_day(spark, patch_load):
    """A series that jumps on day 3 peaks its |CUSUM| at the last
    pre-shift day (cumulative deviation is most negative there)."""
    rows, eid = [], 0
    for day, val in [(1, 1.0), (2, 1.0), (3, 9.0), (4, 9.0)]:
        for _ in range(5):
            eid += 1
            rows.append((eid, f"2024-01-0{day} 10:00:00", 1, "view", val, "{}"))
    patch_load({"events": _events_df(spark, rows)})
    [r] = entrymod.queries()["changepoint_cusum"](spark, "x").collect()
    assert str(r.change_day) == "2024-01-02 00:00:00"


def test_path_ngrams_ordered_by_event_time(spark, patch_load):
    rows = [
        (1, "2024-01-01 10:00:00", 1, "view", 1.0, "{}"),
        (2, "2024-01-01 10:01:00", 1, "click", 1.0, "{}"),
        (3, "2024-01-01 10:02:00", 1, "purchase", 1.0, "{}"),
        (4, "2024-01-01 10:03:00", 1, "view", 1.0, "{}"),
        # user 2 too short for a trigram
        (5, "2024-01-01 10:00:00", 2, "view", 1.0, "{}"),
        (6, "2024-01-01 10:01:00", 2, "click", 1.0, "{}"),
    ]
    patch_load({"events": _events_df(spark, rows)})
    out = {r.trigram: (r.n, r.n_users)
           for r in entrymod.queries()["path_ngrams"](spark, "x").collect()}
    assert out == {"view>click>purchase": (1, 1), "click>purchase>view": (1, 1)}


def test_k_anonymity_small_groups_flagged(spark, patch_load):
    cust = spark.createDataFrame(
        [(i, "n", 1, 500.0, "SEG") for i in range(4)]     # one group of 4
        + [(10, "n", 2, 500.0, "SEG")],                   # singleton group
        ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"],
    )
    patch_load({"customer": cust})
    out = {r.k: (r.n_groups_below_k, r.n_rows_at_risk, r.n_groups)
           for r in entrymod.queries()["k_anonymity_audit"](spark, "x").collect()}
    assert out[2] == (1, 1, 2)   # only the singleton below k=2
    assert out[5] == (2, 5, 2)   # both groups below k=5


def test_content_chunks_offset_invariant(spark, patch_load):
    """The CDC property: a shared passage chunks identically even when
    shifted by a prefix edit, so shared blocks are detected; with two
    docs = prefix + same long passage, most chunk occurrences are
    shared."""
    passage = "the quick brown fox jumps over the lazy dog " * 20
    docs = spark.createDataFrame(
        [(1, passage, "en", "s", 1),
         (2, "zzz unique prefix " + passage, "en", "s", 1)],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    patch_load({"documents": docs})
    [r] = entrymod.queries()["content_chunk_dedup"](spark, "x").collect()
    # the interior boundaries align after the first shared boundary, so
    # the bulk of occurrences are shared between the two docs
    assert r.n_shared_occurrences > 0
    assert r.shared_frac > 0.5


def test_gopher_rules_each_rule_discriminates(spark, patch_load):
    """One doc per failing rule plus one clean keeper: too short, bad
    mean word length (digit soup is fine — length rule), low alpha
    fraction, symbol spam, and no stopwords."""
    good = "the quick brown fox and the lazy dog of it is in to " * 3  # 36 words
    docs = spark.createDataFrame(
        [
            (1, good, "en", "s", 1),
            (2, "the of it", "en", "s", 1),                       # too few words
            (3, "the of " + "x " * 30, "en", "s", 1),             # mean len < 3
            (4, "the of it is " + "1 2 3 4 " * 8, "en", "s", 1),  # alpha frac low
            (5, good + " " + "# " * 20, "en", "s", 1),            # symbol spam
            (6, "words without common stopword markers " * 6, "en", "s", 1),
        ],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    patch_load({"documents": docs})
    out = {r.doc_id: r for r in
           entrymod.queries()["gopher_quality_filter"](spark, "x").collect()}
    assert out[1].keep == 1
    for bad in (2, 3, 4, 5, 6):
        assert out[bad].keep == 0, bad
    # per-rule columns expose WHICH rule fired
    assert out[2].n_words < 20
    assert out[3].mean_word_len < 3.0
    assert out[4].alpha_word_frac < 0.8
    assert out[5].symbol_ratio > 0.1
    assert out[6].stop_hits < 2


def test_semantic_decontaminate_flags_near_bench_vector(spark, patch_load):
    """A corpus vector equal to a benchmark vector is flagged (cos=1);
    an orthogonal one is not; nearest ties break to the lowest bench id."""
    dim = 64
    e = [0.0] * dim
    ax0 = list(e); ax0[0] = 1.0
    ax1 = list(e); ax1[1] = 1.0
    rows = [
        (3, ax0, 0),            # bench (3 % 97 == 3)
        (10, ax0, 0),           # duplicate of bench -> contaminated
        (11, ax1, 0),           # orthogonal -> clean
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding", "label"]) \
        .withColumn("embedding", F.col("embedding").cast("array<float>"))
    patch_load({"embeddings": emb})
    out = {r.vec_id: r for r in
           entrymod.queries()["semantic_decontaminate"](spark, "x").collect()}
    assert out[10].contaminated == 1 and out[10].nearest_bench_id == 3
    assert out[10].max_cos == 1.0
    assert out[11].contaminated == 0


def test_psi_drift_flags_shifted_distribution(spark, patch_load):
    """Type 'shift' moves all mass from bin 0 to bin 19 between halves
    -> large PSI; type 'flat' is identical in both halves -> tiny PSI
    (only smoothing noise)."""
    rows = []
    eid = 0
    # first half: Jan 1; second half: Jan 9 (midpoint ~Jan 5)
    for day, half in (("2024-01-01", "ref"), ("2024-01-09", "cur")):
        for i in range(50):
            eid += 1
            shift_val = 1.0 if half == "ref" else 480.0  # bin 0 vs bin 19
            rows.append((eid, f"{day} 10:00:{i:02d}", 1, "shift", shift_val, "{}"))
            eid += 1
            # one negative value per half: clamps into bin 0, no row lost
            flat_val = -5.0 if i == 0 else 100.0
            rows.append((eid, f"{day} 11:00:{i:02d}", 1, "flat", flat_val, "{}"))
    patch_load({"events": _events_df(spark, rows)})
    out = {r.event_type: r for r in
           entrymod.queries()["psi_drift"](spark, "x").collect()}
    assert out["shift"].drifted == 1 and out["shift"].psi > 1.0
    assert out["flat"].drifted == 0 and abs(out["flat"].psi) < 0.01
    assert out["flat"].n_ref == 50 and out["flat"].n_cur == 50


def test_es_topk_sample_size_determinism_and_weight_dominance(spark):
    from trainee_scala_module_8_kafka_streaming_etl_pipeline_spark.operators import (
        sampling,
    )

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") == 7, 1e9).otherwise(1.0).alias("w"),
    )
    a = sampling.es_topk_sample(df, "w", k=50).collect()
    b = sampling.es_topk_sample(df, "w", k=50).collect()
    assert len(a) == 50
    assert [r.doc_id for r in a] == [r.doc_id for r in b]  # rerun-identical
    assert 7 in {r.doc_id for r in a}  # giant weight dominates
    # zero/negative weights never sampled
    z = df.withColumn("w", F.when(F.col("doc_id") < 990, -1.0).otherwise(1.0))
    picked = {r.doc_id for r in sampling.es_topk_sample(z, "w", k=50).collect()}
    assert picked and all(d >= 990 for d in picked)
    # the k-smallest selection plans as TakeOrderedAndProject (heap
    # merge), not a global sort shuffle
    plan = sampling.es_topk_sample(df, "w", k=50)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_ewma_ramp_up_and_weights(spark, patch_load):
    """Row 1 is its own EWMA (no history); row 2 blends with weight
    (1-alpha)=0.7 on the lag; a key's rows never leak into another key."""
    rows = [
        (1, "2024-01-01 10:00:00", 1, "view", 10.0, "{}"),
        (2, "2024-01-01 11:00:00", 1, "view", 20.0, "{}"),
        (3, "2024-01-01 12:00:00", 1, "view", 30.0, "{}"),
        (4, "2024-01-01 10:30:00", 1, "click", 100.0, "{}"),
    ]
    patch_load({"events": _events_df(spark, rows)})
    out = {r.event_id: r.ewma for r in
           entrymod.queries()["ewma_smooth"](spark, "x").collect()}
    assert out[1] == 10.0
    # (20 + 0.7*10) / 1.7
    assert abs(out[2] - 27.0 / 1.7) < 1e-6
    # (30 + 0.7*20 + 0.49*10) / 2.19
    assert abs(out[3] - 48.9 / 2.19) < 1e-6
    assert out[4] == 100.0  # other key unaffected


def test_dow_seasonality_index_averages_to_type_mean(spark, patch_load):
    """2024-01-01 is a Monday (weekday 0).  Mon mean 10, Tue mean 30 ->
    overall 20, indices 0.5 / 1.5."""
    rows = [
        (1, "2024-01-01 10:00:00", 1, "view", 10.0, "{}"),
        (2, "2024-01-02 10:00:00", 1, "view", 30.0, "{}"),
    ]
    patch_load({"events": _events_df(spark, rows)})
    out = {r.weekday: (r.dow_mean, r.seasonal_index) for r in
           entrymod.queries()["dow_seasonality"](spark, "x").collect()}
    assert out[0] == (10.0, 0.5)
    assert out[1] == (30.0, 1.5)


def test_kcore_peel_cascades_and_flags_convergence(spark):
    """Star + triangle: k=2 peel removes the leaves in round 1, which
    drops the hub in round 2; the triangle survives as the 2-core."""
    from trainee_scala_module_8_kafka_streaming_etl_pipeline_spark.operators.graph import (
        kcore_peel,
    )

    edges = spark.createDataFrame(
        # triangle 1-2-3; hub 10 with leaves 11,12 and a spoke into 1
        [(1, 2), (2, 3), (1, 3), (10, 11), (10, 12), (1, 10)],
        ["u", "v"],
    )
    out = kcore_peel(edges, k=2, rounds=3).collect()
    by_node = {r.node: (r.core_degree, r.converged) for r in out}
    assert set(by_node) == {1, 2, 3}
    assert all(d == 2 for d, _ in by_node.values())
    assert all(c for _, c in by_node.values())

    # one round only: leaves are gone but the hub (still deg-3 in round
    # 1's input) survives; convergence is unknown -> False (the in-plan
    # flag has no previous round to compare against)
    partial = {
        r.node: r.converged for r in kcore_peel(edges, k=2, rounds=1).collect()
    }
    assert set(partial) == {1, 2, 3, 10}
    assert not any(partial.values())

    # two rounds on this graph still shrink (hub drops in round 2), so
    # the last two survivor counts differ -> converged False even
    # though the SETS after round 2 happen to be the final core
    two = kcore_peel(edges, k=2, rounds=2).collect()
    assert {r.node for r in two} == {1, 2, 3}
    assert not any(r.converged for r in two)


def test_pq_topk_exact_duplicate_ranks_first(spark):
    """A vector identical to the query shares all 8 codes, so its
    asymmetric distance equals the query's own self-distance table sum
    -> strictly minimal; approx_d2 is exactly the quantized q-to-code
    distance, and rank 1 with id tiebreak."""
    import random

    from trainee_scala_module_8_kafka_streaming_etl_pipeline_spark.operators.similarity import (
        pq_topk,
    )

    rng = random.Random(7)
    rows = []
    for vid in range(220):
        rows.append((vid, [rng.uniform(-1, 1) for _ in range(64)]))
    rows[200] = (200, list(rows[0][1]))  # exact duplicate of query 0
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = {(r.query_id, r.rnk): (r.neighbor_id, r.approx_d2)
           for r in pq_topk(emb, n_queries=1, k=3).collect()}
    nid, _ = out[(0, 1)]
    assert nid == 200
    # duplicate's distance can't exceed any other neighbor's
    assert out[(0, 1)][1] <= out[(0, 2)][1] <= out[(0, 3)][1]


def test_temperature_mixture_flattens_source_skew(spark, patch_load):
    """alpha=0.5 keep rates: a source 100x larger gets a ~10x LOWER
    keep rate, so realized shares flatten toward each other; tiny
    sources clamp at 100%."""
    rows = [(i, "t", "en", "big", 10) for i in range(1000)]
    rows += [(10_000 + i, "t", "en", "small", 10) for i in range(10)]
    docs = spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    )
    patch_load({"documents": docs})
    out = {r.source: (r.n_total, r.rate_bp, r.n_kept)
           for r in entrymod.queries()["temperature_mixture"](spark, "x").collect()}
    n_b, rate_b, kept_b = out["big"]
    n_s, rate_s, kept_s = out["small"]
    assert (n_b, n_s) == (1000, 10)
    assert rate_s == 10000  # clamped: keep everything from the tiny source
    # unclamped rates scale as 1/sqrt(n): the 100x-larger source keeps
    # ~46% here (0.5 * 1010 * sqrt(1000)/34.78 / 1000 = 0.459)
    assert rate_b == 4591
    assert kept_s == 10
    # realized keep tracks the rate (hash buckets are near-uniform)
    assert abs(kept_b / n_b - rate_b / 10000) < 0.05


def test_ngram_novelty_first_seen_by_ingest_order(spark, patch_load):
    """First doc is fully novel; an exact later duplicate has zero
    novelty; a half-overlapping doc scores its new-gram share."""
    base = "alpha beta gamma delta epsilon zeta"          # grams: 2 (6 words)
    docs = spark.createDataFrame(
        [
            (1, base, "en", "s", len(base)),
            (2, base, "en", "s", len(base)),              # pure duplicate
            (3, "alpha beta gamma delta epsilon eta", "en", "s", 1),  # 1 shared, 1 new
        ],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    patch_load({"documents": docs})
    out = {r.doc_id: (r.n_grams, r.n_novel, r.novelty) for r in
           entrymod.queries()["ngram_novelty"](spark, "x").collect()}
    assert out[1] == (2, 2, 1.0)
    assert out[2] == (2, 0, 0.0)
    assert out[3] == (2, 1, 0.5)


def test_funnel_windowed_timeout_excludes_late_conversion(spark, patch_load):
    """A click 13h after first view is outside the 12h window: counted
    in the strict funnel, excluded here."""
    rows = [
        (1, "2024-01-01 00:00:00", 1, "view", 1.0, "{}"),
        (2, "2024-01-01 13:00:00", 1, "click", 1.0, "{}"),   # late: 13h
        (3, "2024-01-02 00:00:00", 2, "view", 1.0, "{}"),
        (4, "2024-01-02 06:00:00", 2, "click", 1.0, "{}"),   # in-window
        (5, "2024-01-02 07:00:00", 2, "purchase", 1.0, "{}"),
    ]
    patch_load({"events": _events_df(spark, rows)})
    [r] = entrymod.queries()["funnel_windowed"](spark, "x").collect()
    assert (r.n_view, r.n_click_12h, r.n_purchase_12h) == (2, 1, 1)
    assert r.view_to_click == 0.5
    assert r.click_to_purchase == 1.0


def test_hard_negatives_split_by_label_and_exclude_self(spark):
    """Positives and negatives rank independently; the anchor never
    appears; an identical other-label vector is the #1 hard negative."""
    from trainee_scala_module_8_kafka_streaming_etl_pipeline_spark.operators.similarity import (
        hard_negatives,
    )

    import random

    def vec(seed):
        rng = random.Random(seed)
        return [rng.uniform(-1, 1) for _ in range(64)]

    rows = [(0, vec(1), 1)]                 # anchor, label 1
    rows += [(i, vec(i + 1), 1) for i in range(1, 5)]      # same label
    rows += [(10 + i, vec(i + 20), 2) for i in range(0, 4)]  # other label
    rows.append((99, vec(1), 2))            # identical vector, other label
    emb = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    out = hard_negatives(emb, n_queries=1, k=3).collect()
    ids = {r.neighbor_id for r in out}
    assert 0 not in ids
    pos = [r for r in out if r.label_match]
    neg = [r for r in out if not r.label_match]
    assert len(pos) == 3 and len(neg) == 3
    top_neg = min(neg, key=lambda r: r.rnk)
    assert top_neg.neighbor_id == 99 and top_neg.cos == 1.0


def test_rfm_segments_partition_and_totals(spark, patch_load):
    """Quintile counts sum to the customer count and segment averages
    recover the per-customer spend on a small hand case."""
    import pyspark.sql.functions as F

    orders = spark.createDataFrame(
        [(i, i % 10, "O", 100.0 * (1 + i % 10), f"2024-01-{1 + i % 20:02d}",
          "1-URGENT") for i in range(40)],
        ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
         "o_orderdate", "o_orderpriority"],
    ).withColumn("o_orderdate", F.to_timestamp("o_orderdate"))
    patch_load({"orders": orders})
    out = entrymod.queries()["rfm_segments"](spark, "x").collect()
    assert sum(r.n_customers for r in out) == 10
    assert all(1 <= r.r_score <= 5 and 1 <= r.f_score <= 5
               and 1 <= r.m_score <= 5 for r in out)
    # every customer has 4 equal-priced orders -> a segment's avg equals
    # 4x a member's order price; prices are multiples of 100
    assert all(abs(r.avg_monetary % 100) < 1e-9 for r in out)


def test_winsorized_mean_clips_extremes(spark, patch_load):
    """One huge spike gets clipped to the group's p95, pulling the
    winsorized mean far below the raw mean."""
    rows = [(i, "2024-01-01 10:00:00", 1, "view", 10.0, "{}")
            for i in range(19)]
    rows.append((99, "2024-01-01 11:00:00", 1, "view", 10000.0, "{}"))
    patch_load({"events": _events_df(spark, rows)})
    [r] = entrymod.queries()["winsorized_stats"](spark, "x").collect()
    assert r.n == 20
    raw_mean = (19 * 10.0 + 10000.0) / 20
    assert r.winsorized_mean < raw_mean / 2
    assert r.winsorized_mean >= 10.0


def test_seasonal_outliers_respect_weekday_cells(spark, patch_load):
    """A value normal for its own weekday cell is not flagged even when
    the OTHER weekday's values are far away; a within-cell spike is."""
    rows = []
    eid = 0
    # Monday cell: tight around 10, one spike at 1000
    for v in [10.0] * 30 + [10.5] * 30 + [1000.0]:
        eid += 1
        rows.append((eid, "2024-01-01 10:00:00", 1, "view", v, "{}"))
    # Tuesday cell: tight around 500 (normal-for-Tuesday; never flagged)
    for v in [500.0] * 30 + [500.5] * 30:
        eid += 1
        rows.append((eid, "2024-01-02 10:00:00", 1, "view", v, "{}"))
    patch_load({"events": _events_df(spark, rows)})
    out = entrymod.queries()["seasonal_outliers"](spark, "x").collect()
    assert [r.value for r in out] == [1000.0]
    assert out[0].weekday == 0


def test_attribution_position_u_shape_credits(spark, patch_load):
    """4 touches -> 0.4/0.1/0.1/0.4; post-purchase touches excluded;
    total credit equals the number of converting users."""
    rows = [
        (1, "2024-01-01 10:00:00", 1, "view", 1.0, "{}"),
        (2, "2024-01-01 10:10:00", 1, "click", 1.0, "{}"),
        (3, "2024-01-01 10:20:00", 1, "view", 1.0, "{}"),
        (4, "2024-01-01 10:30:00", 1, "click", 1.0, "{}"),
        (5, "2024-01-01 11:00:00", 1, "purchase", 5.0, "{}"),
        (6, "2024-01-01 12:00:00", 1, "view", 1.0, "{}"),   # post-purchase
    ]
    patch_load({"events": _events_df(spark, rows)})
    out = {r.event_type: (r.n_touches, r.credited_conversions) for r in
           entrymod.queries()["attribution_position"](spark, "x").collect()}
    # view: pos1 (0.4) + pos3 (0.1); click: pos2 (0.1) + pos4-last (0.4)
    assert out["view"] == (2, 0.5)
    assert out["click"] == (2, 0.5)


def test_containment_catches_embedded_quote_jaccard_misses(spark):
    """A short doc fully embedded in a 10x-larger one: containment ~1.0
    while Jaccard ~0.1 (below the near-dup threshold) — the asymmetric
    pair appears only in containment_pairs."""
    from trainee_scala_module_8_kafka_streaming_etl_pipeline_spark.operators.dedup import (
        containment_pairs,
        verified_near_dups,
    )

    quote = ("the quick brown fox jumps over the lazy dog again and again "
             "in the bright morning sun near the quiet river bank")
    # ~35% filler: Jaccard drops below the 0.8 near-dup threshold while
    # banding (which tracks Jaccard) still surfaces the candidate — the
    # regime this operator covers; extreme size ratios are the
    # documented chunk-blocking hand-off.
    filler = " ".join(f"xq{i} zw{i}" for i in range(8))
    docs = spark.createDataFrame(
        [(1, quote, "en", "s", 1), (2, quote + " " + filler, "en", "s", 1)],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    cont = containment_pairs(docs).collect()
    assert [(r.doc_a, r.doc_b) for r in cont] == [(1, 2)]
    assert cont[0].containment > 0.95
    assert verified_near_dups(docs).count() == 0


def test_out_of_order_audit_counts_inversions(spark, patch_load):
    """Events whose ts precedes the running max (by offset order) are
    late; lateness is the gap to that max."""
    rows = [
        (1, "2024-01-01 10:00:00", 1, "view", 1.0, "{}"),
        (2, "2024-01-01 10:10:00", 1, "view", 1.0, "{}"),
        (3, "2024-01-01 10:05:00", 1, "view", 1.0, "{}"),  # 5 min late
        (4, "2024-01-01 10:10:00", 1, "view", 1.0, "{}"),  # ties are NOT late
    ]
    patch_load({"events": _events_df(spark, rows)})
    [r] = entrymod.queries()["out_of_order_audit"](spark, "x").collect()
    assert (r.n_events, r.n_late) == (4, 1)
    assert r.max_late_us == 5 * 60 * 1_000_000
    assert r.late_frac == 0.25


def test_double_fire_pairs_cross_bucket_and_tolerance(spark, patch_load):
    """A repeat 29 min later pairs up even across a bucket boundary; a
    repeat 31 min later does not; different types never pair."""
    rows = [
        (1, "2024-01-01 10:14:00", 1, "view", 1.0, "{}"),
        (2, "2024-01-01 10:43:00", 1, "view", 2.0, "{}"),   # +29m: pair
        (3, "2024-01-01 11:20:00", 1, "view", 3.0, "{}"),   # +37m: no
        (4, "2024-01-01 10:20:00", 1, "click", 1.0, "{}"),  # other type
    ]
    patch_load({"events": _events_df(spark, rows)})
    out = [(r.first_id, r.dup_id, r.gap_us) for r in
           entrymod.queries()["double_fire_audit"](spark, "x").collect()]
    assert out == [(1, 2, 29 * 60 * 1_000_000)]


def test_mode_stats_tiebreak_lowest_id(spark, patch_load):
    """Two users tied at 2 events: the lower id is the mode."""
    rows = [
        (1, "2024-01-01 10:00:00", 7, "view", 1.0, "{}"),
        (2, "2024-01-01 10:01:00", 7, "view", 1.0, "{}"),
        (3, "2024-01-01 10:02:00", 3, "view", 1.0, "{}"),
        (4, "2024-01-01 10:03:00", 3, "view", 1.0, "{}"),
        (5, "2024-01-01 10:04:00", 9, "view", 1.0, "{}"),
    ]
    patch_load({"events": _events_df(spark, rows)})
    [r] = entrymod.queries()["mode_stats"](spark, "x").collect()
    assert (r.mode_user, r.mode_count, r.n_distinct_users) == (3, 2, 3)


def test_wow_growth_first_week_null_then_ratio(spark, patch_load):
    """First week NULL; second week growth = (v2-v1)/|v1|."""
    rows = [
        (1, "2024-01-01 10:00:00", 1, "view", 100.0, "{}"),  # week of Jan 1
        (2, "2024-01-08 10:00:00", 1, "view", 150.0, "{}"),  # next week
    ]
    patch_load({"events": _events_df(spark, rows)})
    out = {str(r.week): r.wow_growth for r in
           entrymod.queries()["wow_growth"](spark, "x").collect()}
    assert out["2024-01-01 00:00:00"] is None
    assert out["2024-01-08 00:00:00"] == 0.5


def test_embedding_norm_outliers_detects_injected_anomalies(spark, patch_load):
    """A zeroed vector and a double-scaled vector are flagged; normal
    unit-ish vectors are not; a fully-uniform corpus yields no rows
    (zero variance -> NULL z, not an error)."""
    import random

    rng = random.Random(3)

    def unit():
        v = [rng.gauss(0, 1) for _ in range(64)]
        s = sum(x * x for x in v) ** 0.5
        return [x / s * (1 + rng.uniform(-0.01, 0.01)) for x in v]

    rows = [(i, unit(), 1) for i in range(40)]
    rows.append((100, [0.0] * 64, 1))               # dead encoder output
    rows.append((101, [2.0 * x for x in unit()], 1))  # double-scaled
    patch_load({"embeddings": spark.createDataFrame(
        rows, ["vec_id", "embedding", "label"])})
    out = {r.vec_id for r in
           entrymod.queries()["embedding_norm_outliers"](spark, "x").collect()}
    assert out == {100, 101}

    uniform = [(i, [0.125] * 64, 1) for i in range(20)]
    patch_load({"embeddings": spark.createDataFrame(
        uniform, ["vec_id", "embedding", "label"])})
    assert entrymod.queries()["embedding_norm_outliers"](spark, "x").count() == 0


def test_division_heavy_entries_survive_degenerate_events(spark):
    """Zero-variance groups, single-event groups, identical timestamps,
    and zero-sum weeks must yield NULL statistics, never an ANSI
    divide-by-zero (regression for the nullif guards in wow_growth,
    value_outliers, seasonal_outliers, corr_matrix)."""
    import datetime as dt
    import tempfile

    import __spark_entry__ as entrymod

    base = dt.datetime(2024, 1, 1)
    rows = [
        (0, base, 1, "view", 5.0, "{}"),
        (1, base, 2, "view", 5.0, "{}"),                      # zero variance
        (2, base + dt.timedelta(days=7), 1, "click", 3.0, "{}"),
        (3, base + dt.timedelta(days=7), 2, "click", -3.0, "{}"),  # week sums 0
        (4, base + dt.timedelta(days=14), 1, "click", 1.0, "{}"),
        (5, base, 3, "error", 2.0, "{}"),                     # n = 1 group
    ]
    tmp = tempfile.mkdtemp(prefix="degenerate_events_")
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/events.parquet")

    for name in [
        "wow_growth", "value_outliers", "seasonal_outliers",
        "value_trend_regression", "changepoint_cusum", "mad_outliers",
        "skew_audit", "time_weighted_avg", "dow_seasonality", "ewma_smooth",
    ]:
        entrymod._REGISTRY[name][0](spark, tmp).collect()  # must not raise

    wow = {
        (r.event_type, r.week): r.wow_growth
        for r in entrymod._REGISTRY["wow_growth"][0](spark, tmp).collect()
    }
    # the week after the zero-sum click week has NULL growth (|prev| = 0)
    click_weeks = sorted(w for t, w in wow if t == "click")
    assert wow[("click", click_weeks[-1])] is None


def test_embedding_entries_survive_zero_norm_vectors(spark):
    """A zero (or denormal) embedding must yield NULL cosines that fall
    out of every ranking — never an ANSI divide-by-zero (regression
    for the nullif guard in similarity.COS_SQL)."""
    import tempfile

    import __spark_entry__ as entrymod

    vecs = []
    for i in range(30):
        if i == 3:
            v = [0.0] * 64
        elif i == 4:
            v = [1e-30] * 64
        else:
            v = [float(((i * 31 + j * 7) % 13) - 6) for j in range(64)]
        vecs.append((i, v, i % 3))
    tmp = tempfile.mkdtemp(prefix="zero_norm_emb_")
    spark.createDataFrame(
        vecs, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/embeddings.parquet")

    for name in [
        "ann_cosine_topk", "ann_ivf_topk", "ann_ivf_pq_topk",
        "ann_rank_fusion", "semantic_decontaminate",
        "hard_negative_mining", "kmeans_embeddings",
    ]:
        entrymod._REGISTRY[name][0](spark, tmp).collect()  # must not raise

    # the zero vector never appears as a neighbor (NULL cosine ranks out)
    topk = entrymod._REGISTRY["ann_cosine_topk"][0](spark, tmp).collect()
    assert all(r["neighbor_id"] != 3 for r in topk)


def test_tpch_share_entries_survive_zero_revenue(spark):
    """Zero-revenue months and zero-quantity parts must give NULL
    shares, not ANSI divide-by-zero (regression for promo_revenue_share
    and dominant_part_supplier guards)."""
    import datetime as dt
    import tempfile

    import __spark_entry__ as entrymod

    tmp = tempfile.mkdtemp(prefix="degen_tpch_")
    base = dt.datetime(1995, 1, 1)
    spark.createDataFrame(
        [(1, "p1", "B", "T1", 0.0, 1)],
        "p_partkey long, p_name string, p_brand string, p_type string,"
        " p_retailprice double, p_size int",
    ).coalesce(1).write.parquet(f"{tmp}/part.parquet")
    spark.createDataFrame(
        [(1, "s1", 1, 0.0)],
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
    ).coalesce(1).write.parquet(f"{tmp}/supplier.parquet")
    spark.createDataFrame(
        [(1, 1, 1, 1, 0.0, 0.0, 0.0, 0.0, "N", "O", base)],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate timestamp",
    ).coalesce(1).write.parquet(f"{tmp}/lineitem.parquet")

    [row] = entrymod._REGISTRY["promo_revenue_share"][0](spark, tmp).collect()
    assert row.total_revenue == 0.0 and row.promo_share is None
    out = entrymod._REGISTRY["dominant_part_supplier"][0](spark, tmp).collect()
    assert out == []  # NULL share never passes the > 0.5 dominance filter


def test_lift_and_funnel_survive_no_conversions(spark):
    """A corpus with zero converters / zero views must give NULL rates
    (regression for the decile_lift and funnel_windowed guards)."""
    import datetime as dt
    import tempfile

    import __spark_entry__ as entrymod

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(minutes=i), i % 3, "click", float(i + 1), "{}")
        for i in range(6)
    ]
    tmp = tempfile.mkdtemp(prefix="no_conv_")
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/events.parquet")

    lifts = entrymod._REGISTRY["decile_lift"][0](spark, tmp).collect()
    assert lifts and all(r.lift is None for r in lifts)
    [fw] = entrymod._REGISTRY["funnel_windowed"][0](spark, tmp).collect()
    assert fw.n_view == 0 and fw.view_to_click is None
