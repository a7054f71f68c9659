"""Replay properties batch 15: streaming-vs-batch equivalence on
RANDOM corpora.  Twenty streaming entries register the IDENTICAL
DuckDB oracle SQL as a batch entry — the design contract is that the
incremental plan converges to the batch answer on a static corpus.
The fixed-corpus self-check pins that at two scale factors; these
properties pin it under arbitrary event shapes (random timestamps,
NULL values, duplicate users, out-of-order arrival), where watermark
frames, state merges, and availableNow batch splits actually vary.

Each streaming entry runs a real StreamingQuery, so examples are kept
few (5) and the pair list long — coverage per Spark start/stop second.
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from replay_profile import replay_settings

from test_replay_properties import _entry, _mk_events, _write_events
from test_replay_properties4 import _write_docs_src

_SETTINGS = replay_settings(5)

def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    return v


def _rows(df):
    cols = sorted(df.columns)
    rows = sorted(
        (tuple(_norm(r[c]) for c in cols) for r in df.collect()), key=repr
    )
    return cols, rows


def _assert_pairs(spark, tmp, pairs):
    import __spark_entry__ as m

    for s_name, b_name in pairs:
        # the pair must register the IDENTICAL oracle SQL — that is the
        # design contract ("incremental plan == batch answer") this
        # property generalizes to random corpora
        assert m._REGISTRY[s_name][1].strip() == m._REGISTRY[b_name][1].strip()
        s_cols, s_rows = _rows(_entry(s_name)(spark, tmp))
        b_cols, b_rows = _rows(_entry(b_name)(spark, tmp))
        assert s_cols == b_cols, (s_name, s_cols, b_cols)
        assert s_rows == b_rows, (s_name, s_rows, b_rows)


_ev_rows = st.lists(
    st.tuples(
        st.integers(0, 2),                                   # user
        st.integers(0, 60 * 60 * 60),                        # second offset
        st.sampled_from(["view", "click", "purchase", "error"]),
        st.one_of(st.none(), st.integers(0, 200)),           # value*0.5
    ),
    min_size=1,
    max_size=25,
)


@given(raw=_ev_rows)
@_SETTINGS
def test_streaming_equals_batch_on_events(spark, raw):
    tmp = _write_events(spark, _mk_events(raw))
    _assert_pairs(
        spark,
        tmp,
        [
            ("streaming_windowed_agg", "windowed_agg_tumbling"),
            ("streaming_interval_join", "interval_join"),
            ("streaming_session_window", "session_window"),
            ("streaming_sessionize", "session_window"),
            ("streaming_ohlc", "ohlc_bars"),
            ("streaming_cms", "cms_heavy_hitters"),
            ("streaming_quantile_sketch", "quantile_sketch"),
            ("streaming_cohort_matrix", "cohort_matrix"),
            ("streaming_ltv_curve", "ltv_cohort_curve"),
            ("streaming_event_transitions", "event_transitions"),
            ("streaming_interarrival", "interarrival_stats"),
            ("streaming_out_of_order", "out_of_order_audit"),
            ("streaming_scd2", "scd2_history"),
            ("streaming_funnel", "event_funnel"),
            ("streaming_psi_drift", "psi_drift"),
            ("streaming_gap_fill", "gap_fill_locf"),
            ("streaming_avro_topic", "avro_roundtrip"),
            ("streaming_avro_ocf", "avro_ocf_roundtrip"),
        ],
    )


_docs = st.lists(
    st.tuples(
        st.sampled_from(["srcA", "src3"]),
        st.text("ab .", max_size=20),
    ),
    min_size=1,
    max_size=15,
)


@given(docs=_docs)
@_SETTINGS
def test_streaming_equals_batch_on_documents(spark, docs):
    tmp = _write_docs_src(spark, docs)
    _assert_pairs(
        spark,
        tmp,
        [
            ("streaming_bm25", "bm25_topk"),
            ("streaming_temperature_mixture", "temperature_mixture"),
        ],
    )


_orders = st.lists(
    st.tuples(st.integers(0, 5), st.integers(0, 400)),  # (custkey, price*0.25)
    min_size=1,
    max_size=20,
)


@given(orders=_orders)
@_SETTINGS
def test_streaming_equals_batch_on_orders(spark, orders):
    import datetime as dt
    import tempfile

    tmp = tempfile.mkdtemp(prefix="replay_resv_")
    spark.createDataFrame(
        [
            (k, c, "O", p * 0.25, dt.datetime(2024, 1, 1), "5-LOW")
            for k, (c, p) in enumerate(orders)
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/orders.parquet")
    _assert_pairs(
        spark, tmp, [("streaming_weighted_sample", "weighted_sample_topk")]
    )
