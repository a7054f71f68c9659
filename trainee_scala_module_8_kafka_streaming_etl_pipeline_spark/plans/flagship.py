"""The flagship composed pipeline — the reference's ``shipped_orders``
analytic re-expressed over the driver's test tables.

Reference shape (/root/reference/README.md:434-480):
    customers_by_key = latest_by_offset(customers CDC)     (A1/A2)
    enriched_orders  = orders ⟕ customers_by_key           (J1)
    shipped_orders   = enriched_orders ⨝[±7 days] shipments (J2)
    → keyed upsert by order key into the serving index      (S9)

Mapping onto the driver tables (/root/repo/TESTDATA.md): the `events`
stream plays both event sides — purchases are the "orders" stream,
clicks the "shipments" stream (events' timestamps are the only
overlapping event-time domain); `customer` is the dimension; the final
keyed upsert keeps the latest click per purchase (per-key compaction,
offset order = event_id) exactly like the ES sink keeps the latest doc
per order id.

Plan properties at scale: the dimension join broadcasts (no fact
shuffle); the interval join shuffles both event sides once on user_id;
the final compaction reuses nothing but is a map-side-combining
aggregate. Three shuffles total over the fact data, none avoidable
without pre-bucketed storage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..operators.joins import enrich, interval_join

WINDOW = "INTERVAL 1 DAY"


def purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")


def clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "events").filter(F.col("event_type") == "click")


def shipped_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """latest-state dim ⟕ purchase stream ⨝[±1 day] click stream,
    keyed-upserted by purchase id (latest click wins)."""
    customer = load(spark, sf_dir, "customer")
    p = purchases(spark, sf_dir).select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("value").alias("price"),
        F.col("ts"),
    )
    enriched = enrich(
        p,
        customer.select(
            F.col("c_custkey"),
            F.col("c_name").alias("customer_name"),
            F.col("c_mktsegment").alias("customer_segment"),
        ),
        on=F.col("user_id") == F.col("c_custkey"),
        how="left",
    ).drop("c_custkey")
    k = clicks(spark, sf_dir).select(
        F.col("event_id").alias("click_id"), F.col("user_id"), F.col("ts")
    )
    shipped = interval_join(
        enriched,
        k,
        keys=[("user_id", "user_id")],
        left_ts="ts",
        right_ts="ts",
        lower=f"-{WINDOW}",
        upper=WINDOW,
        # bucketed plan: rows only meet inside +-1 adjacent day-buckets,
        # so a hot user never materializes its full per-key cross product
        time_bucket_seconds=86400,
    ).select(
        F.col("l.purchase_id").alias("purchase_id"),
        F.col("l.user_id").alias("customer_id"),
        F.col("l.customer_name").alias("customer_name"),
        F.col("l.customer_segment").alias("customer_segment"),
        F.col("l.price").alias("price"),
        F.col("l.ts").alias("purchase_ts"),
        F.col("r.click_id").alias("click_id"),
        F.col("r.ts").alias("click_ts"),
    )
    # keyed upsert: latest click per purchase (offset order = click_id),
    # the ES-sink compaction of reference S9/E2
    return shipped.groupBy(
        "purchase_id",
        "customer_id",
        "customer_name",
        "customer_segment",
        "price",
        "purchase_ts",
    ).agg(
        F.max("click_id").alias("last_click_id"),
        F.max_by("click_ts", "click_id").alias("last_click_ts"),
        F.count(F.lit(1)).alias("n_clicks"),
    )
