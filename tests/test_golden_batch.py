"""Reference golden-output test, batch path (SURVEY.md §5 test 1):
seed 3 customers + 5 orders + 5 shipments, run A2 -> J1 -> J2 -> S9,
assert the exact 5 documents of /root/reference/README.md:538-637;
then append the D6 increment and assert the 6th (README.md:654-679)."""

from pyspark.sql import functions as F

from trainee_scala_module_8_kafka_streaming_etl_pipeline_spark.operators.compaction import (
    apply_changelog,
    latest_by_offset,
)
from trainee_scala_module_8_kafka_streaming_etl_pipeline_spark.operators.joins import (
    enrich,
    interval_join,
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

TS_FMT = "yyyy-MM-dd'T'HH:mm:ss"


def _pipeline(spark, customers_rows, orders_rows, shipments_rows):
    customers = spark.createDataFrame(customers_rows, CUSTOMERS_COLS)
    orders = spark.createDataFrame(orders_rows, ORDERS_COLS).withColumn(
        "ts", F.to_timestamp("ts", TS_FMT)
    )
    shipments = spark.createDataFrame(shipments_rows, SHIPMENTS_COLS).withColumn(
        "ts", F.to_timestamp("ts", TS_FMT)
    )
    # A2: changelog compaction with delete propagation
    cust_latest = apply_changelog(customers, keys=["id"], offset_col="_offset")
    # J1: enrichment lookup against current state
    enriched = enrich(
        orders,
        cust_latest.select(
            "id",
            F.col("name").alias("customer_name"),
            F.col("age").alias("customer_age"),
        ),
        on=F.col("customer_id") == F.col("id"),
        how="left",
    ).drop("id")
    # J2: WITHIN 7 DAYS interval join on order_id
    shipped = interval_join(
        enriched.select(
            "customer_id", "order_id", "price", "currency",
            F.col("ts").alias("order_ts"), "customer_name", "customer_age",
        ),
        shipments.select(
            F.col("order_id").alias("s_order_id"), "shipment_id", "origin",
            F.col("ts").alias("ship_ts"), F.col("_offset"),
        ),
        keys=[("order_id", "s_order_id")],
        left_ts="order_ts",
        right_ts="ship_ts",
        lower="-INTERVAL 7 DAYS",
        upper="INTERVAL 7 DAYS",
    )
    # S9: keyed upsert by order_id (latest shipment record wins)
    return latest_by_offset(
        shipped.select(
            F.col("l.order_id").alias("order_id"),
            F.col("r.shipment_id").alias("shipment_id"),
            F.col("l.customer_id").alias("customer_id"),
            F.col("l.customer_name").alias("customer_name"),
            F.col("l.customer_age").alias("customer_age"),
            F.col("r.origin").alias("origin"),
            F.col("l.price").alias("price"),
            F.col("l.currency").alias("currency"),
            F.col("r._offset").alias("_offset"),
        ),
        keys=["order_id"],
        offset_col="_offset",
    ).select(*GOLDEN_COLS)


def test_golden_seed_batch(spark):
    out = _pipeline(spark, CUSTOMERS_SEED, ORDERS_SEED, SHIPMENTS_SEED)
    assert {tuple(r) for r in out.collect()} == GOLDEN_SEED


def test_golden_with_increment(spark):
    out = _pipeline(
        spark,
        CUSTOMERS_SEED + CUSTOMERS_INCREMENT,
        ORDERS_SEED + ORDERS_INCREMENT,
        SHIPMENTS_SEED + SHIPMENTS_INCREMENT,
    )
    assert {tuple(r) for r in out.collect()} == GOLDEN_SEED | {GOLDEN_INCREMENT_ROW}


def test_out_of_window_shipment_dropped(spark):
    """J2 edge (FIXTURES.md §4): a shipment >7 days after its order must
    not join."""
    late = [("13", "99", "nowhere", "2020-05-01T00:00:00", 6)]
    out = _pipeline(spark, CUSTOMERS_SEED, ORDERS_SEED, SHIPMENTS_SEED + late)
    rows = {tuple(r) for r in out.collect()}
    assert rows == GOLDEN_SEED
    assert not any(r[1] == "99" for r in rows)


def test_unknown_customer_null_extended(spark):
    """J1 edge: an order whose customer_id is absent survives the LEFT
    join with null customer columns."""
    orphan_order = [("404", "50", 1.0, "usd", "2020-04-03T00:00:00", 6)]
    orphan_ship = [("50", "60", "mars", "2020-04-03T01:00:00", 6)]
    out = _pipeline(
        spark, CUSTOMERS_SEED, ORDERS_SEED + orphan_order, SHIPMENTS_SEED + orphan_ship
    )
    row = [r for r in out.collect() if r.order_id == "50"]
    assert len(row) == 1
    assert row[0].customer_name is None and row[0].customer_age is None
