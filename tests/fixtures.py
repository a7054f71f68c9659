"""Reference seed/golden fixture rows (FIXTURES.md; transcribed from
/root/reference/README.md:502-526 seeds, :538-637 golden output,
:654-679 incremental batch)."""

CUSTOMERS_SEED = [
    ("5", "fred", 34, False, 0),
    ("7", "sue", 25, False, 1),
    ("2", "bill", 51, False, 2),
]
CUSTOMERS_INCREMENT = [("9", "victor", 23, False, 3)]
CUSTOMERS_COLS = ["id", "name", "age", "__deleted", "_offset"]

ORDERS_SEED = [
    ("2", "13", 50.50, "usd", "2020-04-03T11:20:00", 0),
    ("7", "29", 15.00, "aud", "2020-04-02T12:36:00", 1),
    ("5", "17", 25.25, "eur", "2020-04-02T17:22:00", 2),
    ("5", "15", 13.75, "usd", "2020-04-03T02:55:00", 3),
    ("7", "22", 29.71, "aud", "2020-04-04T00:12:00", 4),
]
ORDERS_INCREMENT = [("9", "31", 525.50, "usd", "2020-04-03T11:20:00", 5)]
ORDERS_COLS = ["customer_id", "order_id", "price", "currency", "ts", "_offset"]

SHIPMENTS_SEED = [
    ("17", "75", "texas", "2020-04-04T19:20:00", 0),
    ("22", "71", "iowa", "2020-04-04T12:25:00", 1),
    ("29", "89", "california", "2020-04-05T13:21:00", 2),
    ("13", "92", "maine", "2020-04-04T06:13:00", 3),
    ("15", "95", "florida", "2020-04-04T01:13:00", 4),
]
SHIPMENTS_INCREMENT = [("31", "97", "new jersey", "2020-04-04T19:20:00", 5)]
SHIPMENTS_COLS = ["order_id", "shipment_id", "origin", "ts", "_offset"]

# golden shipped_orders after the seed batch (README.md:538-637)
GOLDEN_SEED = {
    ("22", "71", "7", "sue", 25, "iowa", 29.71, "aud"),
    ("17", "75", "5", "fred", 34, "texas", 25.25, "eur"),
    ("29", "89", "7", "sue", 25, "california", 15.0, "aud"),
    ("13", "92", "2", "bill", 51, "maine", 50.5, "usd"),
    ("15", "95", "5", "fred", 34, "florida", 13.75, "usd"),
}
# +1 doc after the incremental batch (README.md:675-679)
GOLDEN_INCREMENT_ROW = ("31", "97", "9", "victor", 23, "new jersey", 525.5, "usd")
GOLDEN_COLS = [
    "order_id",
    "shipment_id",
    "customer_id",
    "customer_name",
    "customer_age",
    "origin",
    "price",
    "currency",
]
