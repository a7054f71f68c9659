"""Source connectors (reference S1/S2: Debezium CDC sources).

The reference declares two CDC source connectors —
``customers_reader`` (Postgres logical decoding,
/root/reference/README.md:352-365) and ``logistics_reader`` (MongoDB
oplog tail, README.md:371-385) — each producing Debezium envelope
records (before/after + op) into Kafka topics, with the unwrap SMTs
applied in-flight.

Spark-native equivalents here:

  cdc.cdc_envelope_stream   — continuous stream of Debezium-shaped
                              envelope rows from a growing file
                              directory (the broker-free topic
                              stand-in); pair with
                              operators.cdc.unwrap_rewrite/_drop for
                              the SMT surface (S3/S4).
  cdc.postgres_source_config / cdc.mongo_source_config — the exact
                              connector-option surfaces of the
                              reference, for a deployment that swaps
                              in real Kafka+Debezium.
"""

from .cdc import (  # noqa: F401
    cdc_envelope_stream,
    mongo_source_config,
    postgres_source_config,
)
