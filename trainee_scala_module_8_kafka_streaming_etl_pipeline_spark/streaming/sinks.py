"""Streaming sinks (reference S8: materialize-to-topic).

``CREATE STREAM shipped_orders WITH (kafka_topic='shipped_orders') AS
SELECT ...`` (/root/reference/README.md:464-466) persists a derived
stream under a topic name.  The broker-free equivalent materializes the
stream as an append-only parquet "topic" directory named like the topic;
a Kafka deployment swaps ``format("kafka").option("topic", name)``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


def materialize_to_topic(
    df: DataFrame,
    name: str,
    base_dir: str,
    checkpoint_dir: str | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Persist a streaming DataFrame as the named append-only output
    stream (CSAS).  Returns the started query; callers own awaiting."""
    path = os.path.join(base_dir, name)
    ckpt = checkpoint_dir or os.path.join(base_dir, f"_ckpt_{name}")
    writer = (
        df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .queryName(name)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
