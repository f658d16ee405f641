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


def doc_completion(shards: DataFrame, watermark: str = "10 minutes",
                   eviction_margin_ms: int = 3_600_000) -> DataFrame:
    """Per-doc completion detector: emits one (doc_id, n_shard, total_tok)
    row the moment all ``n_shards`` DISTINCT shards of a doc have been
    seen — count-based (order-free) completion, complementing the
    order-based assembly in ordered_doc_assembler. State is one small
    value row per OPEN doc, cleared on emit; a doc that never completes
    is evicted by an event-time TIMER once the watermark passes its
    first arrival by ``eviction_margin_ms`` (the same drop-and-forget
    dangling policy as the assembler — without the timer, state for
    permanently-incomplete docs would grow without bound). Duplicate
    shard deliveries (at-least-once source) are deduped per ``seq``
    before counting, so a replay can neither inflate ``total_tok`` nor
    trigger a premature completion."""
    if not _runtime_available():
        raise NotImplementedError(
            "transformWithStateInPandas requires a working google.protobuf; "
            "unavailable in this sandbox — use "
            "operators.ordering.ordered_doc_assembler instead")

    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor, StatefulProcessorHandle)

    class DocCompletion(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle):
            self.handle = handle
            self.state = handle.getValueState(
                "agg", "seqs ARRAY<INT>, tok BIGINT, want INT")

        def handleInputRows(self, key, rows, timer_values):
            got = self.state.get()
            first_batch = got is None
            seqs, tok, want = got or ([], 0, -1)
            seen = set(seqs)
            for pdf in rows:
                batch = pdf.drop_duplicates(subset=["seq"], keep="first")
                fresh = batch[~batch["seq"].isin(list(seen))]
                fresh_seqs = fresh["seq"].astype(int).tolist()
                seqs = list(seqs) + fresh_seqs
                seen.update(fresh_seqs)
                tok += int(fresh["n_tok"].sum())
                want = int(pdf["n_shards"].iloc[-1])
            if 0 < want <= len(seqs):
                self.state.clear()
                yield pd.DataFrame({"doc_id": [key[0]],
                                    "n_shard": [len(seqs)],
                                    "total_tok": [tok]})
            else:
                self.state.update((seqs, tok, want))
                if first_batch:
                    # one eviction timer per open doc, armed on first
                    # arrival: fires once the watermark has passed it by
                    # the margin, clearing abandoned state
                    self.handle.registerTimer(
                        timer_values.getCurrentWatermarkInMs()
                        + eviction_margin_ms)

        def handleExpiredTimer(self, key, timer_values, expired_timer_info):
            # drop-and-forget: the doc never completed inside the margin
            self.state.clear()
            yield from ()

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
