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

# Post-completion marker for the `want` state field (ordering.py's
# _COMPLETED analog): distinct from -1 ("n_shards not yet seen").
_CEP_COMPLETED = -2

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
    value row per OPEN doc; on emit it collapses to a COMPLETED marker
    (ordering.py's _COMPLETED pattern) so post-completion duplicate
    deliveries are absorbed instead of resurrecting fresh state and
    re-emitting. A doc that never completes is evicted by an event-time
    TIMER re-armed each batch at the doc's LAST shard event time plus
    ``eviction_margin_ms`` (the assembler's setTimeoutTimestamp policy:
    a doc stays open while shards keep arriving; arming once from the
    CURRENT WATERMARK at first arrival would hand batch-0 docs a ~1970
    deadline — no watermark yet — and evict slow multi-batch docs
    mid-assembly). Duplicate shard deliveries (at-least-once source)
    are deduped per ``seq`` before counting, so a replay can neither
    inflate ``total_tok`` nor trigger a premature completion."""
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

        def _rearm(self, deadline_ms: int) -> None:
            # single live timer per key, re-armed from the newest
            # shard's EVENT time each batch: delete stale timers so an
            # expiry always means "the latest deadline passed" (a doc
            # stays open while shards keep arriving — the assembler's
            # setTimeoutTimestamp semantics over the timer API)
            for t in self.handle.listTimers():
                self.handle.deleteTimer(t)
            self.handle.registerTimer(deadline_ms)

        def handleInputRows(self, key, rows, timer_values):
            got = self.state.get()
            seqs, tok, want = got or ([], 0, -1)
            if want == _CEP_COMPLETED:
                # post-completion duplicate delivery: absorb it (the
                # marker expires via its timer) — clearing state on
                # emit instead would resurrect the doc here and emit a
                # SECOND completion row
                return
            seen = set(seqs)
            max_ts_ms = None
            for pdf in rows:
                if pdf.empty:
                    # .iloc[-1] on an empty chunk raises IndexError —
                    # same guard as the assembler's `if pdf.empty`
                    continue
                batch = pdf.drop_duplicates(subset=["seq"], keep="first")
                fresh = batch[~batch["seq"].isin(list(seen))]
                fresh_seqs = fresh["seq"].astype(int).tolist()
                seqs = list(seqs) + fresh_seqs
                seen.update(fresh_seqs)
                tok += int(fresh["n_tok"].sum())
                want = int(pdf["n_shards"].iloc[-1])
                ts_ms = int(pdf["ts"].max().timestamp() * 1000)
                if max_ts_ms is None or ts_ms > max_ts_ms:
                    max_ts_ms = ts_ms
            if 0 < want <= len(seqs):
                # COMPLETED marker, not clear(): absorbs replays until
                # the timer (re-armed below) expires the marker
                self.state.update(([], 0, _CEP_COMPLETED))
                out = pd.DataFrame({"doc_id": [key[0]],
                                    "n_shard": [len(seqs)],
                                    "total_tok": [tok]})
            else:
                self.state.update((seqs, tok, want))
                out = None
            if max_ts_ms is not None:
                self._rearm(max_ts_ms + eviction_margin_ms)
            if out is not None:
                yield out

        def handleExpiredTimer(self, key, timer_values, expired_timer_info):
            # drop-and-forget: the doc never completed inside the
            # margin (or a COMPLETED marker aged out) — stale timers
            # are deleted on re-arm, so an expiry is always the latest
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
