"""OutputLogger analog: the engine's own log messages routed through the
SAME encoder→output machinery as data.

The reference does not print its runtime logs — it encodes each
LogMessage with a CSVEncoder and hands it to an Output writer keyed by
the message type (OutputLogger.java:19,33-37; CSVLogMessageEncoder.java:
20,48-52 encodes ``message.getFields()`` as a CSV line;
SingleSynchronizedFileLogger serializes the single shared writer). The
analog here reuses the DirectoryOutput sink (sinks/directory.py): log
records buffer on the driver (logs are control-plane, single-writer by
construction — the reference synchronizes its one file writer for the
same reason) and flush as a DataFrame through ``write_directory_csv``
with ``level`` as the label column, so the per-level directory layout,
file rotation, headers, and the reverse reader are exactly the data
path's. A log record is just another row; greppable with the engine
itself.
"""

from __future__ import annotations

import json
import time
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession

from movement_spark.sinks.directory import (
    read_directory_csv, write_directory_csv)

LOG_PHASE = "logs"
LOG_SCHEMA = "seq INT, ts DOUBLE, logger STRING, message STRING, context STRING"
LEVELS = ("DEBUG", "INFO", "WARN", "ERROR")


class DirectoryOutputLogger:
    """Logger → Encoder → Output, over the directory sink.

    ``clock`` is injectable so tests (and deterministic replays) can pin
    timestamps; (``flush``, ``seq``) gives a total order independent of
    clock resolution, like the reference's single synchronized writer
    does by construction (``seq`` restarts per logger instance; the
    ``flush`` partition column disambiguates across instances).
    """

    def __init__(self, spark: SparkSession, base_dir: str,
                 name: str = "movement",
                 clock: Callable[[], float] = time.time):
        self.spark = spark
        self.base_dir = base_dir
        self.name = name
        self.clock = clock
        self._buffer: list[tuple] = []
        self._seq = 0
        # resume numbering after any flushes already on disk — a fresh
        # logger over an existing base_dir must append, never clobber
        self._flushes = self._next_flush_idx()
        self.io_ops = 0  # OutputWriter counter analog

    def _next_flush_idx(self) -> int:
        import os
        root = os.path.join(self.base_dir, LOG_PHASE)
        try:
            existing = [int(d.split("=", 1)[1]) for d in os.listdir(root)
                        if d.startswith("flush=")]
        except OSError:
            return 0
        return max(existing, default=-1) + 1

    # -- Logger surface (OutputLogger.java:41-58) -------------------------
    def debug(self, message: Any, **context: Any) -> None:
        self._log("DEBUG", message, context)

    def info(self, message: Any, **context: Any) -> None:
        self._log("INFO", message, context)

    def warn(self, message: Any, **context: Any) -> None:
        self._log("WARN", message, context)

    def error(self, message: Any, **context: Any) -> None:
        self._log("ERROR", message, context)

    def _log(self, level: str, message: Any, context: dict) -> None:
        # LogMessage.getFields() analog: (seq, ts, logger, message,
        # context-as-json, level); level becomes the Output label.
        self._buffer.append((
            self._seq, float(self.clock()), self.name, str(message),
            json.dumps(context, sort_keys=True), level))
        self._seq += 1

    # -- Output lifecycle -------------------------------------------------
    def flush(self) -> str:
        """Encode the buffered records and write them through the
        directory Output (writer keyed by level, the message 'label').

        The flush index is taken from DISK at flush time, under an
        advisory lock: the constructor-snapshotted counter alone is
        wrong for CONCURRENT instances over one base_dir (both snapshot
        0 before either flushes; the second mode('overwrite') write
        would silently clobber the first — the reference serializes its
        single file writer for exactly this reason)."""
        if not self._buffer:
            return f"{self.base_dir}/{LOG_PHASE}"
        import fcntl
        import os
        df = self.spark.createDataFrame(
            self._buffer, LOG_SCHEMA + ", level STRING")
        root = os.path.join(self.base_dir, LOG_PHASE)
        os.makedirs(root, exist_ok=True)
        # one subdirectory per flush (flush=N) so successive flushes
        # append to the log storage instead of replacing it — the
        # rotation SingleSynchronizedFileLogger gets from its split files
        with open(os.path.join(root, ".flush.lock"), "w") as lf:
            fcntl.flock(lf, fcntl.LOCK_EX)
            try:
                idx = self._next_flush_idx()
                write_directory_csv(df, self.base_dir,
                                    f"{LOG_PHASE}/flush={idx}",
                                    label_col="level")
            finally:
                fcntl.flock(lf, fcntl.LOCK_UN)
        self._flushes = idx + 1
        self.io_ops += len(self._buffer)
        self._buffer = []
        return f"{self.base_dir}/{LOG_PHASE}"

    def read(self, spark: SparkSession | None = None) -> DataFrame:
        """Output.reader analog over the log storage (level recovered
        from the partition directories). A never-flushed logger reads
        as an EMPTY typed table, not a PATH_NOT_FOUND crash — the
        monitor that polls the log before the first record lands must
        see zero rows."""
        import os
        s = spark or self.spark
        if not os.path.isdir(os.path.join(self.base_dir, LOG_PHASE)):
            return s.createDataFrame(
                [], LOG_SCHEMA + ", flush INT, level STRING")
        return read_directory_csv(s, self.base_dir, LOG_PHASE, LOG_SCHEMA)

    def metrics(self) -> dict[str, int]:
        return {"io_ops": self.io_ops, "buffered": len(self._buffer)}

    def close(self) -> None:
        """AutoCloseable analog (OutputLogger.java:60-64)."""
        self.flush()
