"""Append-mode watermarked windowing to a file sink — the scale shape.

The oracle-checked streaming queries (queries.q_streaming_*) run
complete-mode into a memory sink because a deterministic full snapshot
is what a value-hash comparison needs; but complete mode keeps every
window in state and materializes the whole result on the driver each
trigger — the opposite of what a 10^12-row ingest wants. This module is
the production shape:

- ``outputMode("append")``: a window is emitted EXACTLY ONCE, when the
  watermark passes its end; state for finalized windows is dropped.
- parquet file sink + ``checkpointLocation``: offsets, watermark and
  window state survive a crash; a restarted query resumes from the
  checkpoint and never re-emits a window the sink already has
  (exactly-once file output via the sink's transactional log).

tests/test_spark_layer.py::test_streaming_append_restart_exactly_once
kills and restarts the query across incremental input batches and
asserts no duplicate windows, a no-op empty restart, and late finalized
windows appearing exactly when the watermark passes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def windowed_counts_file_sink(stream_df: DataFrame, ts_col: str,
                              keys: list[str], out_dir: str,
                              checkpoint_dir: str,
                              watermark: str = "1 hour",
                              window_len: str = "1 hour"):
    """Event-time tumbling-window counts, append mode, parquet sink.

    Returns the started StreamingQuery (availableNow trigger: drains
    everything currently available, then stops — the batch-boundary
    semantics a kill/restart test needs; a production deployment swaps
    the trigger for a processing-time one, nothing else changes).
    """
    agg = (stream_df
           .withWatermark(ts_col, watermark)
           .groupBy(F.window(ts_col, window_len).alias("win"), *keys)
           .agg(F.count("*").alias("n_rows")))
    out = agg.select(
        F.unix_timestamp("win.start").cast("long").alias("win_start"),
        *keys, "n_rows")
    return (out.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", checkpoint_dir)
            .outputMode("append")
            .trigger(availableNow=True)
            .start())
