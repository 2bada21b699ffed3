"""Streaming ingest into the snapshot layer — the streaming-lakehouse sink.

Iceberg's streaming write contract is exactly-once: each micro-batch commits
one snapshot carrying the batch id, and a restarted query that replays a
batch (checkpoint says "done", sink never saw the commit — or vice versa)
is fenced by comparing ids.  This module reproduces that over
``operators.snapshots.SnapshotTable`` with ``foreachBatch``:

- every micro-batch becomes one ``append`` snapshot whose manifest records
  ``stream_batch_id``;
- a batch id at or below the table's highest committed id is a replay and
  is skipped (idempotent), so checkpoint recovery never double-writes;
- appends auto-rebase over concurrent writers (snapshots.py), so a batch
  commit and a maintenance commit (compaction, expiry) can race safely.

At 100 TB this is the ingest shape that produces the small-file drift
``SnapshotTable.compact`` exists to clean up — run both.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from ..operators.snapshots import SnapshotTable


def write_stream_to_snapshot(stream: DataFrame, table: SnapshotTable,
                             checkpoint: str,
                             available_now: bool = True) -> StreamingQuery:
    """Start a streaming query that appends each micro-batch to ``table``
    as one snapshot, exactly once (batch-id fenced)."""
    writer = (stream.writeStream
              .foreachBatch(lambda df, bid: table.append_stream_batch(df, bid))
              .option("checkpointLocation", checkpoint))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
