from typesense_spark.streaming.incremental import (  # noqa: F401
    compact_snapshots,
    incremental_index_stream,
    snapshot_staleness,
    snapshotted_index_stream,
    windowed_event_counts,
)
