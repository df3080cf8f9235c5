from typesense_spark.streaming.incremental import (  # noqa: F401
    incremental_index_stream,
    snapshotted_index_stream,
    windowed_event_counts,
)
