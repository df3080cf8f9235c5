"""Large-scale training-data pipeline operators (first-class, per brief):
deduplication, similarity search, text analysis, multimodal plumbing."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_small_input(df: DataFrame) -> DataFrame:
    """Guide §2.5 input skew: a small single-file input scans as ONE
    partition, serializing every map-side JVM pass (tokenize, shingle
    fan-out, per-bit hashing) onto one core while the rest of the
    cluster idles. Fan-out-heavy ops call this on their input: scans
    narrower than the cluster's default parallelism are round-robin
    repartitioned (the shuffled bytes are exactly the small input);
    inputs that already scan wide pass through untouched, so no
    shuffle is ever added at scale. Row-wise map ops deliberately do
    NOT use this — for them the exchange costs more than the
    parallelism buys (measured at gate scale)."""
    p = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < p:
        return df.repartition(p)
    return df
