"""Corpus validation (SURVEY §2.2 B3) — the reference validates every
document against the collection schema at index time and rejects rows
per-record rather than failing the batch
(``/root/reference/src/index.cpp:249-352`` validate_index_in_memory;
e.g. "must be an int32" src/index.cpp:288-295; mandatory
default_sorting_field src/index.cpp:255-260).

Spark analogue: the table is typed, so type checks are free; what
remains is per-row content guards. ``split_valid`` returns
(valid, rejected-with-reason) as two DataFrames from ONE predicate
evaluation — rejects carry a reason column the way the reference
returns per-line import errors (src/collection.cpp:357-371).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def split_valid(
    docs: DataFrame,
    required_cols: list[str],
    content_col: str | None = None,
    max_content_bytes: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    reason = F.lit(None).cast("string")
    for c in reversed(required_cols):
        reason = F.when(F.col(c).isNull(), F.lit(f"missing required field: {c}")).otherwise(reason)
    if content_col is not None:
        empty = F.col(content_col).isNull() | (F.length(content_col) == 0)
        reason = F.when(empty, F.lit(f"empty {content_col}")).otherwise(reason)
        if max_content_bytes is not None:
            reason = F.when(
                F.octet_length(content_col) > max_content_bytes,
                F.lit(f"{content_col} exceeds {max_content_bytes} bytes"),
            ).otherwise(reason)
    tagged = docs.withColumn("_reject_reason", reason)
    valid = tagged.where(F.col("_reject_reason").isNull()).drop("_reject_reason")
    rejected = tagged.where(F.col("_reject_reason").isNotNull()).withColumnRenamed(
        "_reject_reason", "reject_reason"
    )
    return valid, rejected
