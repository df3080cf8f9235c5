"""S4: document export — the reference's streaming JSONL export
endpoint (``/root/reference/src/core_api.cpp:588-640``
``get_export_documents`` iterates the doc store and emits one JSON
document per line) re-expressed as a distributed write.

Spark mapping: the doc store IS the docs table, so export is a
projection + optional filter + ``write.json`` — each output line is
one JSON document, exactly the reference's wire format, but written by
every executor in parallel instead of streamed through one server
thread. Filters reuse the Q9 machinery (raw SQL and/or the reference
filter_by DSL), so an export of a filtered slice prunes at the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

INTERNAL_COLS = ("content_sha",)  # build-added bookkeeping, not user data


def export_documents(
    index,
    out_dir: str,
    fmt: str = "jsonl",
    filter_expr: str | None = None,
    filter_by: str | None = None,
    include_fields: tuple[str, ...] = (),
    keep_internal: bool = False,
    mode: str = "overwrite",
) -> DataFrame:
    """Write the (optionally filtered / projected) docs table to
    ``out_dir`` as JSONL or parquet; returns the exported DataFrame so
    callers can count/inspect what was written."""
    docs = index.docs
    if filter_expr:
        docs = docs.where(filter_expr)
    if filter_by:
        from typesense_spark.search.filters import apply_filter_by

        docs = apply_filter_by(docs, filter_by)
    if include_fields:
        cols = ["doc_id", *[c for c in include_fields if c != "doc_id"]]
        docs = docs.select(*cols)
    elif not keep_internal:
        docs = docs.drop(*[c for c in INTERNAL_COLS if c in docs.columns])
    if fmt == "jsonl":
        docs.write.mode(mode).json(out_dir)
    elif fmt == "parquet":
        docs.write.mode(mode).parquet(out_dir)
    else:
        raise ValueError(f"unsupported export format: {fmt!r}")
    return docs
