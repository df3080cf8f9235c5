"""Incremental index maintenance (SURVEY §2.1 S7/S8).

The reference deletes a document by tokenizing its stored JSON and
scrubbing its postings in place (``/root/reference/src/index.cpp:
2086-2191``); updates diff old vs new and reindex changed fields
(``src/collection.cpp:219-238``). Our batch analogue:

- ``delete_docs``: rewrite the docs table without the victims, find the
  term buckets they touched (tokenizing ONLY the victims — a tiny map
  job), and rebuild just those checkpoint groups from the updated docs
  table. Untouched groups' files are not rewritten.
- updates = delete + streaming append (or delete + group rebuild with
  the new rows in the docs table).

Pinned semantics (same as streaming appends): corpus statistics
(N, avgdl, df) stay FROZEN at base-build values — exact BM25 under
deletion would require rescoring every posting as df drifts, which is
the periodic full rebuild's job (`checkpointed_build` from scratch).
Deleted docs can never be returned (their postings are gone and they
left the docs table); survivors keep their exact original scores.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from typesense_spark.index.build import term_bucket_expr, tokenize_tf
from typesense_spark.index.checkpoint import (
    _has_marker,
    _marker_path,
    checkpointed_build,
    load_checkpointed,
)


def _lineage(out_dir: str) -> tuple[int, dict, int]:
    with open(os.path.join(out_dir, "manifest.json")) as f:
        lineage = json.load(f)["lineage"]
    build_kw = lineage["build_kw"]
    return lineage["n_groups"], build_kw, build_kw.get("num_buckets", 16)


def _touched_buckets(rows_df, fields: list[str], num_buckets: int) -> set[int]:
    """Term buckets a (small) set of doc rows touches — tokenize only them."""
    out: set[int] = set()
    for fld in fields:
        tf = tokenize_tf(rows_df, fld, False)
        rows = (
            tf.select(term_bucket_expr(F.col("term"), num_buckets).alias("b"))
            .distinct()
            .collect()
        )
        out |= {int(r["b"]) for r in rows}
    return out


def _swap_dir(write_df, out_dir: str, name: str) -> None:
    target = os.path.join(out_dir, name)
    tmp = os.path.join(out_dir, f"{name}__new")
    write_df.write.mode("overwrite").parquet(tmp)
    shutil.rmtree(target)
    os.rename(tmp, target)
    # drop Spark's cached file listing for the path — the rename keeps
    # the path identical, so later reads would otherwise resolve the
    # OLD part files (FAILED_READ_FILE.FILE_NOT_EXIST)
    write_df.sparkSession.catalog.refreshByPath(target)
    write_df.sparkSession.catalog.refreshByPath(tmp)


def _refresh_doc_attrs(spark: SparkSession, out_dir: str, fields: list[str]) -> None:
    """doc_attrs follows the docs table; terms/stats stay FROZEN."""
    new_docs = spark.read.parquet(os.path.join(out_dir, "docs"))
    tf_parts = [tokenize_tf(new_docs, fld, False) for fld in fields]
    tf_all = tf_parts[0]
    for p in tf_parts[1:]:
        tf_all = tf_all.unionByName(p)
    _swap_dir(
        tf_all.groupBy("field", "doc_id").agg(F.max("dl").alias("dl")),
        out_dir,
        "doc_attrs",
    )


def _rebuild_groups(
    spark: SparkSession,
    out_dir: str,
    affected_buckets: set[int],
    fields: list[str],
    n_groups: int,
    build_kw: dict,
) -> list[int]:
    """Invalidate the markers/data of affected groups and resume the
    checkpointed build — only those groups recompute, against the
    frozen on-disk dictionary."""
    affected_groups = sorted({b % n_groups for b in affected_buckets})
    for g in affected_groups:
        stage = f"postings_group_{g}"
        if _has_marker(out_dir, stage):
            os.remove(_marker_path(out_dir, stage))
        gdir = os.path.join(out_dir, "postings", f"group={g}")
        if os.path.exists(gdir):
            shutil.rmtree(gdir)
    docs = spark.read.parquet(os.path.join(out_dir, "docs"))
    checkpointed_build(
        spark,
        docs,
        out_dir,
        fields=fields,
        id_col="doc_id",
        n_groups=n_groups,
        resume=True,
        **build_kw,
    )
    return affected_groups


def delete_docs(
    spark: SparkSession,
    out_dir: str,
    doc_ids: list[int],
    fields: list[str],
) -> dict:
    """Delete ``doc_ids`` from the index at ``out_dir``. Returns a
    summary {deleted, affected_buckets, rebuilt_groups}."""
    n_groups, build_kw, num_buckets = _lineage(out_dir)
    docs = spark.read.parquet(os.path.join(out_dir, "docs"))
    ids = [int(d) for d in doc_ids]
    victims = docs.where(F.col("doc_id").isin(ids))
    affected_buckets = _touched_buckets(victims, fields, num_buckets)

    _swap_dir(docs.where(~F.col("doc_id").isin(ids)), out_dir, "docs")
    n_survivors = spark.read.parquet(os.path.join(out_dir, "docs")).count()
    _refresh_doc_attrs(spark, out_dir, fields)
    rebuilt = _rebuild_groups(spark, out_dir, affected_buckets, fields, n_groups, build_kw)
    return {
        "deleted": len(ids),
        "survivors": n_survivors,
        "affected_buckets": sorted(affected_buckets),
        "rebuilt_groups": rebuilt,
    }


def delete_docs_by_filter(
    spark: SparkSession,
    out_dir: str,
    filter_by: str,
    fields: list[str],
    max_victims: int | None = None,
) -> dict:
    """S7 delete by ``filter_by`` DSL (reference ``del_remove_documents``
    deletes by id OR by filter, ``/root/reference/src/core_api.cpp:880+``
    — this was the one reference API surface the id-only
    :func:`delete_docs` didn't cover, r4 VERDICT missing #2).

    Victims resolve via the same compiled Catalyst predicate the query
    side uses (``filters.apply_filter_by`` — pushdown applies), then the
    existing frozen-stats bucket rebuild runs. Victim ids ARE collected
    (the group rebuild needs their term buckets anyway, and the
    reference's filter-delete is an interactive curation call, not a
    bulk path); ``max_victims`` guards against an over-broad filter —
    the default caps at 1M ids (~8 MB driver memory), raise it
    explicitly for larger intentional deletions."""
    from typesense_spark.search.filters import apply_filter_by

    cap = 1_000_000 if max_victims is None else int(max_victims)
    docs = spark.read.parquet(os.path.join(out_dir, "docs"))
    victims = apply_filter_by(docs, filter_by).select("doc_id").limit(cap + 1).collect()
    if len(victims) > cap:
        raise ValueError(
            f"filter_by {filter_by!r} matches more than {cap} docs; pass "
            "max_victims explicitly to confirm a deletion this large"
        )
    ids = [int(r["doc_id"]) for r in victims]
    if not ids:
        return {"deleted": 0, "survivors": docs.count(), "affected_buckets": [],
                "rebuilt_groups": []}
    return delete_docs(spark, out_dir, ids, fields)


def upsert_docs(
    spark: SparkSession,
    out_dir: str,
    new_rows,
    key_cols: list[str],
    fields: list[str],
) -> dict:
    """Upsert by natural key (S8): rows matching an existing key REPLACE
    that doc (doc_id stable); unmatched rows get fresh ids after the
    current max. Affected buckets = terms of the OLD versions ∪ terms
    of the NEW rows; only those groups rebuild. Frozen-stats semantics
    as in :func:`delete_docs` (the reference's analogue diffs old vs
    new and reindexes changed fields, src/collection.cpp:219-238).
    """
    n_groups, build_kw, num_buckets = _lineage(out_dir)
    docs = spark.read.parquet(os.path.join(out_dir, "docs"))
    key = [F.col(c) for c in key_cols]

    matched_old = docs.join(new_rows.select(*key_cols), key_cols, "left_semi")
    affected = _touched_buckets(matched_old, fields, num_buckets)

    # id assignment: reuse matched doc_id; new keys rank after max id
    id_map = docs.select(*key_cols, "doc_id")
    with_ids = new_rows.join(id_map, key_cols, "left")
    max_id = docs.agg(F.max("doc_id")).collect()[0][0] or -1
    from pyspark.sql import Window

    w = Window.orderBy(*key)  # new rows are few — driver-scale window
    new_part = (
        with_ids.where(F.col("doc_id").isNull())
        .withColumn("doc_id", (F.row_number().over(w) + max_id).cast("long"))
    )
    upd_part = with_ids.where(F.col("doc_id").isNotNull())
    incoming = upd_part.unionByName(new_part)
    if "content" in incoming.columns:
        incoming = incoming.withColumn("content_sha", F.sha2(F.col("content"), 256))
    affected |= _touched_buckets(incoming, fields, num_buckets)

    # terms the frozen dictionary has never seen must still be findable:
    # append them with batch-local df/cf/max_tf BEFORE the group rebuild
    # so packing and query expansion agree on df. Computed BEFORE the
    # docs swap — `incoming` still references the pre-swap docs files.
    terms_path = os.path.join(out_dir, "terms")
    existing_terms = spark.read.parquet(terms_path)
    tf_parts = [tokenize_tf(incoming, fld, False) for fld in fields]
    tf_inc = tf_parts[0]
    for p in tf_parts[1:]:
        tf_inc = tf_inc.unionByName(p)
    new_terms = (
        tf_inc.groupBy("field", "term")
        .agg(
            F.count("*").alias("df"),
            F.sum("tf").alias("cf"),
            F.max("tf").alias("max_tf"),
        )
        .join(existing_terms.select("field", "term"), ["field", "term"], "left_anti")
    )
    if "max_score" in existing_terms.columns:
        # keep the dictionary schema intact (appending files without
        # max_score silently forks the parquet schema and breaks
        # rank_tokens_by='max_score'); compute it batch-locally when the
        # build's score_col is known, else 0 (ranks last)
        sc = build_kw.get("score_col")
        if sc and sc in incoming.columns:
            msc = (
                tf_inc.join(
                    incoming.select("doc_id", F.col(sc).cast("long").alias("_sc")),
                    "doc_id",
                )
                .groupBy("field", "term")
                .agg(F.max("_sc").alias("max_score"))
            )
            new_terms = new_terms.join(msc, ["field", "term"], "left").withColumn(
                "max_score", F.coalesce("max_score", F.lit(0))
            )
        else:
            new_terms = new_terms.withColumn("max_score", F.lit(0).cast("long"))
    n_new_terms = new_terms.count()
    if n_new_terms:
        new_terms.write.mode("append").parquet(terms_path)
        spark.catalog.refreshByPath(terms_path)

    keep = docs.join(new_rows.select(*key_cols), key_cols, "left_anti")
    _swap_dir(keep.unionByName(incoming, allowMissingColumns=True), out_dir, "docs")
    _refresh_doc_attrs(spark, out_dir, fields)
    rebuilt = _rebuild_groups(spark, out_dir, affected, fields, n_groups, build_kw)
    return {
        "upserted": new_rows.count(),
        "affected_buckets": sorted(affected),
        "rebuilt_groups": rebuilt,
    }
