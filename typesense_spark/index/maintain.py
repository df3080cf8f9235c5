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

from typesense_spark.index.build import TF_SCHEMA, term_bucket_expr, tokenize_mapper
from typesense_spark.index.checkpoint import (
    _has_marker,
    _marker_path,
    checkpointed_build,
    load_checkpointed,
)


def delete_docs(
    spark: SparkSession,
    out_dir: str,
    doc_ids: list[int],
    fields: list[str],
) -> dict:
    """Delete ``doc_ids`` from the index at ``out_dir``. Returns a
    summary {deleted, affected_buckets, rebuilt_groups}."""
    with open(os.path.join(out_dir, "manifest.json")) as f:
        lineage = json.load(f)["lineage"]
    n_groups = lineage["n_groups"]
    build_kw = lineage["build_kw"]
    num_buckets = build_kw.get("num_buckets", 16)

    docs = spark.read.parquet(os.path.join(out_dir, "docs"))
    victims = docs.where(F.col("doc_id").isin([int(d) for d in doc_ids]))

    # buckets the victims touch: tokenize only the victims
    affected_buckets: set[int] = set()
    for fld in fields:
        tf = victims.select("doc_id", fld).mapInPandas(
            tokenize_mapper(fld, False), schema=TF_SCHEMA
        )
        rows = (
            tf.select(term_bucket_expr(F.col("term"), num_buckets).alias("b"))
            .distinct()
            .collect()
        )
        affected_buckets |= {int(r["b"]) for r in rows}
    affected_groups = sorted({b % n_groups for b in affected_buckets})

    # rewrite the docs table without the victims (new dir + swap)
    survivors = docs.where(~F.col("doc_id").isin([int(d) for d in doc_ids]))
    tmp = os.path.join(out_dir, "docs__new")
    survivors.write.mode("overwrite").parquet(tmp)
    n_survivors = spark.read.parquet(tmp).count()
    shutil.rmtree(os.path.join(out_dir, "docs"))
    os.rename(tmp, os.path.join(out_dir, "docs"))

    # refresh doc_attrs (cheap map+agg over survivors); terms/stats stay
    # FROZEN by design — do NOT re-run the dict stage
    new_docs = spark.read.parquet(os.path.join(out_dir, "docs"))
    tf_parts = [
        new_docs.select("doc_id", fld).mapInPandas(
            tokenize_mapper(fld, False), schema=TF_SCHEMA
        )
        for fld in fields
    ]
    tf_all = tf_parts[0]
    for p in tf_parts[1:]:
        tf_all = tf_all.unionByName(p)
    attrs_tmp = os.path.join(out_dir, "doc_attrs__new")
    tf_all.groupBy("field", "doc_id").agg(F.max("dl").alias("dl")).write.mode(
        "overwrite"
    ).parquet(attrs_tmp)
    shutil.rmtree(os.path.join(out_dir, "doc_attrs"))
    os.rename(attrs_tmp, os.path.join(out_dir, "doc_attrs"))

    # invalidate affected groups' markers + data, then resume the build
    # (only those groups recompute, against the frozen on-disk dict)
    for g in affected_groups:
        stage = f"postings_group_{g}"
        if _has_marker(out_dir, stage):
            os.remove(_marker_path(out_dir, stage))
        gdir = os.path.join(out_dir, "postings", f"group={g}")
        if os.path.exists(gdir):
            shutil.rmtree(gdir)
    checkpointed_build(
        spark,
        new_docs,
        out_dir,
        fields=fields,
        id_col="doc_id",
        n_groups=n_groups,
        resume=True,
        **build_kw,
    )
    return {
        "deleted": len(doc_ids),
        "survivors": n_survivors,
        "affected_buckets": sorted(affected_buckets),
        "rebuilt_groups": affected_groups,
    }
