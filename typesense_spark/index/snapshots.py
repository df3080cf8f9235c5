"""Iceberg-shaped snapshot layer: versioned manifests over immutable
table directories, an atomic HEAD pointer, and time travel.

The north star calls the source relation "the Iceberg repo table"; this
module gives the INDEX side the same table-format contract the way
Iceberg gives it to data lakes (iceberg.apache.org spec, re-expressed
minimally — no external library in this container):

- **immutable data**: every commit writes NEW directories under
  ``data/<table>/v<N>/``; nothing is rewritten in place;
- **manifests**: ``snapshots/v<N>.json`` maps logical table names to
  their data directories, with per-table row counts collected DURING
  the write (Observation) and the parent version — unchanged tables
  INHERIT the parent's directories (copy-on-write at table
  granularity; postings groups are registered as separate tables, so
  an incremental delete commits only its affected groups);
- **atomic pointer swap**: ``HEAD`` is replaced via ``os.replace``
  (POSIX-atomic). Readers resolve HEAD → manifest → directories; a
  crashed commit leaves data+manifest orphans but never a torn HEAD —
  exactly Iceberg's catalog-pointer contract. (On an object store the
  pointer swap belongs in a catalog service; this file-based pointer
  is the single-filesystem analogue.)
- **time travel**: ``load_index(spark, root, version=K)`` reads any
  retained version; ``history(root)`` lists the lineage.

Scale: manifests hold one entry per table (dozens), not per file —
listing and planning stay O(tables) on the driver; the data itself is
parquet read by executors as usual.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession

HEAD_FILE = "HEAD"
SNAP_DIR = "snapshots"
DATA_DIR = "data"


def _manifest_path(root: str, version: int) -> str:
    return os.path.join(root, SNAP_DIR, f"v{version:06d}.json")


def head_version(root: str) -> int | None:
    try:
        with open(os.path.join(root, HEAD_FILE)) as f:
            return int(f.read().strip())
    except FileNotFoundError:
        return None


def read_manifest(root: str, version: int | None = None) -> dict:
    v = head_version(root) if version is None else version
    if v is None:
        raise FileNotFoundError(f"no snapshots at {root}")
    with open(_manifest_path(root, v)) as f:
        return json.load(f)


def history(root: str) -> list[dict]:
    """Snapshot lineage, oldest first: [{version, parent, op, ...}]."""
    snap_dir = os.path.join(root, SNAP_DIR)
    if not os.path.isdir(snap_dir):
        return []
    out = []
    for name in sorted(os.listdir(snap_dir)):
        if name.endswith(".json"):
            with open(os.path.join(snap_dir, name)) as f:
                m = json.load(f)
            out.append(
                {k: m[k] for k in ("version", "parent", "op", "created_utc")}
                | {"tables": sorted(m["tables"])}
            )
    return out


def commit(
    root: str,
    tables: dict[str, DataFrame],
    op: str,
    meta: dict | None = None,
) -> int:
    """Write ``tables`` as a new snapshot; unchanged tables inherit the
    parent's data directories. Returns the new version number.

    Each DataFrame is written to a fresh immutable directory; row
    counts ride the writes (Observation — no read-back pass). The new
    manifest is fsynced before HEAD swings, so a reader can never
    resolve a version without its manifest.
    """
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    parent = head_version(root)
    version = (parent or 0) + 1
    parent_tables: dict[str, dict] = (
        read_manifest(root, parent)["tables"] if parent is not None else {}
    )

    os.makedirs(os.path.join(root, SNAP_DIR), exist_ok=True)
    entries: dict[str, dict] = dict(parent_tables)  # inherit, then overwrite
    for name, df in tables.items():
        rel = os.path.join(DATA_DIR, name.replace("/", "__"), f"v{version:06d}")
        obs = Observation()
        df.observe(obs, F.count(F.lit(1)).alias("rows")).write.mode(
            "errorifexists"  # immutability: a version dir is never rewritten
        ).parquet(os.path.join(root, rel))
        entries[name] = {"path": rel, "rows": int(obs.get["rows"])}

    manifest = {
        "version": version,
        "parent": parent,
        "op": op,
        "created_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "tables": entries,
        "meta": meta or {},
    }
    mpath = _manifest_path(root, version)
    with open(mpath, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    tmp = os.path.join(root, HEAD_FILE + ".tmp")
    with open(tmp, "w") as f:
        f.write(str(version))
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(root, HEAD_FILE))  # the atomic swap
    return version


def load_tables(
    spark: SparkSession, root: str, version: int | None = None
) -> dict[str, DataFrame]:
    m = read_manifest(root, version)
    return {
        name: spark.read.parquet(os.path.join(root, e["path"]))
        for name, e in m["tables"].items()
    }


# ------------------------------------------------------- Index integration

POSTINGS_PREFIX = "postings/group="


def commit_index(
    root: str,
    ix,
    op: str = "full_build",
    n_groups: int = 4,
    build_kw: dict | None = None,
) -> int:
    """Snapshot a built Index: docs/terms/doc_attrs plus postings split
    into ``n_groups`` group tables (term_bucket % n_groups) so later
    incremental commits can inherit untouched groups. ``build_kw``
    (block_size / salt_threshold / n_salts / store_positions) is
    recorded in the manifest so incremental commits repack affected
    groups with the SAME parameters as the original build."""
    from pyspark.sql import functions as F

    tables: dict[str, DataFrame] = {
        "docs": ix.docs,
        "terms": ix.terms,
        "doc_attrs": ix.doc_attrs,
    }
    for g in range(n_groups):
        tables[f"{POSTINGS_PREFIX}{g}"] = ix.postings.where(
            F.pmod(F.col("term_bucket"), F.lit(n_groups)) == g
        )
    meta = {
        "num_buckets": ix.num_buckets,
        "n_groups": n_groups,
        "build_kw": {
            "block_size": 128,
            "salt_threshold": 100_000,
            "n_salts": 8,
            "store_positions": True,
            **(build_kw or {}),
        },
        "stats": {k: {"n_docs": v.n_docs, "sum_dl": v.sum_dl} for k, v in ix.stats.items()},
    }
    return commit(root, tables, op, meta)


def load_index(spark: SparkSession, root: str, version: int | None = None):
    """Load the Index at HEAD or at a pinned ``version`` (time travel).

    Multi-part logical tables union by prefix: ``postings/...`` parts
    (checkpoint groups AND streamed batches), ``docs/...`` and
    ``doc_attrs/...`` stream appendices — so a snapshot written by the
    batch build and extended by ``snapshotted_index_stream`` reads as
    one coherent index."""
    from functools import reduce

    from typesense_spark.index.build import FieldStats, Index

    m = read_manifest(root, version)
    t = load_tables(spark, root, version)

    def _union(base_name: str) -> DataFrame:
        parts = [
            df
            for name, df in t.items()
            if name == base_name or name.startswith(base_name + "/")
        ]
        return reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), parts)

    meta = m["meta"]
    return Index(
        spark=spark,
        docs=_union("docs"),
        doc_attrs=_union("doc_attrs"),
        terms=t["terms"],
        postings=_union("postings"),
        stats={k: FieldStats(**v) for k, v in meta["stats"].items()},
        num_buckets=meta["num_buckets"],
        out_dir=root,
    )


def delete_docs_versioned(
    spark: SparkSession, root: str, doc_ids: list[int], fields: list[str]
) -> dict:
    """Copy-on-write delete: a NEW snapshot whose docs/doc_attrs and
    AFFECTED postings groups are rewritten; untouched groups inherit
    the parent's immutable directories — and the parent version remains
    queryable (time travel), unlike the in-place ``maintain.delete_docs``.
    Frozen-stats semantics match maintain (terms/stats unchanged)."""
    from pyspark.sql import functions as F

    from typesense_spark.index.build import TF_SCHEMA, term_bucket_expr, tokenize_mapper

    m = read_manifest(root)
    meta = m["meta"]
    n_groups = meta["n_groups"]
    num_buckets = meta["num_buckets"]
    t = load_tables(spark, root)
    ids = [int(d) for d in doc_ids]
    victims = t["docs"].where(F.col("doc_id").isin(ids))

    touched: set[int] = set()
    for fld in fields:
        tf = victims.select("doc_id", fld).mapInPandas(
            tokenize_mapper(fld, False), schema=TF_SCHEMA
        )
        rows = (
            tf.select(term_bucket_expr(F.col("term"), num_buckets).alias("b"))
            .distinct()
            .collect()
        )
        touched |= {int(r["b"]) for r in rows}
    groups = sorted({b % n_groups for b in touched})

    new_tables: dict[str, DataFrame] = {
        "docs": t["docs"].where(~F.col("doc_id").isin(ids)),
        "doc_attrs": t["doc_attrs"].where(~F.col("doc_id").isin(ids)),
    }
    # affected groups: decode → drop victims → repack would re-run the
    # block packer; equivalent and simpler at the block level: keep
    # blocks, rewritten from the ORIGINAL corpus minus victims, by
    # rebuilding just those groups' postings from the surviving docs
    # against the FROZEN dictionary
    from typesense_spark.index.build import pack_pipeline

    survivors = new_tables["docs"]
    for g in groups:
        tf_parts = [
            survivors.select("doc_id", fld).mapInPandas(
                tokenize_mapper(fld, True), schema=TF_SCHEMA
            )
            for fld in fields
        ]
        tf_g = tf_parts[0]
        for p in tf_parts[1:]:
            tf_g = tf_g.unionByName(p)
        tf_g = tf_g.where(
            (F.pmod(term_bucket_expr(F.col("term"), num_buckets), F.lit(n_groups)) == g)
        )
        from typesense_spark.index.build import FieldStats

        frozen = {k: FieldStats(**v) for k, v in meta["stats"].items()}
        bk = meta["build_kw"]
        new_tables[f"{POSTINGS_PREFIX}{g}"] = pack_pipeline(
            spark, tf_g, t["terms"], frozen, fields,
            num_buckets=num_buckets, block_size=bk["block_size"],
            salt_threshold=bk["salt_threshold"], n_salts=bk["n_salts"],
            store_positions=bk["store_positions"],
        )
    v = commit(root, new_tables, op=f"delete {len(ids)} docs", meta=meta)
    return {"version": v, "deleted": len(ids), "rebuilt_groups": groups}
