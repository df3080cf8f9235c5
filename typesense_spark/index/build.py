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
- tokenize → tf runs in Arrow-batched ``mapInPandas`` (the deliberate
  numpy tokenize_mapper below — vectorized, not per-row Python); a
  pure-JVM expression variant exists and is proven identical in tests.
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
import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from typesense_spark import scoring
from typesense_spark.index import codec


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

# B5: array-string positions at rest encode (element, local position) in
# one monotone integer: pos = elem_idx * ELEM_STRIDE + local_pos. The
# reference stores per-element offsets behind an array-index sentinel
# (/root/reference/src/index.cpp:590-598; decode populate_token_positions
# :1977-2017); the stride form keeps its two guarantees — proximity
# windows can never span an element boundary (stride >> WINDOW_SIZE) and
# Match/highlight can name WHICH element matched (split_elem_pos) —
# while staying delta+varint friendly (inter-element gaps are one ~3-byte
# varint). tf/df stay joint across elements (pinned; tested).
ELEM_STRIDE = 1 << 20


def split_elem_pos(pos: int) -> tuple[int, int]:
    """Stored array-field position → (array element index, local pos)."""
    return pos // ELEM_STRIDE, pos % ELEM_STRIDE


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

    # duplicate composite keys would make the row_number tie order (and
    # therefore doc_ids) nondeterministic across recomputations; detect
    # them inside the counts pass we already pay for (r1 ADVICE)
    stats_rows = (
        bucketed.groupBy("_bkt")
        .agg(F.count("*").alias("cnt"), F.countDistinct("_skey").alias("dcnt"))
        .collect()
    )
    dupes = sum(r["cnt"] - r["dcnt"] for r in stats_rows)
    if dupes:
        raise ValueError(
            f"assign_doc_ids: key_cols {key_cols} are not unique "
            f"({dupes} duplicate rows) — doc_id assignment would be "
            "nondeterministic; deduplicate or add a distinguishing key column"
        )
    counts = {r["_bkt"]: r["cnt"] for r in stats_rows}
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


TF_SCHEMA = T.StructType(
    [
        T.StructField("field", T.StringType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("term", T.StringType()),
        T.StructField("tf", T.LongType()),
        T.StructField("dl", T.LongType()),
        T.StructField("pos_bin", T.BinaryType()),  # varint [count, first, deltas…]
    ]
)


def tokenize_mapper(fld: str, store_positions: bool):
    """Map-side tokenize + per-doc term grouping + position packing.

    The scale-critical design choice of the whole build: tokenization,
    (doc, term) grouping, tf, dl, AND position delta+varint packing all
    happen in ONE Arrow-batched pass over the corpus scan — NO doc-level
    shuffle exists anywhere. The only wide shuffle in the build is the
    final repartition-by-(term, salt) of compact rows whose positions
    are already bytes. (The earlier explode → groupBy(doc, term) →
    collect_list design shipped ~1 wide row per token occurrence
    through two shuffles; it was shuffle-I/O-bound and did not scale
    8→32 cores.) Uses the pinned Python tokenizer, so unicode folding
    is identical to the oracle by construction.
    """
    from typesense_spark.tokenizer import tokenize

    def gen(batches):
        for pdf in batches:
            doc_ids: list[int] = []
            terms: list[str] = []
            tfs: list[int] = []
            dls: list[int] = []
            flat_vals: list[int] = []
            counts: list[int] = []
            for doc_id, content in zip(pdf["doc_id"], pdf[fld]):
                toks = tokenize(content or "")
                dl = len(toks)
                if dl == 0:
                    continue
                per: dict[str, list[int]] = {}
                for t, p in toks:
                    per.setdefault(t, []).append(p)
                for t, ps in per.items():
                    doc_ids.append(int(doc_id))
                    terms.append(t)
                    tfs.append(len(ps))
                    dls.append(dl)
                    if store_positions:
                        counts.append(len(ps) + 1)
                        flat_vals.append(len(ps))
                        flat_vals.append(ps[0])
                        for a, b in zip(ps, ps[1:]):
                            flat_vals.append(b - a)
            if store_positions and terms:
                pos_bins = codec.varint_encode_split(
                    np.asarray(flat_vals, dtype=np.uint64),
                    np.asarray(counts, dtype=np.int64),
                )
            else:
                pos_bins = [b""] * len(terms)
            yield pd.DataFrame(
                {
                    "field": fld,
                    "doc_id": pd.array(doc_ids, dtype="int64"),
                    "term": terms,
                    "tf": pd.array(tfs, dtype="int64"),
                    "dl": pd.array(dls, dtype="int64"),
                    "pos_bin": pos_bins,
                }
            )

    return gen


def tokenize_mapper_array(fld: str, store_positions: bool):
    """B5 array-string tokenize: one Arrow-batched pass like
    :func:`tokenize_mapper`, but positions restart per element and are
    stored as ``elem_idx * ELEM_STRIDE + local_pos`` (see ELEM_STRIDE).
    dl / tf / df aggregate jointly across elements (pinned — the
    reference's tf is per-token occurrences over the whole array too)."""
    from typesense_spark.tokenizer import tokenize

    def gen(batches):
        for pdf in batches:
            doc_ids: list[int] = []
            terms: list[str] = []
            tfs: list[int] = []
            dls: list[int] = []
            flat_vals: list[int] = []
            counts: list[int] = []
            for doc_id, elems in zip(pdf["doc_id"], pdf[fld]):
                per: dict[str, list[int]] = {}
                dl = 0
                if elems is not None:
                    for ei, content in enumerate(elems):
                        toks = tokenize(content or "")
                        dl += len(toks)
                        off = ei * ELEM_STRIDE
                        for t, p in toks:
                            per.setdefault(t, []).append(off + p)
                if dl == 0:
                    continue
                for t, ps in per.items():  # ps ascending by construction
                    doc_ids.append(int(doc_id))
                    terms.append(t)
                    tfs.append(len(ps))
                    dls.append(dl)
                    if store_positions:
                        counts.append(len(ps) + 1)
                        flat_vals.append(len(ps))
                        flat_vals.append(ps[0])
                        for a, b in zip(ps, ps[1:]):
                            flat_vals.append(b - a)
            if store_positions and terms:
                pos_bins = codec.varint_encode_split(
                    np.asarray(flat_vals, dtype=np.uint64),
                    np.asarray(counts, dtype=np.int64),
                )
            else:
                pos_bins = [b""] * len(terms)
            yield pd.DataFrame(
                {
                    "field": fld,
                    "doc_id": pd.array(doc_ids, dtype="int64"),
                    "term": terms,
                    "tf": pd.array(tfs, dtype="int64"),
                    "dl": pd.array(dls, dtype="int64"),
                    "pos_bin": pos_bins,
                }
            )

    return gen


def _binary_buffers(arr) -> tuple[np.ndarray, np.ndarray]:
    """Arrow Binary/StringArray → (offsets[int32], values[uint8]) as
    numpy views over the Arrow buffers, corrected for the array's
    slice offset — NO per-row Python objects are created."""
    bufs = arr.buffers()
    offsets = np.frombuffer(bufs[1], dtype=np.int32)[
        arr.offset : arr.offset + len(arr) + 1
    ]
    values = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None else np.empty(0, np.uint8)
    return offsets, values


def _group_change(batch) -> np.ndarray:
    """Boolean mask: row starts a new (term, salt) group. term
    comparison runs in Arrow compute (no Python string objects)."""
    import pyarrow.compute as pc

    n = batch.num_rows
    change = np.empty(n, dtype=bool)
    change[0] = True
    if n > 1:
        t = batch.column("term")
        neq = pc.not_equal(t.slice(1), t.slice(0, n - 1)).to_numpy(
            zero_copy_only=False
        )
        salts = batch.column("salt").to_numpy()
        change[1:] = neq | (salts[1:] != salts[:-1])
    return change


def _pack_batch_arrow(batch, block_size: int, store_positions: bool, fld: str):
    """Pack one Arrow batch of rows sorted by (term, salt, doc_id)
    holding only COMPLETE (term, salt) groups — vectorized across every
    group and block; the per-doc position streams are spliced per block
    by slicing the Arrow binary VALUE buffer (one numpy slice per
    block, never 13M Python bytes objects). Contributions arrive
    precomputed (JVM-side, ULP-identical to numpy — asserted in
    tests/test_scoring_parity.py), so the shuffle rows carry neither
    dl nor df."""
    import pyarrow as pa

    doc_ids = batch.column("doc_id").to_numpy()
    tfs = batch.column("tf").to_numpy()
    contribs = batch.column("contrib").to_numpy()
    salts = batch.column("salt").to_numpy()
    n = doc_ids.size

    grp_change = _group_change(batch)
    grp_start_of = np.maximum.accumulate(np.where(grp_change, np.arange(n), 0))
    pos_in_grp = np.arange(n) - grp_start_of
    is_start = grp_change | (pos_in_grp % block_size == 0)
    starts = np.flatnonzero(is_start)
    ends = np.append(starts[1:], n)
    sizes = ends - starts

    u = doc_ids.astype(np.uint64)
    deltas = np.empty(n, dtype=np.uint64)
    deltas[0] = u[0]
    deltas[1:] = u[1:] - u[:-1] - np.uint64(1)
    deltas[starts] = u[starts]  # each block restarts with a raw id
    ids_bins = codec.varint_encode_split(deltas, sizes)
    tfs_bins = codec.varint_encode_split(tfs.astype(np.uint64), sizes)
    con_bins = codec.varint_encode_split(contribs.astype(np.uint64), sizes)
    if store_positions:
        offs, vals = _binary_buffers(batch.column("pos_bin"))
        vb = vals.tobytes()  # one copy per batch; slices below are per BLOCK
        pos_bins = [vb[offs[a] : offs[e]] for a, e in zip(starts, ends)]
    else:
        pos_bins = [b""] * starts.size

    starts_pa = pa.array(starts, type=pa.int64())
    return pa.RecordBatch.from_arrays(
        [
            pa.array([fld] * starts.size, type=pa.string()),
            batch.column("term").take(starts_pa),
            pa.array(salts[starts].astype(np.int32), type=pa.int32()),
            pa.array((pos_in_grp[starts] // block_size).astype(np.int32), type=pa.int32()),
            pa.array(sizes.astype(np.int32), type=pa.int32()),
            pa.array(doc_ids[starts], type=pa.int64()),
            pa.array(doc_ids[ends - 1], type=pa.int64()),
            pa.array(np.maximum.reduceat(tfs, starts), type=pa.int64()),
            pa.array(np.maximum.reduceat(contribs, starts), type=pa.int64()),
            pa.array(ids_bins, type=pa.binary()),
            pa.array(tfs_bins, type=pa.binary()),
            pa.array(con_bins, type=pa.binary()),
            pa.array(pos_bins, type=pa.binary()),
        ],
        names=[f.name for f in POSTINGS_SCHEMA.fields],
    )


def pack_pipeline(
    spark: SparkSession,
    tf_all: DataFrame,
    terms: DataFrame,
    stats: "dict[str, FieldStats]",
    fields: list[str],
    num_buckets: int,
    block_size: int,
    salt_threshold: int,
    n_salts: int,
    store_positions: bool,
) -> DataFrame:
    """tf rows + term dictionary → packed posting blocks.

    ONE wide shuffle: hash by (term, salt), sort groups + doc order
    within partitions, stream-pack (see _make_pack_fn). Factored out so
    the checkpointed build can replay it per bucket group against the
    on-disk dictionary without recomputing stats.

    Shuffle rows are SLIM (r2): the quantized BM25 contribution is
    computed JVM-side before the shuffle (bit-identical to the numpy
    form — asserted in tests/test_scoring_parity.py), so dl, df, and
    the constant field string never cross the wire; each row is
    (term, salt, doc_id, tf, contrib, pos_bytes).
    """
    n_pack = int(spark.conf.get("spark.sql.shuffle.partitions"))
    packed_parts = []
    for fld in fields:
        fs = stats[fld]
        tf_f = tf_all.where(F.col("field") == fld)
        # dl already on the row — only the per-term df joins in
        # (broadcast when small; key matches the pack shuffle key).
        # LEFT join: when packing against a FROZEN dictionary (group
        # rebuild after upsert, streaming append), terms the dictionary
        # has never seen default to df=1 — same pinned semantics as
        # streaming/incremental.py
        enriched = tf_f.join(
            terms.where(F.col("field") == fld).select("term", "df"), "term", "left"
        ).withColumn("df", F.coalesce("df", F.lit(1)))
        # hot-term salting: bound any single pack-group's size
        slim = enriched.select(
            "term",
            F.when(
                F.col("df") > salt_threshold,
                F.pmod(F.col("doc_id"), F.lit(n_salts)).cast("int"),
            )
            .otherwise(F.lit(0))
            .alias("salt"),
            "doc_id",
            "tf",
            scoring.spark_contrib_expr(
                F.col("tf"), F.col("dl"), F.col("df"), fs.n_docs, fs.avgdl
            ).alias("contrib"),
            "pos_bin",
        )
        packed = (
            slim.repartition(n_pack, "term", "salt")
            .sortWithinPartitions("term", "salt", "doc_id")
            .mapInArrow(
                _make_pack_fn(block_size, store_positions, fld),
                schema=POSTINGS_SCHEMA,
            )
        )
        packed_parts.append(packed)
    postings = packed_parts[0]
    for p in packed_parts[1:]:
        postings = postings.unionByName(p)
    # term_bucket rides as a COLUMN; files keep term-sorted row groups,
    # so parquet min/max stats prune scans on term and bucket filters
    return postings.withColumn(
        "term_bucket", term_bucket_expr(F.col("term"), num_buckets).cast("int")
    )


def _make_pack_fn(block_size: int, store_positions: bool, fld: str):
    """Streaming per-partition packer for mapInArrow over rows sorted by
    (term, salt, doc_id) within the partition.

    Carries the trailing INCOMPLETE group of each Arrow batch into the
    next one (as an Arrow slice — zero-copy), so batches handed to
    ``_pack_batch_arrow`` always hold whole groups. History of this hot
    path: per-group ``applyInPandas`` (~5-8 ms fixed cost × 64k groups
    = 547 core-s) → per-batch mapInPandas (r1) → mapInArrow (r2: the
    pandas conversion was materializing one Python bytes object per
    posting row for pos_bin, the single largest cost in the build)."""
    import pyarrow as pa

    def _concat(a, b):
        # pa.concat_batches needs pyarrow >= 16; Table route works on all
        return (
            pa.Table.from_batches([a, b]).combine_chunks().to_batches(
                max_chunksize=a.num_rows + b.num_rows
            )[0]
        )

    def pack(batches):
        pending = None
        for batch in batches:
            if pending is not None and pending.num_rows:
                batch = _concat(pending, batch)
            if not batch.num_rows:
                continue
            change = _group_change(batch)
            # cut = start of the trailing group (sorted ⇒ contiguous)
            cut = int(np.flatnonzero(change)[-1])
            complete, pending = batch.slice(0, cut), batch.slice(cut)
            if complete.num_rows:
                yield _pack_batch_arrow(complete, block_size, store_positions, fld)
        if pending is not None and pending.num_rows:
            yield _pack_batch_arrow(pending, block_size, store_positions, fld)

    return pack


def _flat_varints(batch, col: str, count: int | None = None) -> np.ndarray:
    """Decode the CONCATENATION of one binary column's per-block varint
    streams in a single vectorized pass — per-block boundaries are
    recovered afterwards from value counts (``n_docs``), never by
    iterating rows. Zero per-row Python objects: the stream is one
    numpy slice of the Arrow VALUE buffer."""
    offs, vals = _binary_buffers(batch.column(col))
    stream = vals[offs[0] : offs[-1]].tobytes()
    return codec.varint_decode(stream, count=count)


def _decode_batch_arrow(batch):
    """One Arrow batch of packed blocks → exploded posting rows
    (field, term, doc_id, tf, contrib), vectorized end-to-end:
    - the three varint columns decode as ONE concatenated stream each
      (``_flat_varints``);
    - doc ids un-delta via :func:`codec.segmented_delta_decode` with
      ``n_docs`` as the segment sizes;
    - field/term replicate per posting with an Arrow ``take`` (the
      string data never becomes Python objects).
    This is the read-side mirror of the r2 pack rework
    (``_pack_batch_arrow``): the old mapInPandas form boxed every block
    through ``itertuples`` + a pandas frame per block, ~1-2 s of every
    headline query at sf0.1."""
    import pyarrow as pa

    n_docs = batch.column("n_docs").to_numpy().astype(np.int64)
    total = int(n_docs.sum())
    ids = codec.segmented_delta_decode(_flat_varints(batch, "ids_bin", total), n_docs)
    tfs = _flat_varints(batch, "tfs_bin", total)
    cons = _flat_varints(batch, "contribs_bin", total)
    take = pa.array(np.repeat(np.arange(batch.num_rows), n_docs), type=pa.int64())
    return pa.RecordBatch.from_arrays(
        [
            batch.column("field").take(take),
            batch.column("term").take(take),
            pa.array(ids.astype(np.int64), type=pa.int64()),
            pa.array(tfs.astype(np.int64), type=pa.int64()),
            pa.array(cons.astype(np.int64), type=pa.int64()),
        ],
        names=[f.name for f in DECODED_SCHEMA.fields],
    )


def decode_postings(postings: DataFrame) -> DataFrame:
    """Packed blocks → exploded (field, term, doc_id, tf, contrib).

    Arrow-batched ``mapInArrow`` (buffer slicing, no per-block Python —
    see :func:`_decode_batch_arrow`); the inverse of the pack stage
    (round-trip tested). Filters on term/term_bucket should be applied
    on ``postings`` BEFORE calling so parquet partition pruning happens.
    """

    def gen(batches):
        for batch in batches:
            if batch.num_rows:
                yield _decode_batch_arrow(batch)

    cols = ["field", "term", "n_docs", "ids_bin", "tfs_bin", "contribs_bin"]
    return postings.select(*cols).mapInArrow(gen, schema=DECODED_SCHEMA)


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
    # block packing granularity, recorded so the query side can estimate
    # block counts from df alone (WAND engagement heuristic — no count job)
    block_size: int = 128

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
        # plain parquet, term-sorted row groups → min/max pruning on term
        self.postings.write.mode("overwrite").parquet(
            os.path.join(out_dir, "postings")
        )
        self.terms.write.mode("overwrite").parquet(os.path.join(out_dir, "terms"))
        self.doc_attrs.write.mode("overwrite").parquet(os.path.join(out_dir, "doc_attrs"))
        self.docs.write.mode("overwrite").parquet(os.path.join(out_dir, "docs"))
        with open(os.path.join(out_dir, "stats.json"), "w") as f:
            json.dump(
                {
                    "num_buckets": self.num_buckets,
                    "block_size": self.block_size,
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
            block_size=meta.get("block_size", 128),
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
    persist_light: bool = False,
    bucket_group: tuple[int, int] | None = None,
    score_col: str | None = None,
) -> Index:
    """Build the inverted index over ``fields`` of ``docs``.

    Pure function of the docs table — the reference proves the same
    contract by rebuilding its whole index from the doc store at startup
    (``/root/reference/src/collection_manager.cpp:153-232``).

    ``score_col``: optional static ranking column; when set, the terms
    dictionary gains ``max_score`` = max of that column over the docs
    holding each term — the analogue of the reference ART leaf's
    ``max_score`` (``include/art.h:49-55``), used by
    ``rank_tokens_by='max_score'`` candidate ordering.
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

    # B5: string-array fields tokenize per ELEMENT with stride-encoded
    # positions (elem_idx * ELEM_STRIDE + local_pos — see ELEM_STRIDE):
    # proximity windows can never span an element boundary AND the
    # stored postings can name which element matched, completing the
    # reference's per-element offset encoding at rest
    # (src/index.cpp:590-598, decode populate_token_positions
    # :1977-2017). tf/df stay joint across elements (pinned; tested).
    schema_types = dict(docs.dtypes)
    array_fields = [
        fld for fld in fields if schema_types.get(fld, "").startswith("array")
    ]

    # B3: per-row content invariant vs the source (input_hint:
    # "content sha256 equality"), carried on the docs table; array
    # content hashes its plain-joined logical string
    if "content" in docs.columns and "content_sha" not in docs.columns:
        content_str = (
            F.array_join(F.col("content"), " ")
            if "content" in array_fields
            else F.col("content")
        )
        docs = docs.withColumn("content_sha", F.sha2(content_str, 256))

    # persist_light: cache ONLY the narrow relations (docs handle,
    # position-free tf, dictionary aggs) so a dictionary-only caller
    # (the checkpoint dict stage) runs ONE tokenize pass instead of
    # one per consumer action — without triggering the pack pipeline
    # the way persist=True does. Wide tf rows are never cached
    # (heap-thrash anti-scaling, see module notes).
    if persist or persist_light:
        # docs feed both tokenize passes + query-time joins
        docs = docs.persist()

    def _tf(with_positions: bool) -> DataFrame:
        parts = [
            docs.select("doc_id", fld).mapInPandas(
                (tokenize_mapper_array if fld in array_fields else tokenize_mapper)(
                    fld, with_positions
                ),
                schema=TF_SCHEMA,
            )
            for fld in fields
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    # Two tokenize passes instead of caching the (huge) tf relation:
    # the map-side tokenizer is cheap and embarrassingly parallel,
    # while caching tens of millions of tf rows thrashed the heap and
    # made the build ANTI-scale with cores. Recompute > cache here.
    tf_light = _tf(False)  # dictionary/stats pass (no position bytes)
    if persist or persist_light:
        # narrow rows, shared by stats + terms + doc_attrs actions
        tf_light = tf_light.persist()
    tf_all = _tf(store_positions)  # pack pass
    if bucket_group is not None:
        # checkpoint-group slice, applied MAP-SIDE before the pack
        # shuffle so total shuffle volume across groups stays 1x
        n_groups, g = bucket_group
        tf_all = tf_all.where(
            F.pmod(term_bucket_expr(F.col("term"), num_buckets), F.lit(n_groups)) == g
        )

    # dl rides on every tf row (map-side) → doc_attrs is a narrow agg
    doc_attrs = tf_light.groupBy("field", "doc_id").agg(F.max("dl").alias("dl"))
    # term dictionary: df/cf/max_tf — narrow agg with map-side combine
    terms = tf_light.groupBy("field", "term").agg(
        F.count("*").alias("df"),
        F.sum("tf").alias("cf"),
        F.max("tf").alias("max_tf"),
    )
    if score_col is not None:
        # MAX_SCORE token ordering support: max static score per term
        # (broadcast-joinable doc→score map rides the tf rows; one more
        # narrow agg with map-side combine)
        msc = (
            tf_light.join(
                docs.select("doc_id", F.col(score_col).cast("long").alias("_sc")),
                "doc_id",
            )
            .groupBy("field", "term")
            .agg(F.max("_sc").alias("max_score"))
        )
        terms = terms.join(msc, ["field", "term"])
    if persist or persist_light:
        doc_attrs = doc_attrs.persist()
        terms = terms.persist()

    # corpus stats (exact longs → avgdl division pinned in Python,
    # mirrored exactly by the DuckDB oracle). When the dictionary
    # relations are cached, the SAME job also materializes the terms
    # cache (union probe): both aggregates share the one in-flight
    # tf_light computation instead of the pack job re-traversing the
    # cache through a second plan-compile + AQE round (r4 VERDICT #3 —
    # fuse the stats/terms/doc_attrs actions onto one pass).
    t_stats = time.time()
    probe = doc_attrs.groupBy("field").agg(
        F.count("*").alias("n"), F.sum("dl").alias("s")
    ).withColumn("_src", F.lit("attrs"))
    if persist or persist_light:
        probe = probe.unionByName(
            terms.groupBy("field").agg(
                F.count("*").alias("n"), F.sum("df").alias("s")
            ).withColumn("_src", F.lit("terms"))
        )
    stats: dict[str, FieldStats] = {}
    for r in probe.collect():
        if r["_src"] == "attrs":
            stats[r["field"]] = FieldStats(n_docs=int(r["n"]), sum_dl=int(r["s"]))
        else:
            report.n_terms += int(r["n"])
    report.stages["tokenize_stats_sec"] = round(time.time() - t_stats, 3)

    postings = pack_pipeline(
        spark,
        tf_all,
        terms,
        stats,
        fields,
        num_buckets=num_buckets,
        block_size=block_size,
        salt_threshold=salt_threshold,
        n_salts=n_salts,
        store_positions=store_positions,
    )

    report.n_docs = max((s.n_docs for s in stats.values()), default=0)
    if persist:
        t_pack = time.time()
        postings = postings.persist()
        # exactly ONE materializing action for the pack pipeline;
        # term/doc counts are free by-products of stats / lazy tables
        report.n_postings = int(
            postings.agg(F.sum("n_docs")).collect()[0][0] or 0
        )
        report.stages["pack_sec"] = round(time.time() - t_pack, 3)
    report.elapsed_sec = time.time() - t0

    ix = Index(
        spark=spark,
        docs=docs,
        doc_attrs=doc_attrs,
        terms=terms,
        postings=postings,
        stats=stats,
        num_buckets=num_buckets,
        report=report,
        block_size=block_size,
    )
    ix._tf_light = tf_light  # handle for callers that unpersist mid-job
    return ix
