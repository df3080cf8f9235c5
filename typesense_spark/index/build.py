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
    # therefore doc_ids) nondeterministic across recomputations. r6:
    # the check rides the rank window itself (equal ADJACENT keys in
    # the (_bkt, _skey) sort raise in-expression — duplicates are
    # always adjacent because the bucket is a function of the key), so
    # the counts job no longer pays a countDistinct over every key
    # string (~0.6 s/job of the 8-core build's fixed cost). The error
    # now surfaces at the first ACTION over the result instead of
    # inside this call — same invariant, message still says
    # "not unique" (tests pin it).
    stats_rows = (
        bucketed.groupBy("_bkt").agg(F.count("*").alias("cnt")).collect()
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
    dup_guard = F.coalesce(
        F.when(
            F.lag("_skey").over(w) == F.col("_skey"),
            F.expr(
                "CAST(raise_error(concat('assign_doc_ids: key_cols are "
                "not unique (duplicate key: ', _skey, ') — doc_id "
                "assignment would be nondeterministic; deduplicate or "
                "add a distinguishing key column')) AS BIGINT)"
            ),
        ),
        F.lit(0),
    )
    return (
        bucketed.withColumn(
            "doc_id",
            (F.row_number().over(w) - 1 + off_expr + dup_guard).cast("long"),
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


# ASCII tokenize lookup table (vectorized fast path): kept chars map to
# their lowercased selves, the two separators (space / newline — the
# pinned split set) both map to 0x20, everything else maps to 0 and is
# deleted in place — exactly the `_FULL_STRIP_RE` + split semantics of
# tokenizer.tokenize's ASCII branch (positions = raw slot index,
# keep_empty: empty slots consume positions but emit no term).
_TOKEN_LUT = np.zeros(256, dtype=np.uint8)
for _c in range(ord("a"), ord("z") + 1):
    _TOKEN_LUT[_c] = _c
for _c in range(ord("A"), ord("Z") + 1):
    _TOKEN_LUT[_c] = _c + 32
for _c in range(ord("0"), ord("9") + 1):
    _TOKEN_LUT[_c] = _c
_TOKEN_LUT[ord(" ")] = 0x20
_TOKEN_LUT[ord("\n")] = 0x20


def _tokenize_groups_ascii(doc_ids_np, offsets, values):
    """Vectorized tokenize + (doc, term) grouping core for one all-ASCII
    Arrow batch — zero per-row / per-token Python loops.

    Pipeline (all numpy / pyarrow.compute):
      byte LUT (lowercase, strip-in-place, unify separators) → boolean
      compaction → separator positions → token slot boundaries → Arrow
      string array built over the compacted byte buffer (no copies per
      token) → dictionary-encode → stable fused-key argsort-group by
      (row, term code).

    Returns None (no tokens) or a dict of numpy/arrow arrays shared by
    the TF batch builder (:func:`_tokenize_batch_ascii`) and the
    partial-stats builder (:func:`_stats_batch_ascii`). Output
    equivalence with the per-row ``tokenize_mapper`` (pinned spec) is
    asserted in tests/test_index_build.py.
    """
    import pyarrow as pa

    n_docs = doc_ids_np.size
    mapped = _TOKEN_LUT[values]
    keep = mapped != 0
    cleaned = mapped[keep]
    # kept bytes per doc via one reduceat pass (a full-length bool
    # cumsum is 4-15x slower on this memory-bandwidth-bound box)
    st = offsets[:-1]
    kept_per_doc = np.add.reduceat(keep, np.minimum(st, max(values.size - 1, 0)))
    kept_per_doc[st == offsets[1:]] = 0  # reduceat misreads empty segments
    new_off = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(kept_per_doc, out=new_off[1:])  # doc boundaries, cleaned space

    seps = cleaned == 0x20
    sep_pos = np.flatnonzero(seps)
    # slots per doc = separators inside the doc span + 1
    slots = (
        np.searchsorted(sep_pos, new_off[1:])
        - np.searchsorted(sep_pos, new_off[:-1])
        + 1
    )
    total_slots = int(slots.sum())
    starts = np.sort(np.concatenate([new_off[:-1], sep_pos + 1]))
    ends = np.sort(np.concatenate([sep_pos, new_off[1:]]))
    token_doc = np.repeat(np.arange(n_docs), slots)
    first_slot = np.zeros(n_docs, dtype=np.int64)
    np.cumsum(slots[:-1], out=first_slot[1:])
    pos = np.arange(total_slots) - np.repeat(first_slot, slots)
    token_lens = ends - starts

    # tokens are adjacent once separators are dropped → one offsets
    # array over the separator-free buffer IS the token string array
    tok_values = cleaned[~seps]
    off_tok = np.zeros(total_slots + 1, dtype=np.int64)
    np.cumsum(token_lens, out=off_tok[1:])
    tokens_arr = pa.Array.from_buffers(
        pa.utf8(),
        total_slots,
        [None, pa.py_buffer(off_tok.astype(np.int32)), pa.py_buffer(tok_values)],
    )
    denc = tokens_arr.dictionary_encode()
    codes = denc.indices.to_numpy().astype(np.int64)
    dictionary = denc.dictionary

    nonempty = token_lens > 0
    doc = token_doc[nonempty]
    code = codes[nonempty]
    pos = pos[nonempty]
    if doc.size == 0:
        return None
    dl = np.bincount(doc, minlength=n_docs)

    # stable single-key argsort on the fused (doc, code) key — ~4x
    # faster than np.lexsort here; stability keeps positions ascending
    n_dict = len(dictionary)
    order = np.argsort(doc * np.int64(max(n_dict, 1)) + code, kind="stable")
    sd, sc, sp = doc[order], code[order], pos[order]
    n = sd.size
    newgrp = np.empty(n, dtype=bool)
    newgrp[0] = True
    newgrp[1:] = (sd[1:] != sd[:-1]) | (sc[1:] != sc[:-1])
    grp_idx = np.empty(n, dtype=np.int64)
    np.cumsum(newgrp, out=grp_idx)
    grp_idx -= 1
    n_groups = int(grp_idx[-1]) + 1
    tf = np.bincount(grp_idx, minlength=n_groups)
    return {
        "dictionary": dictionary,
        "dl": dl,
        "sp": sp,
        "newgrp": newgrp,
        "grp_idx": grp_idx,
        "n_groups": n_groups,
        "tf": tf,
        "grp_doc": sd[newgrp],
        "grp_code": sc[newgrp],
    }


def _const_str_array(s: str, n: int):
    """Arrow StringArray of ``s`` repeated ``n`` times, built from raw
    buffers (no per-row Python strings)."""
    import pyarrow as pa

    b = s.encode()
    return pa.Array.from_buffers(
        pa.utf8(),
        n,
        [
            None,
            pa.py_buffer((np.arange(n + 1, dtype=np.int64) * len(b)).astype(np.int32)),
            pa.py_buffer(b * n),
        ],
    )


def _tokenize_batch_ascii(doc_ids_np, offsets, values, store_positions, fld):
    """All-ASCII Arrow batch → TF_SCHEMA RecordBatch (tf / dl /
    delta-packed positions via ``varint_encode_offsets``)."""
    import pyarrow as pa

    g = _tokenize_groups_ascii(doc_ids_np, offsets, values)
    if g is None:
        return None
    dictionary, dl = g["dictionary"], g["dl"]
    sp, newgrp, grp_idx = g["sp"], g["newgrp"], g["grp_idx"]
    n_groups, tf = g["n_groups"], g["tf"]
    grp_doc, grp_code = g["grp_doc"], g["grp_code"]
    n = sp.size

    if store_positions:
        # flat stream per group: [tf, p0, deltas...] (deltas computed in
        # int64 first — the cross-group entries go negative before being
        # overwritten with each group's raw first position)
        d64 = np.empty(n, dtype=np.int64)
        d64[0] = sp[0]
        d64[1:] = sp[1:] - sp[:-1]
        d64[newgrp] = sp[newgrp]
        flat = np.empty(n + n_groups, dtype=np.uint64)
        flat[np.flatnonzero(newgrp) + np.arange(n_groups)] = tf.astype(np.uint64)
        flat[np.arange(n) + grp_idx + 1] = d64.astype(np.uint64)
        buf, boffs = codec.varint_encode_offsets(flat, tf + 1)
        pos_arr = pa.Array.from_buffers(
            pa.binary(),
            n_groups,
            [None, pa.py_buffer(boffs.astype(np.int32)), pa.py_buffer(buf)],
        )
    else:
        pos_arr = pa.Array.from_buffers(
            pa.binary(),
            n_groups,
            [None, pa.py_buffer(np.zeros(n_groups + 1, dtype=np.int32)), pa.py_buffer(b"")],
        )

    return pa.RecordBatch.from_arrays(
        [
            _const_str_array(fld, n_groups),
            pa.array(doc_ids_np[grp_doc], type=pa.int64()),
            dictionary.take(pa.array(grp_code, type=pa.int64())),
            pa.array(tf.astype(np.int64), type=pa.int64()),
            pa.array(dl[grp_doc].astype(np.int64), type=pa.int64()),
            pos_arr,
        ],
        names=[f.name for f in TF_SCHEMA.fields],
    )


# partial-stats rows (map-side pre-aggregation, guide §2.3 "aggregate
# before you shuffle"): doc rows carry (doc_id, dl); term rows carry
# per-batch partials (df, cf, max_tf[, max_score]) keyed by term. The
# stats/dictionary pass previously shipped EVERY (doc, term, tf, dl)
# row to the JVM (13.5M rows / 100k docs) and cached them; partials cut
# the Python→JVM transfer and the aggregation input by ~50x.
STATS_SCHEMA = T.StructType(
    [
        T.StructField("field", T.StringType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("term", T.StringType()),
        T.StructField("dl", T.LongType()),
        T.StructField("df", T.LongType()),
        T.StructField("cf", T.LongType()),
        T.StructField("max_tf", T.LongType()),
        T.StructField("max_score", T.LongType()),
    ]
)


def _stats_batch_ascii(doc_ids_np, offsets, values, scores_np, fld):
    """All-ASCII Arrow batch → (doc rows, term rows) partial-stats
    RecordBatches (see STATS_SCHEMA); ``scores_np`` optional (max_score
    support for score_col indexes)."""
    import pyarrow as pa

    g = _tokenize_groups_ascii(doc_ids_np, offsets, values)
    if g is None:
        return []
    dictionary, dl = g["dictionary"], g["dl"]
    tf, grp_doc, grp_code = g["tf"], g["grp_doc"], g["grp_code"]
    n_dict = len(dictionary)

    out = []
    nz = np.flatnonzero(dl)
    n_doc_rows = nz.size
    null_l = pa.nulls(n_doc_rows, pa.int64())
    out.append(
        pa.RecordBatch.from_arrays(
            [
                _const_str_array(fld, n_doc_rows),
                pa.array(doc_ids_np[nz], type=pa.int64()),
                pa.nulls(n_doc_rows, pa.string()),
                pa.array(dl[nz].astype(np.int64), type=pa.int64()),
                null_l,
                null_l,
                null_l,
                null_l,
            ],
            names=[f.name for f in STATS_SCHEMA.fields],
        )
    )

    df_p = np.bincount(grp_code, minlength=n_dict)
    cf_p = np.bincount(grp_code, weights=tf, minlength=n_dict).astype(np.int64)
    # per-code max over groups: sort groups by code, reduceat at starts
    order = np.argsort(grp_code)
    gc_s = grp_code[order]
    code_new = np.empty(gc_s.size, dtype=bool)
    code_new[0] = True
    code_new[1:] = gc_s[1:] != gc_s[:-1]
    code_starts = np.flatnonzero(code_new)
    present = gc_s[code_starts]
    max_tf_p = np.maximum.reduceat(tf[order], code_starts)
    if scores_np is not None:
        max_sc_p = np.maximum.reduceat(scores_np[grp_doc][order], code_starts)
        sc_arr = pa.array(max_sc_p.astype(np.int64), type=pa.int64())
    else:
        sc_arr = pa.nulls(present.size, pa.int64())
    n_term_rows = present.size
    null_t = pa.nulls(n_term_rows, pa.int64())
    out.append(
        pa.RecordBatch.from_arrays(
            [
                _const_str_array(fld, n_term_rows),
                null_t,
                dictionary.take(pa.array(present, type=pa.int64())),
                null_t,
                pa.array(df_p[present].astype(np.int64), type=pa.int64()),
                pa.array(cf_p[present], type=pa.int64()),
                pa.array(max_tf_p.astype(np.int64), type=pa.int64()),
                sc_arr,
            ],
            names=[f.name for f in STATS_SCHEMA.fields],
        )
    )
    return out


def _stats_rows_python(doc_ids, texts, scores, fld):
    """Per-row fallback (non-ASCII rows): emit per-doc dl rows and
    per-(doc, term) UN-aggregated term partials (df=1, cf=tf,
    max_tf=tf) — valid partials for the same downstream aggregation."""
    import pyarrow as pa

    from typesense_spark.tokenizer import tokenize

    doc_rows: list[tuple] = []
    term_rows: list[tuple] = []
    for i, (doc_id, content) in enumerate(zip(doc_ids, texts)):
        toks = tokenize(content or "")
        if not toks:
            continue
        doc_rows.append((int(doc_id), len(toks)))
        per: dict[str, int] = {}
        for t, _p in toks:
            per[t] = per.get(t, 0) + 1
        sc = int(scores[i]) if scores is not None else None
        for t, tf in per.items():
            term_rows.append((t, tf, sc))
    if not doc_rows:
        return []
    out = []
    out.append(
        pa.RecordBatch.from_arrays(
            [
                pa.array([fld] * len(doc_rows), type=pa.string()),
                pa.array([r[0] for r in doc_rows], type=pa.int64()),
                pa.nulls(len(doc_rows), pa.string()),
                pa.array([r[1] for r in doc_rows], type=pa.int64()),
                pa.nulls(len(doc_rows), pa.int64()),
                pa.nulls(len(doc_rows), pa.int64()),
                pa.nulls(len(doc_rows), pa.int64()),
                pa.nulls(len(doc_rows), pa.int64()),
            ],
            names=[f.name for f in STATS_SCHEMA.fields],
        )
    )
    out.append(
        pa.RecordBatch.from_arrays(
            [
                pa.array([fld] * len(term_rows), type=pa.string()),
                pa.nulls(len(term_rows), pa.int64()),
                pa.array([r[0] for r in term_rows], type=pa.string()),
                pa.nulls(len(term_rows), pa.int64()),
                pa.array([1] * len(term_rows), type=pa.int64()),
                pa.array([r[1] for r in term_rows], type=pa.int64()),
                pa.array([r[1] for r in term_rows], type=pa.int64()),
                pa.array([r[2] for r in term_rows], type=pa.int64()),
            ],
            names=[f.name for f in STATS_SCHEMA.fields],
        )
    )
    return out


def stats_mapper_arrow(fld: str, has_score: bool):
    """mapInArrow partial-stats mapper over (doc_id, fld[, score])
    batches — the r6 stats/dictionary pass (see STATS_SCHEMA note)."""
    import pyarrow as pa

    def gen(batches):
        for batch in batches:
            if not batch.num_rows:
                continue
            arr = batch.column(1)
            doc_ids_np = batch.column(0).to_numpy(zero_copy_only=False)
            scores_np = (
                batch.column(2).to_numpy(zero_copy_only=False).astype(np.int64)
                if has_score
                else None
            )
            if arr.null_count:
                import pyarrow.compute as pc

                arr = pc.fill_null(arr, "")
            if not pa.types.is_string(arr.type):
                yield from _stats_rows_python(
                    doc_ids_np, arr.to_pylist(), scores_np, fld
                )
                continue
            offsets, values = _binary_buffers(arr)
            offsets = offsets.astype(np.int64)
            if not (values >= 0x80).any():
                row_hi = None
            else:
                hi = np.zeros(values.size + 1, dtype=np.int64)
                np.cumsum(values >= 0x80, out=hi[1:])
                row_hi = (hi[offsets[1:]] - hi[offsets[:-1]]) > 0
            if row_hi is not None and row_hi.any():
                idx = np.flatnonzero(row_hi)
                texts = [arr[int(i)].as_py() for i in idx]
                yield from _stats_rows_python(
                    doc_ids_np[idx],
                    texts,
                    scores_np[idx] if scores_np is not None else None,
                    fld,
                )
                ascii_idx = np.flatnonzero(~row_hi)
                if ascii_idx.size == 0:
                    continue
                sub = arr.take(pa.array(ascii_idx, type=pa.int64()))
                offsets, values = _binary_buffers(sub)
                offsets = offsets.astype(np.int64)
                doc_ids_np = doc_ids_np[ascii_idx]
                if scores_np is not None:
                    scores_np = scores_np[ascii_idx]
            yield from _stats_batch_ascii(
                doc_ids_np, offsets, values, scores_np, fld
            )

    return gen


def stats_rows(docs: DataFrame, fld: str, score_col: str | None) -> DataFrame:
    """``docs[fld]`` → STATS_SCHEMA partial rows (scalar string fields:
    vectorized mapper; array fields: TF rows aggregated JVM-side into
    the same shape)."""
    if dict(docs.dtypes).get(fld, "").startswith("array"):
        tfa = tokenize_tf(docs, fld, False)
        if score_col is not None:
            tfa = tfa.join(
                docs.select("doc_id", F.col(score_col).cast("long").alias("_sc")),
                "doc_id",
            )
        doc_rows = (
            tfa.groupBy("field", "doc_id")
            .agg(F.max("dl").alias("dl"))
            .select(
                "field",
                "doc_id",
                F.lit(None).cast("string").alias("term"),
                "dl",
                F.lit(None).cast("long").alias("df"),
                F.lit(None).cast("long").alias("cf"),
                F.lit(None).cast("long").alias("max_tf"),
                F.lit(None).cast("long").alias("max_score"),
            )
        )
        aggs = [
            F.count("*").alias("df"),
            F.sum("tf").alias("cf"),
            F.max("tf").alias("max_tf"),
        ]
        if score_col is not None:
            aggs.append(F.max("_sc").alias("max_score"))
        term_rows = (
            tfa.groupBy("field", "term")
            .agg(*aggs)
            .select(
                "field",
                F.lit(None).cast("long").alias("doc_id"),
                "term",
                F.lit(None).cast("long").alias("dl"),
                "df",
                "cf",
                "max_tf",
                F.col("max_score")
                if score_col is not None
                else F.lit(None).cast("long").alias("max_score"),
            )
        )
        return doc_rows.unionByName(term_rows)
    cols = ["doc_id", fld]
    if score_col is not None:
        cols.append(score_col)
    src = docs.select(*[F.col(c) for c in cols[:2]], *(
        [F.col(score_col).cast("long")] if score_col is not None else []
    ))
    return src.mapInArrow(
        stats_mapper_arrow(fld, score_col is not None), schema=STATS_SCHEMA
    )


def _tokenize_rows_python(doc_ids, texts, store_positions, fld):
    """Per-row fallback (non-ASCII rows): the pinned-spec Python path,
    identical to the original ``tokenize_mapper`` body."""
    import pyarrow as pa

    from typesense_spark.tokenizer import tokenize

    doc_out: list[int] = []
    terms: list[str] = []
    tfs: list[int] = []
    dls: list[int] = []
    flat_vals: list[int] = []
    counts: list[int] = []
    for doc_id, content in zip(doc_ids, texts):
        toks = tokenize(content or "")
        dl = len(toks)
        if dl == 0:
            continue
        per: dict[str, list[int]] = {}
        for t, p in toks:
            per.setdefault(t, []).append(p)
        for t, ps in per.items():
            doc_out.append(int(doc_id))
            terms.append(t)
            tfs.append(len(ps))
            dls.append(dl)
            if store_positions:
                counts.append(len(ps) + 1)
                flat_vals.append(len(ps))
                flat_vals.append(ps[0])
                for a, b in zip(ps, ps[1:]):
                    flat_vals.append(b - a)
    if not terms:
        return None
    if store_positions:
        pos_bins = codec.varint_encode_split(
            np.asarray(flat_vals, dtype=np.uint64),
            np.asarray(counts, dtype=np.int64),
        )
    else:
        pos_bins = [b""] * len(terms)
    return pa.RecordBatch.from_arrays(
        [
            pa.array([fld] * len(terms), type=pa.string()),
            pa.array(doc_out, type=pa.int64()),
            pa.array(terms, type=pa.string()),
            pa.array(tfs, type=pa.int64()),
            pa.array(dls, type=pa.int64()),
            pa.array(pos_bins, type=pa.binary()),
        ],
        names=[f.name for f in TF_SCHEMA.fields],
    )


def tokenize_mapper_arrow(fld: str, store_positions: bool):
    """mapInArrow tokenize + per-doc grouping + position packing.

    The r6 rework of :func:`tokenize_mapper` (guide §4.2): ASCII rows —
    the overwhelmingly common case — run the fully vectorized
    :func:`_tokenize_batch_ascii` (byte LUT + Arrow buffer slicing +
    dictionary-encode grouping); rows containing any non-ASCII byte
    fall back per row to the pinned Python tokenizer, preserving the
    full unicode-fold spec. Output rows are identical to the old
    mapper's up to ordering (downstream is aggregation/shuffle —
    order-free).
    """
    import pyarrow as pa

    def gen(batches):
        for batch in batches:
            if not batch.num_rows:
                continue
            arr = batch.column(1)
            doc_ids_np = batch.column(0).to_numpy(zero_copy_only=False)
            if arr.null_count:
                import pyarrow.compute as pc

                arr = pc.fill_null(arr, "")
            if not pa.types.is_string(arr.type):
                out = _tokenize_rows_python(
                    doc_ids_np, arr.to_pylist(), store_positions, fld
                )
                if out is not None:
                    yield out
                continue
            offsets, values = _binary_buffers(arr)
            offsets = offsets.astype(np.int64)
            # rows with any byte >= 0x80 take the unicode fallback; the
            # per-row localisation only runs when the whole batch has
            # at least one such byte (one cheap reduction otherwise)
            if not (values >= 0x80).any():
                row_hi = None
            else:
                hi = np.zeros(values.size + 1, dtype=np.int64)
                np.cumsum(values >= 0x80, out=hi[1:])
                row_hi = (hi[offsets[1:]] - hi[offsets[:-1]]) > 0
            if row_hi is not None and row_hi.any():
                idx = np.flatnonzero(row_hi)
                texts = [arr[int(i)].as_py() for i in idx]
                out = _tokenize_rows_python(
                    doc_ids_np[idx], texts, store_positions, fld
                )
                if out is not None:
                    yield out
                ascii_idx = np.flatnonzero(~row_hi)
                if ascii_idx.size == 0:
                    continue
                sub = arr.take(pa.array(ascii_idx, type=pa.int64()))
                offsets, values = _binary_buffers(sub)
                offsets = offsets.astype(np.int64)
                doc_ids_np = doc_ids_np[ascii_idx]
            out = _tokenize_batch_ascii(
                doc_ids_np, offsets, values, store_positions, fld
            )
            if out is not None:
                yield out

    return gen


def tokenize_tf(docs: DataFrame, fld: str, store_positions: bool) -> DataFrame:
    """``docs[fld]`` → TF rows via the vectorized Arrow tokenizer
    (scalar string fields) or the array mapper — the one entry point
    every tokenize consumer (build, streaming append, maintain,
    checkpoint groups) shares, so they all ride the r6 fast path."""
    if dict(docs.dtypes).get(fld, "").startswith("array"):
        return docs.select("doc_id", fld).mapInPandas(
            tokenize_mapper_array(fld, store_positions), schema=TF_SCHEMA
        )
    return docs.select("doc_id", fld).mapInArrow(
        tokenize_mapper_arrow(fld, store_positions), schema=TF_SCHEMA
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

    def _bin_arr(flat_vals: np.ndarray) -> "pa.Array":
        # one encode for the whole batch, sliced per block through an
        # Arrow offsets buffer — no per-block Python bytes objects (r6)
        buf, boffs = codec.varint_encode_offsets(flat_vals, sizes)
        return pa.Array.from_buffers(
            pa.binary(),
            starts.size,
            [None, pa.py_buffer(boffs.astype(np.int32)), pa.py_buffer(buf)],
        )

    ids_arr = _bin_arr(deltas)
    tfs_arr = _bin_arr(tfs.astype(np.uint64))
    con_arr = _bin_arr(contribs.astype(np.uint64))
    if store_positions:
        offs, vals = _binary_buffers(batch.column("pos_bin"))
        # blocks are contiguous runs of rows, so the block offsets into
        # the (shared) position value buffer are themselves an Arrow
        # offsets array — zero copies, zero Python slices
        blk_off = offs[np.append(starts, n)].astype(np.int64)
        base = int(blk_off[0])
        pos_arr = pa.Array.from_buffers(
            pa.binary(),
            starts.size,
            [
                None,
                pa.py_buffer((blk_off - base).astype(np.int32)),
                pa.py_buffer(vals[base : int(blk_off[-1])]),
            ],
        )
    else:
        pos_arr = pa.Array.from_buffers(
            pa.binary(),
            starts.size,
            [None, pa.py_buffer(np.zeros(starts.size + 1, dtype=np.int32)), pa.py_buffer(b"")],
        )

    fld_b = fld.encode()
    field_arr = pa.Array.from_buffers(
        pa.utf8(),
        starts.size,
        [
            None,
            pa.py_buffer((np.arange(starts.size + 1, dtype=np.int64) * len(fld_b)).astype(np.int32)),
            pa.py_buffer(fld_b * starts.size),
        ],
    )
    starts_pa = pa.array(starts, type=pa.int64())
    return pa.RecordBatch.from_arrays(
        [
            field_arr,
            batch.column("term").take(starts_pa),
            pa.array(salts[starts].astype(np.int32), type=pa.int32()),
            pa.array((pos_in_grp[starts] // block_size).astype(np.int32), type=pa.int32()),
            pa.array(sizes.astype(np.int32), type=pa.int32()),
            pa.array(doc_ids[starts], type=pa.int64()),
            pa.array(doc_ids[ends - 1], type=pa.int64()),
            pa.array(np.maximum.reduceat(tfs, starts), type=pa.int64()),
            pa.array(np.maximum.reduceat(contribs, starts), type=pa.int64()),
            ids_arr,
            tfs_arr,
            con_arr,
            pos_arr,
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
            # partition count = spark.sql.shuffle.partitions (session
            # conf — scale it with the cluster). Measured r6: letting
            # AQE coalesce this exchange instead (keyed repartition
            # without a count) made the 2-core pack ~13% SLOWER — the
            # coalesced partitions push the per-task sort out of cache
            # — so the explicit conf-driven count stays.
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

    def decoded(
        self, terms: list[str], fields: list[str], spread: bool = False
    ) -> DataFrame:
        """``spread=True`` (batch paths): round-robin the pruned packed
        blocks across the cluster before decoding, so decode width does
        not inherit the postings cache's partition count — a compacted
        cache (or a single hot bucket) would otherwise serialize a
        whole batch's decode onto a few tasks. The exchange moves only
        the term-pruned compressed blocks. Single-query decodes keep
        the narrow no-exchange plan."""
        cand = self.candidate_postings(terms, fields)
        if spread:
            p = self.spark.sparkContext.defaultParallelism
            if cand.rdd.getNumPartitions() < p:
                cand = cand.repartition(p)
        return decode_postings(cand)

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
        parts = [tokenize_tf(docs, fld, with_positions) for fld in fields]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    # Two tokenize passes instead of caching the (huge) tf relation:
    # the map-side tokenizer is cheap and embarrassingly parallel,
    # while caching tens of millions of tf rows thrashed the heap and
    # made the build ANTI-scale with cores. Recompute > cache here.
    # r6: the dictionary/stats pass no longer ships tf rows at all —
    # the mapper pre-aggregates per batch (STATS_SCHEMA partials:
    # per-doc dl rows + per-term df/cf/max_tf[/max_score] partials),
    # cutting the Python→JVM transfer and aggregation input ~50x
    # (guide §2.3 "aggregate before you shuffle"; measured 26s → 4s of
    # the 2-core 100k-doc build).
    srows = stats_rows(docs, fields[0], score_col)
    for fld in fields[1:]:
        srows = srows.unionByName(stats_rows(docs, fld, score_col))
    if persist or persist_light:
        # small relation (one row per doc + per-batch term partials),
        # shared by the doc_attrs / terms / stats-probe consumers
        srows = srows.persist()
    tf_all = _tf(store_positions)  # pack pass
    if bucket_group is not None:
        # checkpoint-group slice, applied MAP-SIDE before the pack
        # shuffle so total shuffle volume across groups stays 1x
        n_groups, g = bucket_group
        tf_all = tf_all.where(
            F.pmod(term_bucket_expr(F.col("term"), num_buckets), F.lit(n_groups)) == g
        )

    # per-doc dl rows pass through; the term dictionary is one narrow
    # agg over the mapper's partials (map-side combine on top)
    doc_attrs = srows.where(F.col("term").isNull()).select("field", "doc_id", "dl")
    term_part = srows.where(F.col("doc_id").isNull())
    aggs = [
        F.sum("df").alias("df"),
        F.sum("cf").alias("cf"),
        F.max("max_tf").alias("max_tf"),
    ]
    if score_col is not None:
        # MAX_SCORE token ordering support (reference ART leaf
        # max_score, include/art.h:49-55): the mapper already folded the
        # per-doc score into per-term partial maxima
        aggs.append(F.max("max_score").alias("max_score"))
    terms = term_part.groupBy("field", "term").agg(*aggs)
    if persist or persist_light:
        doc_attrs = doc_attrs.persist()
        terms = terms.persist()

    # corpus stats (exact longs → avgdl division pinned in Python,
    # mirrored exactly by the DuckDB oracle). When the dictionary
    # relations are cached, the SAME job also materializes the terms
    # cache (union probe): both aggregates share the one in-flight
    # srows computation instead of the pack job re-traversing the
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
    ix._tf_light = srows  # handle for callers that unpersist mid-job
    return ix
