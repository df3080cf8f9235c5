"""Batched multi-query search — N queries in ONE Spark job.

The reference's throughput story is concurrent single queries against
an in-memory trie (250 qps on 3 nodes, README.md:172). Spark's per-job
latency floor makes one-query-at-a-time the wrong shape; the idiomatic
equivalent is set-oriented: expand EVERY query's candidates into one
broadcast map, decode the union of candidate postings ONCE, score all
(query, doc) pairs in one aggregation, and take per-query top-k with a
window. Throughput then scales with cluster size instead of being
bounded by job-scheduling latency (measured in bench.py as
``batch_qps``).

Semantics per query are identical to ``engine.search`` (same expansion
spec, same max-per-token scoring, same AND/OR and tie-break rules) —
asserted against it in tests, and against the DuckDB oracle in the
gate (``batch_queries``). Scope (documented): drop-tokens fallback,
synonym windows, override rules, typo deepening, and per-field weights
are per-query control-flow features — run those requests through
``engine.search``; batch mode is the raw-throughput surface (callers
re-run the few queries that need the richer pipeline individually).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from typesense_spark.index.build import Index
from typesense_spark.search.engine import (
    _get_term_df,
    _terms_agg,
    _use_spark_expand,
    parse_query,
)
from typesense_spark.search.expand import expand_tokens_batch


def batch_search(
    index: Index,
    queries: list[tuple[str, str]],
    fields: tuple[str, ...] = ("content",),
    num_typos: int = 0,
    prefix_last: bool = True,  # reference default (src/core_api.cpp:299)
    mode: str = "and",
    k: int = 10,
    typo_distance: str = "levenshtein",
) -> DataFrame:
    """[(qid, q)] → (qid, rank, doc_id, score_milli), rank ≤ k per qid.

    Expansion is batch-level (r2 VERDICT #7): every unique (token,
    prefix?) across ALL queries expands in ONE Spark plan
    (:func:`expand_tokens_batch`) — or, for the exact-match case
    (num_typos=0, no prefix), one membership probe — so an N-query
    batch costs O(1) driver round-trips, not O(N)."""
    token_lists = [(qid, parse_query(q)[0]) for qid, q in queries]
    specs = sorted(
        {
            (tok, prefix_last and i == len(toks) - 1)
            for _qid, toks in token_lists
            for i, tok in enumerate(toks)
        }
    )
    if num_typos == 0 and not prefix_last:
        # exact tokens: only dictionary MEMBERSHIP matters (an absent
        # token voids its AND queries). Small dict → driver lookups;
        # large dict → one semi-join probe over the distributed terms.
        if _use_spark_expand(index, fields):
            uniq = index.spark.createDataFrame(
                [(t,) for t, _ in specs], schema="term string"
            )
            present = {
                r["term"]
                for r in _terms_agg(index, fields)
                .join(F.broadcast(uniq), "term", "left_semi")
                .select("term")
                .collect()
            }
        else:
            term_df = _get_term_df(index, fields)
            present = {t for t, _ in specs if t in term_df}
        cand_map = {
            spec: ([(spec[0], 0)] if spec[0] in present else []) for spec in specs
        }
    elif not _use_spark_expand(index, fields):
        # small dictionary: the collected {term: df} dict expands every
        # unique spec driver-side in microseconds — the Spark-join batch
        # plan below exists for dictionaries too large to collect
        # (same auto-routing threshold as engine.search)
        from typesense_spark.search.expand import expand_token

        term_df = _get_term_df(index, fields)
        cand_map = {
            (tok, pref): expand_token(
                tok, term_df, num_typos, prefix=pref, distance=typo_distance
            )
            for tok, pref in specs
        }
    else:
        cand_map = expand_tokens_batch(
            _terms_agg(index, fields), specs, num_typos, typo_distance
        )
    rows: list[tuple[str, int, str, int]] = []
    for qid, tokens in token_lists:
        cands = [
            cand_map[(tok, prefix_last and i == len(tokens) - 1)]
            for i, tok in enumerate(tokens)
        ]
        if mode == "and" and any(not c for c in cands):
            continue  # unsatisfiable AND query → no rows
        for i, cand in enumerate(cands):
            for t, _c in cand:
                rows.append((qid, i, t, len(tokens)))
    spark = index.spark
    if not rows:
        return spark.createDataFrame(
            [], schema="qid string, rank long, doc_id long, score_milli long"
        )
    cmap = spark.createDataFrame(
        rows, schema="qid string, qidx int, term string, n_tokens int"
    )
    decoded = index.decoded(sorted({r[2] for r in rows}), list(fields))
    per_tok = (
        decoded.join(F.broadcast(cmap), "term")
        .groupBy("qid", "n_tokens", "doc_id", "qidx")
        .agg(F.max("contrib").alias("tok_score"))
    )
    scored = per_tok.groupBy("qid", "n_tokens", "doc_id").agg(
        F.sum("tok_score").alias("score_milli"), F.count("*").alias("nmatch")
    )
    if mode == "and":
        scored = scored.where(F.col("nmatch") == F.col("n_tokens"))
    w = Window.partitionBy("qid").orderBy(
        F.col("score_milli").desc(), F.col("doc_id").desc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("qid", "rank", "doc_id", "score_milli")
    )
