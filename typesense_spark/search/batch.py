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
from typesense_spark.search.expand import expand_query, expand_query_spark


def batch_search(
    index: Index,
    queries: list[tuple[str, str]],
    fields: tuple[str, ...] = ("content",),
    num_typos: int = 0,
    prefix_last: bool = False,
    mode: str = "and",
    k: int = 10,
) -> DataFrame:
    """[(qid, q)] → (qid, rank, doc_id, score_milli), rank ≤ k per qid."""
    # same expansion routing as engine.search: above the dictionary
    # threshold, candidates come from a Spark join (bounded collect),
    # never a full-dictionary collect
    spark_expand = _use_spark_expand(index, fields)
    term_df = None if spark_expand else _get_term_df(index, fields)
    rows: list[tuple[str, int, str, int]] = []
    for qid, q in queries:
        tokens, _ = parse_query(q)
        if spark_expand:
            cand = expand_query_spark(
                _terms_agg(index, fields), tokens, num_typos, prefix_last
            )
        else:
            cand = expand_query(tokens, term_df, num_typos, prefix_last)
        if mode == "and" and any(not cand[t] for t in tokens):
            continue  # unsatisfiable AND query → no rows
        for i, tok in enumerate(tokens):
            for t, _c in cand[tok]:
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
