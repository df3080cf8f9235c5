"""Benchmark harness — prints ONE JSON line.

Two phases:

1. **Scaling evidence** (north rule, sandbox substitute for N vs 4N
   executors): the identical index-build job over a deterministic
   synthetic source-code corpus at ``local[8]`` and ``local[32]``;
   reports docs/sec + postings/sec at both and the throughput scaling
   efficiency ``(R_32c / R_8c) / 4`` (target ≥ 0.8).

2. **Headline queries** at ``$SPARK_GRAFT_SF_DIR`` (default sf0.1) on
   ``local[$SPARK_GRAFT_CPUS]``: the gate's representative operators
   (BM25 exact/AND/typo/facets/WAND, dedup, ANN, text stats), each
   timed end-to-end (plan → collect).

Output: {"metric", "value" (headline total sec), "unit": "sec",
"queries": {name: sec}, "sf", "build": {...}, "scaling": {...}}.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

BENCH_CORPUS_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "30000"))

BUILD_KW = dict(
    fields=["content"],
    key_cols=["repo", "path", "commit"],
    num_buckets=32,
    block_size=128,
    salt_threshold=2000,
    n_salts=8,
)

HEADLINE = [
    "exact_term",
    "multi_and",
    "multi_or",
    "typo",
    "prefix",
    "filter",
    "facet_counts",
    "grouped",
    "wand_or",
    "dedup_minhash",
    "dedup_jaccard",
    "ann_topk",
    "quality",
    "fingerprint",
    "events_window",
]


def _session(master: str, shuffle: int):
    from typesense_spark import get_spark

    return get_spark(app_name=f"bench-{master}", master=master, shuffle_partitions=shuffle)


def build_run(master: str, cores: int) -> dict:
    """One full index build of the synthetic corpus; returns metrics."""
    from typesense_spark.corpus import corpus_df
    from typesense_spark.index import build_index
    from typesense_spark.index.build import decode_postings  # noqa: F401

    spark = _session(master, shuffle=2 * cores)
    try:
        # JVM/JIT warmup so the first timed run isn't penalized
        warm = corpus_df(spark, 500, partitions=cores).persist()
        warm.count()
        build_index(spark, warm, **{**BUILD_KW, "num_buckets": 4})
        warm.unpersist()

        src = corpus_df(spark, BENCH_CORPUS_DOCS, partitions=2 * cores)
        # materialize the source once so generation cost is excluded
        src = src.persist()
        n_src = src.count()
        t0 = time.time()
        ix = build_index(spark, src, **BUILD_KW)
        elapsed = time.time() - t0
        rep = ix.report
        return {
            "master": master,
            "docs": n_src,
            "postings": rep.n_postings,
            "terms": rep.n_terms,
            "elapsed_sec": round(elapsed, 3),
            "docs_per_sec": round(n_src / elapsed, 1),
            "postings_per_sec": round(rep.n_postings / elapsed, 1),
        }
    finally:
        spark.stop()


def headline_queries(sf_dir: str, cores: int) -> tuple[dict, float]:
    from typesense_spark import gate

    spark = _session(f"local[{cores}]", shuffle=2 * cores)
    timings: dict[str, float] = {}
    try:
        # index build over the sf documents table is part of setup, not
        # per-query latency (it is timed separately above)
        gate.get_index(spark, sf_dir)
        total = 0.0
        for name in HEADLINE:
            fn = gate.QUERIES[name]
            t0 = time.time()
            fn(spark, sf_dir).collect()
            dt = time.time() - t0
            timings[name] = round(dt, 3)
            total += dt
        return timings, total
    finally:
        spark.stop()


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").split("sf")[-1]

    r8 = build_run("local[8]", 8)
    r32 = build_run(f"local[{cpus}]", cpus)
    efficiency = round((r32["docs_per_sec"] / r8["docs_per_sec"]) / (cpus / 8), 3)

    queries, total = headline_queries(sf_dir, cpus)

    out = {
        "metric": "headline_query_suite_sec",
        "value": round(total, 3),
        "unit": "sec",
        "queries": queries,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "build": {"local8": r8, f"local{cpus}": r32},
        "scaling": {
            "docs_per_sec_8c": r8["docs_per_sec"],
            f"docs_per_sec_{cpus}c": r32["docs_per_sec"],
            "efficiency_8_to_32": efficiency,
            "corpus_docs": BENCH_CORPUS_DOCS,
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
