"""Round-6 optimization harness — NOT the driver bench (bench.py is
frozen for measurement). Tools:

  python bench_extra.py queries   — time each headline gate query
                                    (best-of-2, same methodology as
                                    bench.headline_queries) and print a
                                    JSON line; optionally a subset via
                                    argv[2] = comma-separated names.
  python bench_extra.py plans DIR — write .explain("formatted") for
                                    every headline query to DIR/<name>.txt
  python bench_extra.py batch     — time the three batch throughput
                                    shapes (typo-free / typo2 / full)
                                    exactly as bench.py builds them.
  python bench_extra.py probe     — micro-profile: empty-job floor,
                                    decode pass, exact_term phase split.
  python bench_extra.py build N C — one build trial (N docs, C cores)
                                    in-process with stage walls.

Uses $SPARK_GRAFT_SF_DIR / $SPARK_GRAFT_CPUS like bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


def _session(cores: int):
    from typesense_spark import get_spark

    return get_spark(
        "bench-extra", master=f"local[{cores}]", shuffle_partitions=2 * cores
    )


def run_queries(sf_dir: str, cores: int, subset=None) -> None:
    from typesense_spark import gate

    import bench

    spark = _session(cores)
    ix = gate.get_index(spark, sf_dir)  # setup, untimed (matches bench.py)
    names = subset or (
        bench.HEADLINE
        + ["dedup_minhash_hashids", "simhash_pairs_pigeonhole"]
    )
    timings = {}
    total = 0.0
    for name in names:
        if name in ("dedup_minhash_hashids", "simhash_pairs_pigeonhole"):
            timings.update(
                {
                    k: v
                    for k, v in bench._scale_path_queries(spark, sf_dir).items()
                    if k == name
                }
            )
            total += timings[name]
            continue
        best = None
        for _ in range(2):
            t0 = time.time()
            gate.QUERIES[name](spark, sf_dir).collect()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        total += best
    print(json.dumps({"total": round(total, 3), "queries": timings}))
    spark.stop()


def run_plans(sf_dir: str, cores: int, out_dir: str, subset=None) -> None:
    from typesense_spark import gate

    import bench

    os.makedirs(out_dir, exist_ok=True)
    spark = _session(cores)
    gate.get_index(spark, sf_dir)
    names = subset or bench.HEADLINE
    for name in names:
        df = gate.QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(out_dir, f"{name}.txt"), "w") as f:
            f.write(plan)
        print(name, "->", out_dir)
    spark.stop()


def run_batch(sf_dir: str, cores: int) -> None:
    from typesense_spark import gate
    from typesense_spark.search.batch import batch_search
    from typesense_spark.search.engine import _get_term_df
    from typesense_spark.search.synonyms import SynonymRule, SynonymStore

    spark = _session(cores)
    ix = gate.get_index(spark, sf_dir)
    vocab = sorted(_get_term_df(ix, ("text",)))
    out = {}

    qs = []
    for i in range(4000):
        n = 1 + (i * 2654435761) % 3
        toks = [vocab[(i * 40503 + j * 69069) % len(vocab)] for j in range(n)]
        qs.append((f"b{i}", " ".join(toks)))
    best = None
    for _ in range(2):
        t0 = time.time()
        batch_search(ix, qs, fields=("text",), num_typos=0, k=10).count()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    out["batch_qps"] = round(len(qs) / best, 1)

    tqs = []
    for i in range(1000):
        base = vocab[(i * 2654435761) % len(vocab)]
        mutated = (base[:-1] + "x") if len(base) > 3 else base
        tqs.append((f"t{i}", mutated))
    best = None
    for _ in range(2):
        t0 = time.time()
        batch_search(ix, tqs, fields=("text",), num_typos=2, k=10, mode="or").count()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    out["batch_qps_typo2"] = round(len(tqs) / best, 1)

    store = SynonymStore([SynonymRule("r0", (vocab[0], vocab[1]), ((vocab[2],),))])
    fqs = []
    for i in range(1000):
        n = 1 + (i * 2654435761) % 3
        toks = [vocab[(i * 48271 + j * 16807) % len(vocab)] for j in range(n)]
        fqs.append((f"f{i}", " ".join(toks)))
    best = None
    for _ in range(2):
        t0 = time.time()
        batch_search(
            ix, fqs, fields=("text",), num_typos=1, k=10,
            drop_tokens_threshold=10, synonym_store=store,
            typo_tokens_threshold=10,
        ).count()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    out["batch_qps_full"] = round(len(fqs) / best, 1)
    print(json.dumps(out))
    spark.stop()


def run_probe(sf_dir: str, cores: int) -> None:
    from pyspark.sql import functions as F

    from typesense_spark import gate
    from typesense_spark.search.engine import _get_term_df

    spark = _session(cores)
    ix = gate.get_index(spark, sf_dir)
    out = {}

    # empty-job floor: the cheapest possible action, twice
    for tag in ("cold", "warm"):
        t0 = time.time()
        spark.range(1).collect()
        out[f"empty_job_{tag}"] = round(time.time() - t0, 3)

    # a no-shuffle scan over the persisted postings
    t0 = time.time()
    ix.postings.where(F.col("term") == "table").count()
    out["postings_scan"] = round(time.time() - t0, 3)

    # decode pass only (mapInArrow boundary) for one term
    t0 = time.time()
    ix.decoded(["table"], ["text"]).count()
    out["decode_one_term"] = round(time.time() - t0, 3)
    t0 = time.time()
    ix.decoded(["table"], ["text"]).count()
    out["decode_one_term2"] = round(time.time() - t0, 3)

    # expansion cost (driver dict, cached after first)
    t0 = time.time()
    _get_term_df(ix, ("text",))
    out["term_df_first"] = round(time.time() - t0, 3)
    out["n_terms"] = len(_get_term_df(ix, ("text",)))

    # full exact_term query end-to-end, 3 runs
    for i in range(3):
        t0 = time.time()
        gate.QUERIES["exact_term"](spark, sf_dir).collect()
        out[f"exact_term_{i}"] = round(time.time() - t0, 3)
    # multi_and, 3 runs
    for i in range(3):
        t0 = time.time()
        gate.QUERIES["multi_and"](spark, sf_dir).collect()
        out[f"multi_and_{i}"] = round(time.time() - t0, 3)
    print(json.dumps(out))
    spark.stop()


def run_build(n_docs: int, cores: int) -> None:
    from typesense_spark.corpus import corpus_df
    from typesense_spark.index import build_index

    import bench

    spark = bench._build_session(f"local[{cores}]")
    warm = corpus_df(spark, 500, partitions=16).persist()
    warm.count()
    build_index(spark, warm, **{**bench.BUILD_KW, "num_buckets": 4})
    warm.unpersist()
    src = corpus_df(spark, n_docs, partitions=bench.PARTITIONS).persist()
    n_src = src.count()
    t0 = time.time()
    ix = build_index(spark, src, **bench.BUILD_KW)
    elapsed = time.time() - t0
    print(
        json.dumps(
            {
                "docs": n_src,
                "postings": ix.report.n_postings,
                "elapsed_sec": round(elapsed, 3),
                "docs_per_sec": round(n_src / elapsed, 1),
                "stages": ix.report.stages,
            }
        )
    )
    spark.stop()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    cmd = sys.argv[1] if len(sys.argv) > 1 else "queries"
    if cmd == "queries":
        subset = sys.argv[2].split(",") if len(sys.argv) > 2 else None
        run_queries(sf_dir, cores, subset)
    elif cmd == "plans":
        out_dir = sys.argv[2] if len(sys.argv) > 2 else "plans/r06/_scratch"
        subset = sys.argv[3].split(",") if len(sys.argv) > 3 else None
        run_plans(sf_dir, cores, out_dir, subset)
    elif cmd == "batch":
        run_batch(sf_dir, cores)
    elif cmd == "probe":
        run_probe(sf_dir, cores)
    elif cmd == "build":
        run_build(int(sys.argv[2]), int(sys.argv[3]))
    else:
        raise SystemExit(f"unknown command {cmd}")


if __name__ == "__main__":
    main()
