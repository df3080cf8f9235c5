"""spark-submit entry point: replay a query log against a built index
through the set-oriented batch engine — N queries in ONE Spark job.

Usage:
  spark-submit --py-files typesense_spark.zip jobs/batch_search_job.py \
      --index /path/to/index --queries queries.jsonl \
      [--fields content] [--num-typos 1] [--no-prefix] [--mode and|or] \
      [--k 10] [--drop-tokens-threshold 10] \
      [--synonyms-json rules.json] [--out /path/out.parquet]

``queries.jsonl``: one JSON object per line —
  {"qid": "q1", "q": "parse json -legacy", "filter_by": "lang := en"}
(``filter_by`` optional per query; '-tok' exclusions parsed from q).

Without --out, prints one JSON line {"queries": N, "hits": M,
"wall_sec": s, "qps": q}; with --out, also writes the full
(qid, rank, doc_id, score_milli) relation as parquet.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--queries", required=True, help="JSONL query log")
    ap.add_argument("--fields", default="content")
    ap.add_argument("--num-typos", type=int, default=1)
    ap.add_argument("--no-prefix", action="store_true")
    ap.add_argument("--mode", default="and", choices=["and", "or"])
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--drop-tokens-threshold", type=int, default=10)
    ap.add_argument("--typo-distance", default="levenshtein",
                    choices=["levenshtein", "osa"])
    ap.add_argument("--weights", default="",
                    help="comma ints parallel to --fields (query_by_weights)")
    ap.add_argument("--synonyms-json", default=None,
                    help='JSON list of {"id","root":[..],"synonyms":[[..],..]}')
    ap.add_argument("--out", default=None, help="parquet output path")
    args = ap.parse_args()

    from typesense_spark import get_spark
    from typesense_spark.index.build import Index
    from typesense_spark.search.batch import batch_search

    queries: list[tuple[str, str]] = []
    filters: dict[str, str] = {}
    with open(args.queries) as f:
        for line in f:
            if not line.strip():
                continue
            row = json.loads(line)
            queries.append((str(row["qid"]), row["q"]))
            if row.get("filter_by"):
                filters[str(row["qid"])] = row["filter_by"]

    store = None
    if args.synonyms_json:
        from typesense_spark.search.synonyms import SynonymRule, SynonymStore

        with open(args.synonyms_json) as f:
            rules = json.load(f)
        store = SynonymStore(
            [
                SynonymRule(
                    r["id"],
                    tuple(r.get("root", ())),
                    tuple(tuple(s) for s in r.get("synonyms", ())),
                )
                for r in rules
            ]
        )

    spark = get_spark("batch-search-job")
    ix = Index.load(spark, args.index)
    t0 = time.time()
    out = batch_search(
        ix,
        queries,
        fields=tuple(args.fields.split(",")),
        num_typos=args.num_typos,
        prefix_last=not args.no_prefix,
        mode=args.mode,
        k=args.k,
        typo_distance=args.typo_distance,
        query_by_weights=tuple(
            int(w) for w in args.weights.split(",") if w.strip()
        ),
        synonym_store=store,
        drop_tokens_threshold=args.drop_tokens_threshold or None,
        filters=filters or None,
    )
    if args.out:
        out.write.mode("overwrite").parquet(args.out)
        n_hits = spark.read.parquet(args.out).count()
    else:
        n_hits = out.count()
    wall = time.time() - t0
    print(
        json.dumps(
            {
                "queries": len(queries),
                "hits": n_hits,
                "wall_sec": round(wall, 3),
                "qps": round(len(queries) / max(wall, 1e-9), 1),
                "out": args.out,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
