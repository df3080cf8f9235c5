"""spark-submit entry point: query a built index.

Usage:
  spark-submit --py-files typesense_spark.zip jobs/search_job.py \
      --index /path/to/index --q "parse json buffer" \
      [--fields content] [--num-typos 2] [--prefix] [--mode and|or] \
      [--filter "lang = 'python'"] [--facet-by lang] [--k 10] [--wand]

Prints one JSON line with hits (rank, doc_id, score_milli) and facets.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--q", required=True)
    ap.add_argument("--fields", default="content")
    ap.add_argument("--num-typos", type=int, default=2)
    ap.add_argument("--prefix", action="store_true")
    ap.add_argument("--mode", default="and", choices=["and", "or"])
    ap.add_argument("--filter", default=None, help="raw SQL WHERE over docs")
    ap.add_argument("--filter-by", default=None, help="reference filter DSL")
    ap.add_argument("--typo-distance", default="levenshtein",
                    choices=["levenshtein", "osa"])
    ap.add_argument("--rank-tokens-by", default="frequency",
                    choices=["frequency", "max_score"])
    ap.add_argument("--weights", default="",
                    help="comma ints parallel to --fields (query_by_weights)")
    ap.add_argument("--synonyms-json", default=None,
                    help='JSON list of {"id","root":[..],"synonyms":[[..],..]}')
    ap.add_argument("--facet-by", default="")
    ap.add_argument("--group-by", default="")
    ap.add_argument("--group-limit", type=int, default=3)
    ap.add_argument("--page", type=int, default=1)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--wand", action="store_true")
    ap.add_argument("--highlight", action="store_true")
    args = ap.parse_args()

    from typesense_spark import get_spark
    from typesense_spark.index.checkpoint import load_checkpointed
    from typesense_spark.search import SearchRequest, search
    from typesense_spark.search.engine import parse_query
    from typesense_spark.search.match import highlight

    spark = get_spark(app_name="typesense-spark-search")
    ix = load_checkpointed(spark, args.index)
    syn_store = None
    if args.synonyms_json:
        from typesense_spark.search.synonyms import SynonymRule, SynonymStore

        syn_store = SynonymStore(
            [
                SynonymRule(
                    d["id"],
                    tuple(d.get("root", ())),
                    tuple(tuple(s) for s in d.get("synonyms", ())),
                )
                for d in json.loads(args.synonyms_json)
            ]
        )
    req = SearchRequest(
        q=args.q,
        fields=tuple(args.fields.split(",")),
        mode=args.mode,
        num_typos=args.num_typos,
        prefix_last=args.prefix,
        filter_expr=args.filter,
        filter_by=args.filter_by,
        typo_distance=args.typo_distance,
        rank_tokens_by=args.rank_tokens_by,
        query_by_weights=tuple(int(w) for w in args.weights.split(",") if w),
        synonym_store=syn_store,
        facet_by=tuple(args.facet_by.split(",")) if args.facet_by else (),
        group_by=tuple(args.group_by.split(",")) if args.group_by else (),
        group_limit=args.group_limit,
        page=args.page,
        per_page=args.k,
        use_wand=args.wand,
    )
    res = search(ix, req)
    hits = [r.asDict() for r in res.hits.collect()]
    if args.highlight and hits:
        terms = set(parse_query(args.q)[0])
        contents = {
            r["doc_id"]: r[args.fields.split(",")[0]]
            for r in ix.docs.where(
                ix.docs.doc_id.isin([h["doc_id"] for h in hits])
            ).collect()
        }
        for h in hits:
            h["snippet"] = highlight(contents.get(h["doc_id"], ""), terms)["snippet"]
    out = {
        "q": args.q,
        "found": res.found,
        "hits": hits,
        "facets": {
            col: [r.asDict() for r in df.collect()] for col, df in res.facets.items()
        },
        "attempts": res.attempts,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
