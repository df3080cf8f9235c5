"""spark-submit entry point: build (or resume) the inverted index.

Usage:
  spark-submit --py-files typesense_spark.zip jobs/build_index_job.py \
      --input /path/to/corpus_parquet --out /path/to/index \
      [--fields content] [--key-cols repo,path,commit | --id-col doc_id] \
      [--num-buckets 512] [--block-size 128] [--salt-threshold 100000] \
      [--n-groups 16] [--synthetic-docs N]

On a cluster the same command runs unchanged; ``--n-groups`` controls
checkpoint granularity (each group commits independently; a killed job
resumes by re-running only missing groups). The build manifest with
per-stage lineage + postings/sec lands at ``<out>/manifest.json``.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="corpus parquet path")
    ap.add_argument("--synthetic-docs", type=int, default=0,
                    help="generate a deterministic synthetic corpus instead of --input")
    ap.add_argument("--out", required=True)
    ap.add_argument("--fields", default="content")
    ap.add_argument("--key-cols", default="repo,path,commit")
    ap.add_argument("--id-col", default=None)
    ap.add_argument("--num-buckets", type=int, default=64)
    ap.add_argument("--block-size", type=int, default=128)
    ap.add_argument("--salt-threshold", type=int, default=100_000)
    ap.add_argument("--n-salts", type=int, default=8)
    ap.add_argument("--n-groups", type=int, default=8)
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--score-col", default=None,
                    help="static ranking column → terms.max_score "
                    "(enables rank_tokens_by=max_score at query time)")
    args = ap.parse_args()

    from typesense_spark import get_spark
    from typesense_spark.index.checkpoint import checkpointed_build

    spark = get_spark(app_name="typesense-spark-build")
    if args.synthetic_docs:
        from typesense_spark.corpus import corpus_df

        src = corpus_df(spark, args.synthetic_docs)
    else:
        src = spark.read.parquet(args.input)

    import time

    t0 = time.time()
    ix = checkpointed_build(
        spark,
        src,
        args.out,
        fields=args.fields.split(","),
        key_cols=None if args.id_col else args.key_cols.split(","),
        id_col=args.id_col,
        n_groups=args.n_groups,
        resume=not args.no_resume,
        num_buckets=args.num_buckets,
        block_size=args.block_size,
        salt_threshold=args.salt_threshold,
        n_salts=args.n_salts,
        **({"score_col": args.score_col} if args.score_col else {}),
    )
    build_wall = time.time() - t0
    with open(f"{args.out}/manifest.json") as f:
        manifest = json.load(f)
    print(json.dumps({
        "out": args.out,
        "build_wall_sec": round(build_wall, 3),
        "total_postings": manifest["total_postings"],
        "stats": {k: {"n_docs": v.n_docs, "avgdl": v.avgdl} for k, v in ix.stats.items()},
    }))
    spark.stop()


if __name__ == "__main__":
    main()
