"""S7 delete-by-id: victims unfindable, survivors keep EXACT original
scores (frozen-stats semantics), untouched groups not rewritten."""

import os

from pyspark.sql import functions as F

from typesense_spark.index.build import decode_postings
from typesense_spark.index.checkpoint import checkpointed_build, load_checkpointed
from typesense_spark.index.maintain import delete_docs
from typesense_spark.search import SearchRequest, search

BUILD_KW = dict(
    fields=["content"],
    key_cols=["repo", "path", "commit"],
    num_buckets=8,
    block_size=32,
    n_groups=4,
)


def test_delete_docs(spark, corpus_df, tmp_path):
    out = str(tmp_path / "ix")
    checkpointed_build(spark, corpus_df, out, **BUILD_KW)
    ix0 = load_checkpointed(spark, out)
    before = {
        r["doc_id"]: r["score_milli"]
        for r in search(
            ix0, SearchRequest(q="import", fields=("content",), num_typos=0)
        ).matched.collect()
    }
    victims = sorted(before)[:3]
    group_files_before = {
        g: sorted(os.listdir(os.path.join(out, "postings", f"group={g}")))
        for g in range(4)
    }

    summary = delete_docs(spark, out, victims, fields=["content"])
    assert summary["deleted"] == 3
    assert summary["rebuilt_groups"]

    ix1 = load_checkpointed(spark, out)
    # victims gone from postings AND docs
    decoded_ids = {
        r["doc_id"] for r in decode_postings(ix1.postings).select("doc_id").distinct().collect()
    }
    assert not (set(victims) & decoded_ids)
    assert ix1.docs.where(F.col("doc_id").isin(victims)).count() == 0

    # survivors keep exact original scores (frozen stats)
    after = {
        r["doc_id"]: r["score_milli"]
        for r in search(
            ix1, SearchRequest(q="import", fields=("content",), num_typos=0)
        ).matched.collect()
    }
    for d, s in after.items():
        assert before.get(d) == s, d
    assert not (set(victims) & set(after))

    # untouched groups' files were not rewritten
    untouched = set(range(4)) - set(summary["rebuilt_groups"])
    for g in untouched:
        files_now = sorted(os.listdir(os.path.join(out, "postings", f"group={g}")))
        assert files_now == group_files_before[g]


def test_upsert_docs(spark, corpus_df, tmp_path):
    from typesense_spark.index.maintain import upsert_docs

    out = str(tmp_path / "ux")
    checkpointed_build(spark, corpus_df, out, **BUILD_KW)
    ix0 = load_checkpointed(spark, out)
    two = ix0.docs.orderBy("doc_id").limit(2).collect()
    keys = [(r["repo"], r["path"], r["commit"], r["lang"]) for r in two]
    old_ids = [r["doc_id"] for r in two]
    max_old = ix0.docs.agg(F.max("doc_id")).collect()[0][0]

    new_rows = spark.createDataFrame(
        [
            (*keys[0], "replacedterm alpha alpha"),
            (*keys[1], "replacedterm beta"),
            ("orgX/new", "src/new/file.py", "f" * 40, "python", "brandnewdoc replacedterm"),
        ],
        schema="repo string, path string, commit string, lang string, content string",
    )
    summary = upsert_docs(spark, out, new_rows, ["repo", "path", "commit"], ["content"])
    assert summary["upserted"] == 3

    ix1 = load_checkpointed(spark, out)
    res = search(ix1, SearchRequest(q="replacedterm", fields=("content",), num_typos=0))
    got_ids = {r["doc_id"] for r in res.matched.collect()}
    # updated docs keep their ids; the new doc got a fresh id
    assert set(old_ids) <= got_ids
    assert any(d > max_old for d in got_ids)
    assert len(got_ids) == 3
    # old content of updated docs is gone
    old_term = None
    from typesense_spark.tokenizer import tokenize_terms

    for t in tokenize_terms(two[0]["content"]):
        if t not in ("import", "return", "def", "class", "if"):
            old_term = t
            break
    decoded = decode_postings(ix1.postings)
    still = decoded.where(
        (F.col("term") == old_term) & (F.col("doc_id") == old_ids[0])
    ).count()
    # the term may legitimately appear in the doc's NEW content only if
    # planted; our replacement content doesn't contain it
    assert still == 0
    # doc count: 300 - 0 deleted + 1 new
    assert ix1.docs.count() == 301
