"""Iceberg-shaped snapshot layer (index/snapshots.py): immutable
commits, copy-on-write inheritance, atomic HEAD, time travel."""

from typesense_spark.index import snapshots


def test_commit_inheritance_and_history(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("snap_tables"))
    a = spark.range(5).withColumnRenamed("id", "x")
    b = spark.range(3).withColumnRenamed("id", "y")
    v1 = snapshots.commit(root, {"a": a, "b": b}, op="init")
    assert v1 == 1 and snapshots.head_version(root) == 1
    # commit only b: a INHERITS v1's immutable directory
    v2 = snapshots.commit(root, {"b": b.where("y < 2")}, op="shrink b")
    m1, m2 = snapshots.read_manifest(root, 1), snapshots.read_manifest(root, 2)
    assert m2["tables"]["a"]["path"] == m1["tables"]["a"]["path"]
    assert m2["tables"]["b"]["path"] != m1["tables"]["b"]["path"]
    assert m2["tables"]["b"]["rows"] == 2  # Observation count rode the write
    # both versions fully readable (time travel at table level)
    t1 = snapshots.load_tables(spark, root, 1)
    t2 = snapshots.load_tables(spark, root, v2)
    assert t1["b"].count() == 3 and t2["b"].count() == 2
    assert [e["version"] for e in snapshots.history(root)] == [1, 2]


def test_index_snapshot_delete_and_time_travel(spark, corpus_df, tmp_path_factory):
    from typesense_spark.index import build_index
    from typesense_spark.search import SearchRequest, search

    root = str(tmp_path_factory.mktemp("snap_ix"))
    bkw = dict(block_size=32, salt_threshold=100, n_salts=4)
    ix = build_index(
        spark, corpus_df, fields=["content"],
        key_cols=["repo", "path", "commit"], num_buckets=8, **bkw,
    )
    assert snapshots.commit_index(root, ix, n_groups=4, build_kw=bkw) == 1

    req = dict(q="import", fields=("content",), num_typos=0, per_page=20)
    hits1 = [
        (h["doc_id"], h["score_milli"])
        for h in search(snapshots.load_index(spark, root), SearchRequest(**req)).hits.collect()
    ]
    assert hits1
    victim = hits1[0][0]

    out = snapshots.delete_docs_versioned(spark, root, [victim], ["content"])
    assert out["version"] == 2 and out["rebuilt_groups"]

    # HEAD: victim gone, survivors keep their EXACT scores (frozen stats)
    hits2 = [
        (h["doc_id"], h["score_milli"])
        for h in search(snapshots.load_index(spark, root), SearchRequest(**req)).hits.collect()
    ]
    assert all(d != victim for d, _ in hits2)
    expect = [h for h in hits1 if h[0] != victim]
    assert hits2[: len(expect)] == expect

    # time travel: version 1 still returns the victim with its old rank
    hits_old = [
        (h["doc_id"], h["score_milli"])
        for h in search(
            snapshots.load_index(spark, root, version=1), SearchRequest(**req)
        ).hits.collect()
    ]
    assert hits_old == hits1

    # copy-on-write bookkeeping: every rebuilt group has a NEW immutable
    # dir; any untouched group inherits the v1 path verbatim
    m1, m2 = snapshots.read_manifest(root, 1), snapshots.read_manifest(root, 2)
    for g in out["rebuilt_groups"]:
        name = f"{snapshots.POSTINGS_PREFIX}{g}"
        assert m2["tables"][name]["path"] != m1["tables"][name]["path"]
    untouched = [
        n
        for n in m2["tables"]
        if n.startswith(snapshots.POSTINGS_PREFIX)
        and n not in {f"{snapshots.POSTINGS_PREFIX}{g}" for g in out["rebuilt_groups"]}
    ]
    for n in untouched:
        assert m2["tables"][n]["path"] == m1["tables"][n]["path"]
