"""Proximity Match parity with the reference's OWN golden vectors
(/root/reference/test/match_score_test.cpp) + engine integration."""

from typesense_spark.search.match import (
    highlight,
    match_score,
    packed_match_score,
    proximity_rescore,
)


def test_reference_golden_exceed_window():
    # 12 single-position tokens → capped at WINDOW_SIZE=10 words
    positions = [[1]] * 12
    words, _ = match_score(positions)
    assert words == 10


def test_reference_golden_v2_case1():
    positions = [[25], [26], [11, 18, 24, 60], [14, 27, 63]]
    assert match_score(positions) == (4, 97)


def test_reference_golden_v2_case2():
    positions = [
        [38, 50, 170, 187, 195, 222],
        [39, 140, 171, 189, 223],
        [169, 180],
    ]
    assert match_score(positions) == (3, 98)


def test_reference_golden_v2_case3():
    positions = [[38, 50, 187, 195, 201], [120, 167, 171, 223], [240, 250]]
    assert match_score(positions) == (1, 100)


def test_single_token():
    assert match_score([[7, 9]]) == (1, 100)


def test_packed_score_layout():
    # (words << 16) | (255 - cost) << 8 | distance  (match_score.h:49-57)
    packed = packed_match_score([[1], [2]], total_cost=1)
    assert packed == (2 << 16) | (254 << 8) | 99


def test_proximity_rescore_spark(built_index):
    from pyspark.sql import functions as F

    cands = built_index.docs.select("doc_id").limit(50)
    scored = proximity_rescore(built_index, cands, ["import", "return"], ["content"])
    rows = scored.collect()
    assert rows
    for r in rows:
        words = r["match_score"] >> 16
        distance = r["match_score"] & 0xFF
        assert 1 <= words <= 2
        assert 90 <= distance <= 100
    # spot-check one doc against the pure-Python path
    doc = built_index.docs.where(
        F.col("doc_id") == rows[0]["doc_id"]
    ).collect()[0]
    from typesense_spark.tokenizer import tokenize

    plists = {"import": [], "return": []}
    for t, p in tokenize(doc["content"]):
        if t in plists:
            plists[t].append(p)
    present = [v for v in plists.values() if v]
    assert packed_match_score(present) == rows[0]["match_score"]


def test_highlight_marks_terms():
    text = "alpha beta gamma delta epsilon zeta"
    h = highlight(text, {"gamma"})
    assert "<mark>gamma</mark>" in h["snippet"]
    assert "alpha" in h["snippet"]  # short value → emitted whole
    assert h["matched_tokens"] == ["gamma"]
    h2 = highlight(text, {"nomatch"})
    assert "<mark>" not in h2["snippet"] and h2["snippet"].startswith("alpha")


def test_highlight_best_window_and_threshold():
    """Reference semantics: values ≤ snippet_threshold tokens emit whole;
    longer values crop around the BEST match window (densest co-
    occurrence), not the first hit; every occurrence of a matched token
    string inside the snippet is wrapped; highlighted_fully adds the
    full marked value."""
    # early lone 'red', dense 'red shirt' pair much later
    words = ["red"] + [f"w{i}" for i in range(40)] + ["red", "shirt"] + [
        f"t{i}" for i in range(10)
    ]
    text = " ".join(words)
    h = highlight(text, {"red", "shirt"})
    # snippet centers on the dense window (positions 41-42), not pos 0
    assert "<mark>red</mark> <mark>shirt</mark>" in h["snippet"]
    assert "w0" not in h["snippet"]  # early region cropped away
    assert len(h["snippet"].split(" ")) <= 2 + 2 * 4  # window + affixes
    assert h["matched_tokens"] == ["red", "shirt"]
    assert h["value"] is None
    # short value: whole text emitted even though hits are sparse
    short = "red a b c d e shirt"
    hs = highlight(short, {"red", "shirt"})
    assert hs["snippet"].count("<mark>") == 2 and "a b c d e" in hs["snippet"]
    # highlighted_fully marks ALL occurrences across the full value
    hf = highlight(text, {"red", "shirt"}, highlighted_fully=True)
    assert hf["value"].count("<mark>red</mark>") == 2
    assert "w0" in hf["value"]


def test_rerank_proximity_in_engine(built_index):
    from typesense_spark.search import SearchRequest, search
    from typesense_spark.search.match import packed_match_score
    from typesense_spark.tokenizer import tokenize

    res = search(
        built_index,
        SearchRequest(q="import return", fields=("content",), num_typos=0,
                      rerank_proximity=True, per_page=10),
    )
    rows = res.hits.collect()
    assert rows
    # verify ordering key: recompute each hit's proximity score in Python
    contents = {
        r["doc_id"]: r["content"]
        for r in built_index.docs.where(
            built_index.docs.doc_id.isin([r["doc_id"] for r in rows])
        ).collect()
    }
    prox = {}
    for d, content in contents.items():
        plists = {"import": [], "return": []}
        for t, p in tokenize(content):
            if t in plists:
                plists[t].append(p)
        prox[d] = packed_match_score([v for v in plists.values() if v])
    keyed = [(prox[r["doc_id"]],) for r in rows]
    assert keyed == sorted(keyed, reverse=True) or all(
        keyed[i] >= keyed[i + 1] for i in range(len(keyed) - 1)
    )


def test_highlighted_hits_response_shape(built_index):
    from typesense_spark.search import SearchRequest, search

    res = search(
        built_index, SearchRequest(q="import return", fields=("content",), num_typos=0)
    )
    rows = res.highlighted_hits(built_index, "content", {"import", "return"})
    assert rows and all("highlight" in r for r in rows)
    top = rows[0]
    assert "<mark>" in top["highlight"]["snippet"]
    assert set(top["highlight"]["matched_tokens"]) <= {"import", "return"}
    assert top["rank"] == 1 and "score_milli" in top


def test_candidate_blocks_prune_before_position_decode(built_index):
    """Plan-level check (r2 VERDICT #4): a block containing zero
    candidate docs never reaches the position decode — the pruned block
    set is EXACTLY the blocks whose id stream intersects the candidate
    set — and the decoded positions over the pruned set equal the
    candidate-restricted decode over all blocks."""
    from pyspark.sql import functions as F

    from typesense_spark.index import codec
    from typesense_spark.search.match import candidate_blocks, decode_positions_df

    terms = ["import", "return"]
    term_order = {t: i for i, t in enumerate(terms)}
    blocks = built_index.candidate_postings(terms, ["content"])
    cands = built_index.docs.select("doc_id").where(F.col("doc_id") < 10)

    pruned = candidate_blocks(built_index, blocks, cands)
    key = ["field", "term", "salt", "block_id"]
    got = {tuple(r) for r in pruned.select(*key).collect()}

    expected = set()
    n_blocks = 0
    for r in blocks.collect():
        n_blocks += 1
        ids, _, _, _ = codec.unpack_block(
            r["ids_bin"], r["tfs_bin"], r["contribs_bin"], b""
        )
        if any(int(i) < 10 for i in ids):
            expected.add((r["field"], r["term"], r["salt"], r["block_id"]))
    assert got == expected
    assert len(got) < n_blocks  # pruning actually removed blocks

    # parity: candidate-restricted positions are identical pruned vs full
    def rel(bdf):
        out = (
            decode_positions_df(bdf, term_order)
            .join(cands, "doc_id", "left_semi")
            .collect()
        )
        return sorted((r["doc_id"], r["tid"], tuple(r["positions"])) for r in out)

    assert rel(pruned) == rel(blocks)


def test_decode_positions_df_matches_unpack_block(built_index):
    """The vectorized mapInArrow position decode is bit-identical to the
    scalar codec round-trip."""
    from typesense_spark.index import codec
    from typesense_spark.search.match import decode_positions_df

    blocks = built_index.candidate_postings(["import"], ["content"])
    got = sorted(
        (r["doc_id"], tuple(r["positions"]))
        for r in decode_positions_df(blocks, {"import": 0}).collect()
    )
    exp = []
    for r in blocks.collect():
        ids, _, _, poss = codec.unpack_block(
            r["ids_bin"], r["tfs_bin"], r["contribs_bin"], r["pos_bin"]
        )
        for d, p in zip(ids, poss):
            exp.append((int(d), tuple(int(x) for x in p)))
    assert got == sorted(exp)


def test_batch_rerank_proximity_matches_engine(built_index):
    """Q11 × batch: one union decode pass, per-query Match-score
    ordering — parity with engine.search(rerank_proximity=True) query
    by query (rank, doc_id, score_milli)."""
    from typesense_spark.search import SearchRequest, search
    from typesense_spark.search.batch import batch_rerank_proximity

    qset = [
        ("a", "import return"),
        ("b", "merge0 window0"),
        ("c", "class"),
        ("d", "import return class"),
    ]
    kw = dict(fields=("content",), num_typos=0, drop_tokens_threshold=0)
    out = batch_rerank_proximity(built_index, qset, k=8, **kw)
    by_qid = {}
    for r in out.collect():
        by_qid.setdefault(r["qid"], []).append(
            (r["rank"], r["doc_id"], r["score_milli"])
        )
    for qid, q in qset:
        res = search(
            built_index,
            SearchRequest(q=q, per_page=8, rerank_proximity=True, **kw),
        )
        want = [
            (r["rank"], r["doc_id"], r["score_milli"]) for r in res.hits.collect()
        ]
        assert sorted(by_qid.get(qid, [])) == want, (qid, by_qid.get(qid), want)


# ---- text-match-primary golden orderings (r4 VERDICT #4) -----------------
# Ported from the reference's own test corpus + expectations
# (fixtures/reference_documents.jsonl = /root/reference/test/documents.jsonl;
# harness collection_test.cpp:20-61 — a dummy record {points:10, title:"z"}
# is inserted FIRST so jsonl line i gets id i+1; the explicit-id doc "foo"
# is seq 5). Default reference ranking: (text_match DESC, points DESC),
# final tie = larger seq id first.


def _golden_index(spark):
    import json
    import os

    from typesense_spark.index import build_index

    fix = os.path.join(os.path.dirname(__file__), "..", "fixtures",
                       "reference_documents.jsonl")
    rows = [(0, "z", 10)]  # the harness's dummy record (id 0)
    with open(fix) as f:
        for i, line in enumerate(f):
            d = json.loads(line)
            rows.append((i + 1, d["title"], int(d["points"])))
    docs = spark.createDataFrame(
        rows, schema="doc_id long, title string, points long"
    )
    return build_index(
        spark, docs, fields=["title"], id_col="doc_id", num_buckets=4,
        block_size=32, score_col="points",  # MAX_SCORE token ordering
    )


def _golden_search(ix, q, num_typos, per_page, **kw):
    ids, _found = _golden_search_found(ix, q, num_typos, per_page, **kw)
    return ids


def _golden_search_found(ix, q, num_typos, per_page, points_dir="desc", **kw):
    from typesense_spark.search import SearchRequest, search

    res = search(
        ix,
        SearchRequest(
            q=q, fields=("title",), num_typos=num_typos, per_page=per_page,
            prefix_last=False,  # reference search() default prefix=false
            rank_by_text_match=True,
            # the harness's explicit sort fields (collection_test.cpp:36):
            # { text_match DESC, points DESC } — _text_match placed first
            sort_by=(("_text_match", "desc"), ("points", points_dir)),
            **kw,
        ),
    )
    return [r["doc_id"] for r in res.hits.orderBy("rank").collect()], res.found


def test_reference_golden_exact_search_stable(spark):
    """collection_test.cpp ExactSearchShouldBeStable: q='the', 0 typos →
    ids {1, 6, foo, 13, 10, 8, 16} (foo = seq 5); single-token match
    scores tie, points DESC decides, larger seq id wins point ties."""
    ix = _golden_index(spark)
    assert _golden_search(ix, "the", 0, 10) == [1, 6, 5, 13, 10, 8, 16]


def test_reference_golden_query_with_typo(spark):
    """collection_test.cpp QueryWithTypo: q='kind biologcal', 2 typos →
    {19, 3, 20}: two-word window match beats single-word; the cost byte
    ranks find(cost 1) over kinds(cost 1 + length-extension 1)."""
    ix = _golden_index(spark)
    assert _golden_search(ix, "kind biologcal", 2, 3) == [19, 3, 20]


def test_reference_golden_query_with_typo_2(spark):
    """collection_test.cpp QueryWithTypo second case: q='fer thx',
    1 typo → {1, 10, 13}: for+the adjacency (distance byte) then
    points."""
    ix = _golden_index(spark)
    assert _golden_search(ix, "fer thx", 1, 3) == [1, 10, 13]


def test_reference_golden_phrase_search(spark):
    """collection_test.cpp PhraseSearch: q='rocket launch', 0 typos →
    {8, 1, 17, 16, 13}: two-word windows rank by proximity diff
    (8 diff 0, then 1/17 diff 4 split by points, 16 diff 5), the
    single-word match (13) last via drop-tokens."""
    ix = _golden_index(spark)
    ids, found = _golden_search_found(ix, "rocket launch", 0, 10)
    assert ids == [8, 1, 17, 16, 13]
    assert found == 5
    # points ASC flips the equal-match 1/17 pair (score 15 vs 8) and
    # nothing else (collection_test.cpp:176-189)
    assert _golden_search(ix, "rocket launch", 0, 10,
                          points_dir="asc") == [8, 17, 1, 16, 13]
    # pagination: per_page 3 = the same ordering's prefix
    assert _golden_search(ix, "rocket launch", 0, 3) == [8, 1, 17]


def test_reference_golden_partial_phrase(spark):
    """collection_test.cpp PartialPhraseSearch: q='rocket research' →
    {19, 1, 10, 8, 16, 17} — only 19 has both words; the rest surface
    through the drop-tokens union, points DESC within equal match."""
    ix = _golden_index(spark)
    assert _golden_search(ix, "rocket research", 0, 10) == [19, 1, 10, 8, 16, 17]


def test_reference_golden_excluded_tokens(spark):
    """collection_test.cpp SearchWithExcludedTokens: 'how -propellants
    -are' → {9, 17}; exclusion-only queries promote to wildcard and
    subtract ('-rocket' → 21 of 25 docs; '-rocket -cryovolcanism' →
    20)."""
    ix = _golden_index(spark)
    assert _golden_search(ix, "how -propellants -are", 0, 10) == [9, 17]
    _ids, found = _golden_search_found(ix, "-rocket", 0, 50)
    assert found == 21
    _ids, found = _golden_search_found(ix, "-rocket -cryovolcanism", 0, 50)
    assert found == 20


def test_reference_golden_skip_unindexed_tokens(spark):
    """collection_test.cpp SkipUnindexedTokensDuringPhraseSearch: query
    tokens absent from the index drop out instead of zeroing results —
    'DoesNotExist from' → {2, 17} at 0 AND 1 typos; 'from DoesNotExist
    insTruments' (1 typo) → {2, 17}."""
    ix = _golden_index(spark)
    assert _golden_search(ix, "DoesNotExist from", 0, 10) == [2, 17]
    assert _golden_search(ix, "DoesNotExist from", 1, 10) == [2, 17]
    assert _golden_search(ix, "from DoesNotExist insTruments", 1, 10) == [2, 17]
    # no-drop mode: threshold 0 keeps both tokens mandatory
    assert _golden_search(ix, "the a", 0, 10,
                          drop_tokens_threshold=0) == [8, 16, 10]
    ids, _found = _golden_search_found(ix, "the a", 0, 10)
    assert len(ids) == 9  # threshold 10 (default): dropped-token union
    assert _golden_search(ix, "the a DoesNotExist", 0, 10,
                          drop_tokens_threshold=0) == []
    assert _golden_search(ix, "DoesNotExist1 DoesNotExist2", 0, 10) == []
    assert _golden_search(ix, "DoesNotExist1 DoesNotExist2", 2, 10) == []


def test_reference_golden_typo_rank_frequency_vs_max_score(spark):
    """collection_test.cpp TypoTokenRankedByScoreAndFrequency: 'loox'
    (1 typo) — candidate ordering MAX_SCORE vs FREQUENCY both converge
    to {22, 3, 12, 23, 24} (match tie → points DESC); found is 5 at
    every page size."""
    ix = _golden_index(spark)
    assert _golden_search(ix, "loox", 1, 2,
                          rank_tokens_by="max_score") == [22, 3]
    assert _golden_search(ix, "loox", 1, 3) == [22, 3, 12]
    ids, found = _golden_search_found(ix, "loox", 1, 1)
    assert (ids, found) == ([22], 5)
    assert _golden_search(ix, "loox", 1, 10) == [22, 3, 12, 23, 24]
    assert _golden_search(ix, "loox", 1, 10,
                          rank_tokens_by="max_score") == [22, 3, 12, 23, 24]


def test_reference_golden_actual_typo_correction(spark):
    """collection_test.cpp TextContainingAnActualTypo: 'ISX what' →
    ISX corrects to ISS, two-word windows first {19, 6, 21, 8}
    (found 13); bare 'ISX' → the doc with the EXACT token (20, the
    corpus's real typo) outranks every cost-1 correction via the
    typo-cost byte, then points: {20, 19, 6, 3, 21, 4, 10, 8}."""
    ix = _golden_index(spark)
    ids, found = _golden_search_found(ix, "ISX what", 1, 4)
    assert ids == [19, 6, 21, 8]
    assert found == 13
    ids, found = _golden_search_found(ix, "ISX", 1, 10)
    assert ids == [20, 19, 6, 3, 21, 4, 10, 8]
    assert found == 8


def _multi_field_index(spark):
    """collection_sorting_test.cpp harness: multi_field_documents.jsonl
    (fixtures/reference_multi_field_documents.jsonl), auto ids 0..17, no
    dummy record."""
    import json
    import os

    from typesense_spark.index import build_index

    fix = os.path.join(os.path.dirname(__file__), "..", "fixtures",
                       "reference_multi_field_documents.jsonl")
    rows = []
    with open(fix) as f:
        for i, line in enumerate(f):
            d = json.loads(line)
            rows.append((i, d["title"], int(d["points"])))
    docs = spark.createDataFrame(
        rows, schema="doc_id long, title string, points long"
    )
    return build_index(
        spark, docs, fields=["title"], id_col="doc_id", num_buckets=4,
        block_size=32, score_col="points",
    )


def test_reference_golden_sorting_order(spark):
    """collection_sorting_test.cpp SortingOrder: USER-sort-primary —
    sort_by points ASC resolves to [points asc, text_match desc]
    (the reference APPENDS _text_match when absent,
    src/collection.cpp:726-728); DESC mirrors it; with the resolved
    default [text_match desc, points desc] equal-match hits order by
    points."""
    from typesense_spark.search import SearchRequest, search

    ix = _multi_field_index(spark)

    def run(q, sort_by, per_page):
        res = search(
            ix,
            SearchRequest(
                q=q, fields=("title",), num_typos=0, per_page=per_page,
                prefix_last=False, rank_by_text_match=True, sort_by=sort_by,
            ),
        )
        return [r["doc_id"] for r in res.hits.orderBy("rank").collect()]

    asc = (("points", "asc"),)
    assert run("the", asc, 15) == [17, 13, 10, 4, 0, 1, 8, 6, 16, 11]
    assert run("the", asc, 5) == [17, 13, 10, 4, 0]
    assert run("the", (("points", "desc"),), 15) == [
        11, 16, 6, 8, 1, 0, 10, 4, 13, 17]
    # empty sort_by upstream-resolves to [text_match, default sorting
    # field] (src/collection.cpp:713-716) — points IS the dsf here
    assert run("of", (("_text_match", "desc"), ("points", "desc")), 10) == [
        11, 12, 5, 4, 17]


def test_batch_rerank_text_match_matches_engine(built_index):
    """Text-match-primary × batch: one union decode pass over every
    query's typo/prefix candidates, full packed score (incl. the
    typo-cost byte) as the per-query PRIMARY key — parity with
    engine.search(rank_by_text_match=True) query by query, including
    typo queries where the cost byte actually discriminates."""
    from typesense_spark.search import SearchRequest, search
    from typesense_spark.search.batch import batch_rerank_text_match

    qset = [
        ("a", "import return"),      # exact, cost byte 255
        ("b", "improt"),             # typo: cost byte varies by candidate
        ("c", "import retur"),       # typo'd second token
        ("d", "class"),              # single token → Match(1, 0)
    ]
    kw = dict(
        fields=("content",), num_typos=2, prefix_last=False,
        drop_tokens_threshold=0,
    )
    out = batch_rerank_text_match(built_index, qset, k=8, **kw)
    by_qid = {}
    for r in out.collect():
        by_qid.setdefault(r["qid"], []).append(
            (r["rank"], r["doc_id"], r["match_score"], r["score_milli"])
        )
    for qid, q in qset:
        res = search(
            built_index,
            SearchRequest(q=q, per_page=8, rank_by_text_match=True, **kw),
        )
        want = [
            (r["rank"], r["doc_id"], r["match_score"], r["score_milli"])
            for r in res.hits.collect()
        ]
        assert sorted(by_qid.get(qid, [])) == want, (qid, by_qid.get(qid), want)
