"""Q2 multi-token synonym windows — golden vectors ported from the
reference's test/collection_synonyms_test.cpp (SynonymReductionOneWay,
SynonymReductionMultiWay, SynonymBelongingToMultipleSets) plus
end-to-end search integration."""

from typesense_spark.search.synonyms import (
    SynonymRule,
    SynonymStore,
    synonym_reduction,
)


def test_reduction_one_way():
    # collection_synonyms_test.cpp:145-215
    store = SynonymStore()
    store.add(SynonymRule("nyc-expansion", ("nyc",), (("new", "york"),)))
    assert synonym_reduction(["red", "nyc", "tshirt"], store) == [
        ["red", "new", "york", "tshirt"]
    ]
    # no rules fire → no variants
    assert synonym_reduction(["foo", "bar", "baz"], store) == []
    # compression, and no ping-pong back through the expansion rule
    store.add(SynonymRule("new-york-compression", ("new", "york"), (("nyc",),)))
    assert synonym_reduction(["red", "new", "york", "tshirt"], store) == [
        ["red", "nyc", "tshirt"]
    ]
    # two same-length window replacements chain
    store.add(SynonymRule("t-shirt-compression", ("t", "shirt"), (("tshirt",),)))
    assert synonym_reduction(["new", "york", "t", "shirt"], store) == [
        ["nyc", "tshirt"]
    ]
    # different-length replacements chain
    store.add(SynonymRule("red-crimson", ("red",), (("crimson",),)))
    assert synonym_reduction(["red", "new", "york", "cap"], store) == [
        ["crimson", "nyc", "cap"]
    ]


def test_reduction_multi_way():
    # collection_synonyms_test.cpp:217-266
    store = SynonymStore()
    store.add(
        SynonymRule("ipod-synonyms", (), (("ipod",), ("i", "pod"), ("pod",)))
    )
    assert synonym_reduction(["ipod"], store) == [["i", "pod"], ["pod"]]
    assert synonym_reduction(["i", "pod"], store) == [["ipod"], ["pod"]]
    store.add(
        SynonymRule(
            "usa-synonyms",
            (),
            (
                ("usa",),
                ("united", "states"),
                ("us",),
                ("united", "states", "of", "america"),
                ("states",),
            ),
        )
    )
    assert synonym_reduction(["united", "states"], store) == [
        ["usa"],
        ["us"],
        ["united", "states", "of", "america"],
        ["states"],
    ]


def test_reduction_multiple_sets():
    # collection_synonyms_test.cpp:268-292
    store = SynonymStore()
    store.add(
        SynonymRule("iphone-synonyms", (), (("i", "phone"), ("smart", "phone")))
    )
    store.add(
        SynonymRule(
            "samsung-synonyms",
            (),
            (("smart", "phone"), ("galaxy", "phone"), ("samsung", "phone")),
        )
    )
    assert synonym_reduction(["smart", "phone"], store) == [
        ["i", "phone"],
        ["galaxy", "phone"],
        ["samsung", "phone"],
    ]


def test_store_upsert_and_remove():
    # collection_synonyms_test.cpp:479-505 themes
    store = SynonymStore()
    store.add(SynonymRule("s1", (), (("a",), ("b",))))
    store.add(SynonymRule("s2", ("x",), (("y",),)))
    assert len(store) == 2
    store.remove("s1")
    assert len(store) == 1 and store.get("s1") is None
    store.add(SynonymRule("s2", ("z",), (("w",),)))  # upsert replaces
    assert len(store) == 1
    assert store.get("s2").root == ("z",)
    assert synonym_reduction(["x"], store) == []  # old root gone
    assert synonym_reduction(["z"], store) == [["w"]]


def test_search_with_synonym_window(built_index):
    """A multi-token window rewrite must pull in docs that only match
    the variant, scored exactly as if the variant were the query, and
    docs matched by both keep the max score."""
    from pyspark.sql import functions as F

    from typesense_spark.search import SearchRequest, SynonymRule, SynonymStore, search

    store = SynonymStore(
        [SynonymRule("ir", ("import", "return"), (("merge0",),))]
    )
    base = search(
        built_index,
        SearchRequest(q="import return", fields=("content",), num_typos=0),
    )
    variant = search(
        built_index, SearchRequest(q="merge0", fields=("content",), num_typos=0)
    )
    syn = search(
        built_index,
        SearchRequest(
            q="import return", fields=("content",), num_typos=0, synonym_store=store
        ),
    )
    base_scores = {r["doc_id"]: r["score_milli"] for r in base.matched.collect()}
    var_scores = {r["doc_id"]: r["score_milli"] for r in variant.matched.collect()}
    syn_scores = {r["doc_id"]: r["score_milli"] for r in syn.matched.collect()}
    want = dict(base_scores)
    for d, s in var_scores.items():
        want[d] = max(want.get(d, 0), s)
    assert syn_scores == want
    assert set(var_scores) - set(base_scores), "variant must add new docs"
    # sanity: the variant tokens were recorded as a searched attempt
    assert ["merge0"] in syn.attempts
