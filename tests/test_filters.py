"""Q9 filter_by DSL — grammar and semantics ported from the
reference's parse_filter_query/do_filtering and
test/collection_filtering_test.cpp themes (numeric comparators,
multi-value OR, bool, token-AND string CONTAINS, := exact, && AND)."""

import pytest

from typesense_spark.search.filters import (
    FilterParseError,
    apply_filter_by,
    parse_filter_by,
)


@pytest.fixture(scope="module")
def fdocs(spark):
    rows = [
        (1, "gold silver", "south africa", 100, 4.5, True),
        (2, "gold", "south america", 250, 1.5, False),
        (3, "silver platinum", "africa", 30, 3.0, True),
        (4, "gold platinum", "south africa", 900, 2.5, False),
    ]
    return spark.createDataFrame(
        rows, schema="doc_id long, tags string, country string, age long, rating double, active boolean"
    )


def _ids(df):
    return sorted(r["doc_id"] for r in df.collect())


def test_numeric_comparators(fdocs):
    assert _ids(apply_filter_by(fdocs, "age: >= 250")) == [2, 4]
    assert _ids(apply_filter_by(fdocs, "age: < 100")) == [3]
    assert _ids(apply_filter_by(fdocs, "age: 250")) == [2]
    assert _ids(apply_filter_by(fdocs, "age:= 250")) == [2]  # '=' no-op on numerics
    assert _ids(apply_filter_by(fdocs, "rating: > 2.4")) == [1, 3, 4]


def test_numeric_multi_value_is_or(fdocs):
    assert _ids(apply_filter_by(fdocs, "age: [100, 900]")) == [1, 4]
    assert _ids(apply_filter_by(fdocs, "age: [>= 900, < 50]")) == [3, 4]


def test_bool_values(fdocs):
    assert _ids(apply_filter_by(fdocs, "active: true")) == [1, 3]
    assert _ids(apply_filter_by(fdocs, "active: [true, false]")) == [1, 2, 3, 4]


def test_string_contains_is_token_and(fdocs):
    # reference: multiple tokens in a filter value are ANDed
    assert _ids(apply_filter_by(fdocs, "country: south africa")) == [1, 4]
    assert _ids(apply_filter_by(fdocs, "country: africa")) == [1, 3, 4]
    assert _ids(apply_filter_by(fdocs, "tags: [gold, platinum]")) == [1, 2, 3, 4]


def test_string_exact_match(fdocs):
    assert _ids(apply_filter_by(fdocs, "country:= south africa")) == [1, 4]
    assert _ids(apply_filter_by(fdocs, "country:= africa")) == [3]
    assert _ids(apply_filter_by(fdocs, "country:= [africa, south america]")) == [2, 3]


def test_conjunction(fdocs):
    assert _ids(apply_filter_by(fdocs, "tags: gold && age: < 300 && active: false")) == [2]


def test_parse_errors(fdocs):
    schema = dict(fdocs.dtypes)
    for bad in ["no colon here", "missing_field: 1", "age: abc", "active: maybe"]:
        with pytest.raises(FilterParseError):
            parse_filter_by(bad, schema)


def test_search_with_filter_by(built_index):
    from typesense_spark.search import SearchRequest, search

    base = search(
        built_index,
        SearchRequest(q="import", fields=("content",), num_typos=0,
                      filter_expr="lang = 'py'"),
    )
    dsl = search(
        built_index,
        SearchRequest(q="import", fields=("content",), num_typos=0,
                      filter_by="lang := py"),
    )
    assert {tuple(r) for r in dsl.hits.collect()} == {
        tuple(r) for r in base.hits.collect()
    }
