from typesense_spark.search.engine import SearchRequest, SearchResult, search  # noqa: F401
from typesense_spark.search.expand import expand_query, levenshtein  # noqa: F401
from typesense_spark.search.curation import OverrideRule, OverrideStore  # noqa: F401
from typesense_spark.search.synonyms import (  # noqa: F401
    SynonymRule,
    SynonymStore,
    synonym_reduction,
)
