"""typesense_spark — a brand-new PySpark-native inverted-index build +
BM25 top-k query engine with the query/data-processing capabilities of
the reference (voldyman/typesense, C++; see SURVEY.md).

Not a port: the reference is an in-memory single-node trie engine; this
package is a batch/distributed DataFrame + Arrow-UDF pipeline.

Layout
------
- ``tokenizer``   pinned tokenizer (pure Python + equivalent Spark SQL
                  expression), reference parity: src/tokenizer.cpp:4-112
- ``scoring``     pinned BM25 spec (integer milli-score quantization so
                  distributed sums are exact longs)
- ``corpus``      deterministic synthetic source-code corpus generator
                  (BASELINE.json input_hint shape)
- ``index``       index build: postings/terms/doc_attrs tables, salted
                  repartition, delta+varint block codec, checkpoints
- ``search``      query engine: typo/prefix expansion, AND/OR/NOT,
                  filters, facets, grouping, top-k, WAND
- ``ops``         training-data ops: dedup, similarity search,
                  text analysis, multimodal plumbing
- ``streaming``   incremental index maintenance (Structured Streaming)
"""

__version__ = "0.1.0"

from typesense_spark.session import get_spark  # noqa: F401
