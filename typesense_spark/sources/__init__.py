from typesense_spark.sources.corpus_source import read_corpus  # noqa: F401
