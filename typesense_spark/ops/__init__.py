"""Large-scale training-data pipeline operators (first-class, per brief):
deduplication, similarity search, text analysis, multimodal plumbing."""
