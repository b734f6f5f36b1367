"""Training-data pipeline functions: text analysis, dedup, similarity
search, multimodal plumbing — all Spark-native (WSCG exprs) or
Arrow-batched."""
