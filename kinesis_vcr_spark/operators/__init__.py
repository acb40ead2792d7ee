"""DataFrame-native operators: VCR batching plus the training-data
pipeline suite (dedup, similarity, text analysis, multimodal)."""
