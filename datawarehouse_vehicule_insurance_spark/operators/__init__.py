"""Engine operators: declarative cleaning rules, gold dimensional builders,
and the large-scale training-data operators (dedup, similarity search,
text analysis, multimodal plumbing)."""
