"""North-rule relational operators over the H3 kernel: spatial joins
(point-in-polygon, kNN), span-geometry extraction, training-data ops
(dedup, similarity, text analysis, multimodal plumbing)."""
