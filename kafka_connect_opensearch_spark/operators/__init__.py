"""Engine operators: index build, segments, BM25, dedup, similarity."""
