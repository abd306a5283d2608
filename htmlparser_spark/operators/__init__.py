"""DataFrame-level operators: extraction pipeline, selector queries,
checkpoint/resume, dedup, similarity search, text stats, multimodal."""
