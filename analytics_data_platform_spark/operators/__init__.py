"""Large-scale training-data operators: dedup families, similarity search,
multimodal column plumbing. Designed 100 TB-first (BASELINE.json north star)."""
