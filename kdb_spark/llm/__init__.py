"""LLM-data-pipeline operators (SURVEY.md §2.K) — dedup (exact / MinHash-LSH /
SimHash / n-gram Jaccard), similarity search, text analysis, multimodal
columns. Not in the reference; required first-class components for a 100 TB
training-data pipeline.

Design rules applied throughout:
- candidate generation is always blocked/banded (shared shingle, LSH band,
  sign bucket) — never all-pairs;
- hot paths are JVM expressions (xxhash64, array/lambda functions); Python
  appears only in the Arrow-batched multimodal decode plumbing.
"""
