"""Extension operators for large-scale training-data pipelines
(SURVEY.md §2.10, BASELINE.json north star): deduplication (exact, MinHash
LSH, SimHash, n-gram Jaccard, embedding cosine), similarity search
(brute-force and LSH-bucketed ANN), text analysis (language ID, quality
scoring, token counting, fingerprinting), and multimodal binary columns.

Design rules carried over from the core engine:
- everything is native Column expressions (md5, list lambdas, explode) so
  Catalyst sees through it — the only Python is the clearly-stubbed
  multimodal decoders (Arrow-batched ``mapInPandas``);
- pair-generating operators (LSH buckets, shingle joins) bound their
  candidate sets structurally (band join on equality) so the shuffle key is
  the bucket, never the full cross product;
- floating-point outputs go through the integer-exact discipline
  (``functions/exact.py``): embeddings are quantized to scaled ints before
  dot products, so cosine scores are bit-identical across engines.
"""
