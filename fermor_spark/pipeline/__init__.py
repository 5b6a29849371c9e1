"""Large-scale training-data pipeline operators.

Beyond the reference's graph surface (SURVEY.md §2.12): deduplication
(exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding cosine),
similarity search (brute-force + LSH-bucketed ANN), text analysis
(language-ID, quality scoring, token counting, fingerprinting), and
multimodal binary-column plumbing.

All operators are DataFrame-in → DataFrame-out, shuffle-conscious
(banding/bucketing instead of all-pairs joins), and deterministic
(hash families are md5/xxhash64 over seed-prefixed inputs).
"""

from fermor_spark.pipeline import dedup, multimodal, similarity, sink, text  # noqa: F401
