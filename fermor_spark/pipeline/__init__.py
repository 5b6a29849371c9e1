"""Large-scale training-data pipeline operators.

Beyond the reference's graph surface (SURVEY.md §2.12): web-crawl
ingest (WARC batch + streaming, HTML main-content extraction, URL
canonicalization + domain blocklists), deduplication (exact /
MinHash-LSH / SimHash / n-gram Jaccard / embedding cosine),
similarity search (brute-force + LSH-bucketed ANN), text analysis
(language-ID, quality scoring, token counting, fingerprinting),
sampling/splitting/mixing, and multimodal binary-column plumbing.

All operators are DataFrame-in → DataFrame-out, shuffle-conscious
(banding/bucketing instead of all-pairs joins), and deterministic
(hash families are md5/xxhash64 over seed-prefixed inputs).
"""

from fermor_spark.pipeline import (dedup, html, multimodal, profile,  # noqa: F401
                                   sample, similarity, sink, text, url,
                                   warc)
