"""Dataset-level operators for large-scale training-data pipelines:
deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding),
approximate nearest-neighbor search, and multimodal binary-column plumbing.
"""

from elephantdb_spark.operators.dedup import (
    exact_dedup,
    jaccard_shingle_pairs,
    minhash_lsh_pairs,
    minhash_signatures,
    simhash_fingerprints,
    simhash_neardup_pairs,
)
from elephantdb_spark.operators.ann import (
    brute_force_topk,
    embedding_neardup_pairs,
    lsh_bucket_topk,
)

__all__ = [
    "exact_dedup",
    "jaccard_shingle_pairs",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "simhash_fingerprints",
    "simhash_neardup_pairs",
    "brute_force_topk",
    "lsh_bucket_topk",
    "embedding_neardup_pairs",
]
