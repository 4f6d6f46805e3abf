"""Dataset-level operators for large-scale training-data pipelines:
deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding),
approximate nearest-neighbor search, and multimodal binary-column plumbing.
"""

from elephantdb_spark.operators.dedup import (
    exact_dedup,
    repeated_span_profile,
    jaccard_shingle_pairs,
    minhash_lsh_pairs,
    minhash_signatures,
    simhash_fingerprints,
    simhash_neardup_pairs,
)
from elephantdb_spark.operators.ann import (
    brute_force_topk,
    embedding_neardup_pairs,
    ivf_knn_join,
    ivf_topk,
    knn_join,
    lsh_bucket_topk,
    train_ivf_centroids,
)
from elephantdb_spark.operators.multimodal import (
    attach_payload,
    extract_features,
    resize_images,
    sample_frames_df,
)
from elephantdb_spark.operators.temporal import asof_join, range_join
from elephantdb_spark.operators.html import extract_html_text, html_to_text
from elephantdb_spark.operators.curation import (
    build_vocab,
    cap_per_source,
    encode_documents,
    gopher_filter,
    normalize_text,
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
    "ivf_topk",
    "knn_join",
    "ivf_knn_join",
    "train_ivf_centroids",
    "embedding_neardup_pairs",
    "attach_payload",
    "extract_features",
    "resize_images",
    "sample_frames_df",
    "asof_join",
    "range_join",
    "normalize_text",
    "cap_per_source",
    "build_vocab",
    "encode_documents",
    "gopher_filter",
    "repeated_span_profile",
    "extract_html_text",
    "html_to_text",
]
