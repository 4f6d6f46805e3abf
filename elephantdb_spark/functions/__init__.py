"""Column-level functions: text analysis, fingerprinting, similarity math.

All hot-path functions are built from `pyspark.sql.functions` primitives
(JVM-side, whole-stage codegen) — no row-at-a-time Python anywhere.
"""

from elephantdb_spark.functions.text import (
    avg_token_len_col,
    avg_token_len_from_tokens,
    fingerprint_rolling_col,
    lang_id_col,
    lang_id_from_tokens,
    stopword_ratio_col,
    stopword_ratio_from_tokens,
    text_profile,
    token_count_col,
    tokens_col,
)
from elephantdb_spark.functions.similarity import cosine_sim_col, dot_col, norm_col

__all__ = [
    "tokens_col",
    "token_count_col",
    "stopword_ratio_col",
    "stopword_ratio_from_tokens",
    "avg_token_len_col",
    "avg_token_len_from_tokens",
    "lang_id_col",
    "lang_id_from_tokens",
    "fingerprint_rolling_col",
    "text_profile",
    "cosine_sim_col",
    "dot_col",
    "norm_col",
]
