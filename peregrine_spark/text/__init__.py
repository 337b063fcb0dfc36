from peregrine_spark.text.analysis import (
    fingerprint,
    lang_id,
    quality_score,
    token_stats,
    token_stats_by,
)
from peregrine_spark.text.dedup import (
    exact_dedup,
    jaccard_pairs,
    minhash_lsh_pairs,
    simhash,
    simhash_pairs,
)

__all__ = [
    "fingerprint", "lang_id", "quality_score", "token_stats", "token_stats_by",
    "exact_dedup", "jaccard_pairs", "minhash_lsh_pairs", "simhash", "simhash_pairs",
]
