from .dedup import (
    exact_dedup,
    minhash_candidate_pairs,
    ngram_jaccard_pairs,
    shingle_table,
    simhash,
)
from .similarity import brute_force_topk, cosine_pairs
from .textstats import lang_id, quality_score, token_stats

__all__ = [
    "exact_dedup",
    "minhash_candidate_pairs",
    "ngram_jaccard_pairs",
    "shingle_table",
    "simhash",
    "brute_force_topk",
    "cosine_pairs",
    "lang_id",
    "quality_score",
    "token_stats",
]
