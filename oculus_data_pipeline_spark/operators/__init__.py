from .dedup import (
    exact_dedup,
    minhash_candidate_pairs,
    ngram_jaccard_pairs,
    shingle_table,
    simhash,
)
from .similarity import brute_force_topk, cosine_pairs, lsh_ann_topk
from .skew import salted_join
from .textstats import fingerprint, lang_id, quality_score, token_stats

__all__ = [
    "exact_dedup",
    "minhash_candidate_pairs",
    "ngram_jaccard_pairs",
    "shingle_table",
    "simhash",
    "brute_force_topk",
    "cosine_pairs",
    "lsh_ann_topk",
    "salted_join",
    "fingerprint",
    "lang_id",
    "quality_score",
    "token_stats",
]
