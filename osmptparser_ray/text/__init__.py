from .analysis import (
    add_bpe_token_count,
    add_word_diversity,
    doc_term_counts,
    scrub_pattern,
    tfidf_top_terms,
    token_frequencies,
    add_fingerprint,
    add_rolling_fingerprints,
    quality_filter,
    add_lang_id,
    add_quality_scores,
    add_token_count,
)
from .dedup import (
    duplicate_groups,
    exact_dedup,
    lsh_candidate_pairs,
    minhash_signatures,
    simhash_near_pairs,
    simhash_signatures,
    verify_jaccard,
)

from .pack import pack_sequences

__all__ = [
    "add_bpe_token_count",
    "add_word_diversity",
    "doc_term_counts",
    "scrub_pattern",
    "tfidf_top_terms",
    "token_frequencies",
    "pack_sequences",
    "add_fingerprint",
    "add_rolling_fingerprints",
    "quality_filter",
    "add_lang_id",
    "add_quality_scores",
    "add_token_count",
    "duplicate_groups",
    "exact_dedup",
    "lsh_candidate_pairs",
    "minhash_signatures",
    "simhash_near_pairs",
    "simhash_signatures",
    "verify_jaccard",
]
