from graph_data_science_spark.datapipe.ann import cosine_topk, lsh_cosine_topk
from graph_data_science_spark.datapipe.dedup import (
    exact_dedup,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
)
from graph_data_science_spark.datapipe.textstats import document_fingerprint, text_features

__all__ = [
    "cosine_topk",
    "document_fingerprint",
    "exact_dedup",
    "lsh_candidate_pairs",
    "lsh_cosine_topk",
    "minhash_signatures",
    "ngram_jaccard_pairs",
    "simhash",
    "text_features",
]
