"""Reusable distributed building blocks for the training-data pipeline ops.

These are the operators a 100 TB corpus pipeline composes: shingling,
minhash-LSH candidate generation, simhash signatures, cosine top-k, and the
multimodal Pandas-UDF plumbing. Queries in ``queries/textpipe.py`` and
``queries/embeddings.py`` are thin, oracle-checkable views over these.
"""

from .text import (
    PORTABLE_HASH_PRIME,
    hash60,
    word_shingles,
    minhash_signatures,
    lsh_candidate_pairs,
    simhash16,
)
from .vectors import dot_decimal, dot_double, sq_norm_decimal, cosine_topk
from .multimodal import media_features

__all__ = [
    "PORTABLE_HASH_PRIME",
    "hash60",
    "word_shingles",
    "minhash_signatures",
    "lsh_candidate_pairs",
    "simhash16",
    "dot_decimal",
    "dot_double",
    "sq_norm_decimal",
    "cosine_topk",
    "media_features",
]
