from .hashing import det_hash, det_unit
from .text import (
    char_shingles,
    doc_fingerprint,
    lang_id,
    quality_score,
    token_count,
    tokens,
    word_ngrams,
)

__all__ = [
    "det_hash",
    "det_unit",
    "char_shingles",
    "doc_fingerprint",
    "lang_id",
    "quality_score",
    "token_count",
    "tokens",
    "word_ngrams",
]
