from .text import tokenize, word_shingles, char_shingles
from .hashing import POLY_BASE, POLY_MOD, poly_hash, minhash_signature, simhash32

__all__ = [
    "tokenize",
    "word_shingles",
    "char_shingles",
    "POLY_BASE",
    "POLY_MOD",
    "poly_hash",
    "minhash_signature",
    "simhash32",
]
