"""Tokenization & shingling — JVM-side Column expressions only.

The reference tokenizer (``src/WordCounter.cpp:22-30``): split on any
whitespace run, case-sensitive, punctuation retained, empty tokens
dropped (quirk Q2 in SURVEY.md). These functions reproduce that contract
as Catalyst expressions — no Python UDFs, so they stay inside
whole-stage codegen at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokenize(col: Column | str) -> Column:
    """Whitespace tokenizer, reference semantics (quirk Q2):
    any-whitespace split, case kept, punctuation kept, empties dropped.

    Returns ARRAY<STRING>.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, r"\s+"), lambda x: x != F.lit(""))


def word_shingles(tokens: Column, n: int = 3) -> Column:
    """Distinct n-gram word shingles (space-joined) over a token array.

    Built as sequence+transform+slice — stays in codegen. A document with
    fewer than ``n`` tokens yields a single shingle of all its tokens, so
    no document silently disappears from dedup.
    """
    short = F.array(F.array_join(tokens, " "))
    full = F.transform(
        F.sequence(F.lit(1), F.size(tokens) - F.lit(n - 1)),
        lambda i: F.array_join(F.slice(tokens, i, n), " "),
    )
    return F.array_distinct(F.when(F.size(tokens) < n, short).otherwise(full))


def char_shingles(col: Column | str, k: int = 8) -> Column:
    """Distinct k-character shingles of a string (for char-level near-dup
    and fingerprinting). Strings shorter than ``k`` yield themselves."""
    c = F.col(col) if isinstance(col, str) else col
    short = F.array(c)
    full = F.transform(
        F.sequence(F.lit(1), F.length(c) - F.lit(k - 1)),
        lambda i: F.substring(c, i, k),
    )
    return F.array_distinct(F.when(F.length(c) < k, short).otherwise(full))
