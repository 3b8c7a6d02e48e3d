"""Dialect-dual text hashing / shingling snippets.

The dedup family (minhash-LSH, simhash, fingerprints) needs a hash both
engines can evaluate bit-identically, so the correctness-gated path uses
a polynomial rolling hash over character codes (left fold, exact int64
arithmetic below 2^63) expressed in Spark SQL and DuckDB. The
scale path swaps in ``xxhash64`` (JVM intrinsic) via ``fast=True`` on
the operators — same pipeline shape, cheaper hash, no oracle.

P is a 53-bit prime so (acc * 131 + c) stays < 2^63.
"""

from __future__ import annotations

from . import sqlgen as sg

P = 9007199254740881  # largest prime < 2^53
MULT = 131
SEED = 7


def char_codes(s: str, d: str) -> str:
    """Array of character codes of a string expression."""
    if d == sg.SPARK:
        return (f"transform(sequence(1, length({s})), "
                f"i -> ascii(substring({s}, i, 1)))")
    return (f"list_transform(range(1, length({s}) + 1), "
            f"i -> ascii(substr({s}, i, 1)))")


def fold_hash(arr: str, d: str, seed: int = SEED) -> str:
    """Left-fold polynomial hash of an int array expression."""
    if d == sg.SPARK:
        return (f"aggregate({arr}, CAST({seed} AS BIGINT), "
                f"(acc, c) -> (acc * {MULT} + c) % {P})")
    return (f"list_reduce(list_prepend(CAST({seed} AS BIGINT), {arr}), "
            f"(acc, c) -> (acc * {MULT} + c) % {P})")


def text_hash(s: str, d: str, seed: int = SEED) -> str:
    """Polynomial hash of a string (the oracle-able fingerprint)."""
    return fold_hash(char_codes(s, d), d, seed)


def tokens(s: str, d: str) -> str:
    """Whitespace tokenization, empty tokens removed."""
    if d == sg.SPARK:
        return f"filter(split({s}, ' '), t -> t != '')"
    return f"list_filter(string_split({s}, ' '), t -> t != '')"


def word_shingles(toks: str, w: int, d: str) -> str:
    """Array of w-word shingles (space-joined) from a token array."""
    if d == sg.SPARK:
        parts = " , ' ', ".join(f"{toks}[i + {j}]" for j in range(w))
        # out-of-bounds toks[i+j] is NULL -> concat is NULL -> filtered,
        # so short docs yield [] (sequence() cannot go negative)
        return (f"filter(transform(sequence(0, greatest(size({toks}) - {w}"
                f", 0)), i -> concat({parts})), x -> x IS NOT NULL)")
    parts = " || ' ' || ".join(f"({toks})[i + {j}]" for j in range(w))
    return (f"list_transform(range(1, greatest(length({toks}) - {w - 2}, "
            f"1)), i -> {parts})")


def char_ngrams(s: str, n: int, d: str) -> str:
    """Array of character n-grams of a string."""
    if d == sg.SPARK:
        return (f"transform(sequence(1, greatest(length({s}) - {n - 1}, "
                f"1)), i -> substring({s}, i, {n}))")
    return (f"list_transform(range(1, greatest(length({s}) - {n - 2}, "
            f"2)), i -> substr({s}, i, {n}))")


def hash_array(arr: str, d: str, seed: int = SEED) -> str:
    """Hash each string element of an array."""
    inner = text_hash("x", d, seed)
    if d == sg.SPARK:
        return f"transform({arr}, x -> {inner})"
    return f"list_transform({arr}, x -> {inner})"


def minhash_perm(hashes: str, a: int, b: int, d: str) -> str:
    """min over (a*h + b) % P of an int64 hash array (one permutation).

    a must be < ~1000 so a*h stays below 2^63 (h < 2^53).
    """
    mapped = (f"transform({hashes}, h -> ({a} * h + {b}) % {P})"
              if d == sg.SPARK else
              f"list_transform({hashes}, h -> ({a} * h + {b}) % {P})")
    if d == sg.SPARK:
        return f"array_min({mapped})"
    return f"list_min({mapped})"
