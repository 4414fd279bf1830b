"""Portable text hashing primitives: tokenization, shingling, MinHash,
SimHash coefficients.

Two hash families are exposed:

- **Production path** (``xxhash64``): Spark's built-in ``xxhash64``
  maps shingle strings straight to 64-bit ints — cheapest per row.
  Not oracle-portable (DuckDB has no xxhash64).
- **Portable path** (``portable_hash64``): first 15 hex digits of md5
  parsed as a 60-bit int. Stateless per-row expression — same scale
  shape as xxhash64 (no dictionary, no global ordering, no join), just
  a pricier hash — and DuckDB computes the identical value, so the
  oracle matches bit-for-bit. Affine permutations
  ``(a·id + b) mod P`` on top are pure integer arithmetic in both
  engines.

Coefficients come from a seeded numpy RNG and are embedded as literals
in BOTH the Spark plan and the generated oracle SQL, so both engines
compute the same permutations.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

#: Mersenne prime 2^31 - 1; products a·id stay far below 2^63.
MERSENNE_P = 2_147_483_647

TOKEN_SPLIT_RE = r"\s+"


def minhash_coeffs(k: int, seed: int = 42) -> list[tuple[int, int]]:
    """k affine permutation coefficient pairs (a, b), a ∈ [1, P), b ∈ [0, P)."""
    rng = np.random.RandomState(seed)
    return [
        (int(rng.randint(1, MERSENNE_P)), int(rng.randint(0, MERSENNE_P)))
        for _ in range(k)
    ]


def words_expr(text_col: str | Column) -> Column:
    """Lower-cased whitespace tokens, empties removed. ArrayType(String)."""
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.filter(F.split(F.lower(col), TOKEN_SPLIT_RE), lambda x: x != "")


def word_shingles_expr(text_col: str | Column, n: int = 2) -> Column:
    """Distinct word n-gram shingles as space-joined strings.

    Built with slice+zip_with (no explode) so it stays a per-row
    expression. n=2: zip(words, words[1:]).
    """
    ws = words_expr(text_col)
    size = F.size(ws)
    if n == 1:
        return F.array_distinct(ws)
    if n == 2:
        m = F.greatest(size - 1, F.lit(0))
        return F.array_distinct(
            F.zip_with(
                F.slice(ws, 1, m),
                F.slice(ws, 2, m),
                lambda x, y: F.concat(x, F.lit(" "), y),
            )
        )
    if n == 3:
        m = F.greatest(size - 2, F.lit(0))
        return F.array_distinct(
            F.zip_with(
                F.zip_with(
                    F.slice(ws, 1, m),
                    F.slice(ws, 2, m),
                    lambda x, y: F.concat(x, F.lit(" "), y),
                ),
                F.slice(ws, 3, m),
                lambda xy, z: F.concat(xy, F.lit(" "), z),
            )
        )
    raise ValueError(f"unsupported shingle size {n}")


def affine_hash(id_col: Column, a: int, b: int) -> Column:
    """(a·id + b) mod P in 64-bit integer arithmetic (portable)."""
    return (id_col.cast("long") * F.lit(a) + F.lit(b)) % F.lit(MERSENNE_P)


def portable_hash64(str_col: Column) -> Column:
    """String → 60-bit integer, computable identically in Spark and
    DuckDB: the first 15 hex digits of md5, parsed big-endian.

    This replaces the dictionary (distinct + global row_number sort)
    with a stateless per-row expression — the scale-correct token-id
    assignment. 60 bits keeps ``conv``'s result inside signed int64.
    Spark side: ``conv(substring(md5(s), 1, 15), 16, 10)``.
    """
    return F.conv(F.substring(F.md5(str_col), 1, 15), 16, 10).cast("long")


def portable_tid(str_col: Column) -> Column:
    """portable_hash64 reduced into [0, P) so affine products stay far
    below 2^63 (a < P ⇒ a·tid < 2^62)."""
    return portable_hash64(str_col) % F.lit(MERSENNE_P)


# --- SQL fragment generators (DuckDB oracle side) --------------------------

def sql_words(text_expr: str) -> str:
    """DuckDB expression for the same token array as words_expr."""
    return (
        f"list_filter(regexp_split_to_array(lower({text_expr}), '\\s+'),"
        f" x -> x <> '')"
    )


def sql_shingle_cte(table: str, id_col: str, text_col: str, n: int = 2) -> str:
    """DuckDB CTE body producing (doc, shingle) distinct pairs, matching
    word_shingles_expr + explode on the Spark side."""
    w = sql_words(text_col)
    if n == 1:
        return (
            f"SELECT DISTINCT {id_col} AS doc, unnest({w}) AS shingle FROM {table}"
        )
    joiner = " || ' ' || ".join(f"w[i + {i}]" for i in range(n))
    # scalar range(1, len-k) is end-exclusive → indices 1..len-n+1
    return f"""
    SELECT DISTINCT doc,
           unnest(list_transform(range(1, len(w) - {n - 2}),
                                 i -> {joiner})) AS shingle
    FROM (SELECT {id_col} AS doc, {w} AS w FROM {table})
    """


def sql_affine(id_expr: str, a: int, b: int) -> str:
    return f"((CAST({id_expr} AS BIGINT) * {a} + {b}) % {MERSENNE_P})"


def sql_portable_hash64(str_expr: str) -> str:
    """DuckDB expression equal to portable_hash64: positional hex parse
    of the first 15 md5 digits (DuckDB has no base-conversion builtin)."""
    terms = " + ".join(
        f"(strpos('0123456789abcdef', substring(md5({str_expr}), {i + 1}, 1)) - 1)"
        f" * {16 ** (15 - 1 - i)}"
        for i in range(15)
    )
    return f"({terms})"


def sql_portable_tid(str_expr: str) -> str:
    return f"({sql_portable_hash64(str_expr)} % {MERSENNE_P})"
