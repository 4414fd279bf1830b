"""Vector math over ArrayType(Float) embedding columns.

All expressions compute in DOUBLE with a sequential left fold so the
result is bit-identical to a sequential C double loop (what the DuckDB
oracle computes) — rounding in query outputs then makes the comparison
fully robust.

These are the JVM-side (codegen) primitives. For large-scale brute-force
similarity the matrix path in operators/similarity.py (pandas UDF +
numpy) trades per-row expressions for BLAS batches.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _dbl(x: Column) -> Column:
    return x.cast("double")


def dot_expr(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ in double (sequential fold, init 0.0)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: _dbl(x) * _dbl(y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def sq_norm_expr(a: Column) -> Column:
    return F.aggregate(a, F.lit(0.0), lambda acc, x: acc + _dbl(x) * _dbl(x))


def norm_expr(a: Column) -> Column:
    return F.sqrt(sq_norm_expr(a))


def cosine_expr(a: Column, b: Column) -> Column:
    """cos(a, b); NaN-safe only insofar as inputs are non-zero vectors."""
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def lit_vector(values: list[float]) -> Column:
    """A literal double array column (for broadcast-free plane
    constants), built as ONE parsed SQL expression — the obvious
    `F.array(*[F.lit(v) ...])` costs a py4j round-trip per ELEMENT
    (measured: seconds of pure build time for a 64-entry codebook of
    64-dim vectors). String-cast literals round-trip any double
    exactly (Python repr guarantees it) and parse as DOUBLE."""
    body = ",".join(f"CAST('{float(v)!r}' AS DOUBLE)" for v in values)
    return F.expr(f"array({body})")


# --- SQL fragment generators (DuckDB oracle side) --------------------------

def sql_dot(a_expr: str, b_expr: str) -> str:
    """DuckDB: double-precision dot product (same fold order as dot_expr)."""
    return (
        f"list_dot_product(CAST({a_expr} AS DOUBLE[]), CAST({b_expr} AS DOUBLE[]))"
    )


def sql_norm(a_expr: str) -> str:
    return f"sqrt({sql_dot(a_expr, a_expr)})"


def sql_lit_vector(values: list[float]) -> str:
    body = ", ".join(repr(float(v)) for v in values)
    return f"CAST([{body}] AS DOUBLE[])"


def lit_matrix(rows: list[list[float]]) -> Column:
    """2-D literal array<array<double>> built as ONE parsed SQL
    expression. The obvious `F.array(*[F.lit(row) ...])` costs one
    py4j round-trip per row (~3.5 s for a 64×64 bank, measured);
    parsing a single generated string is milliseconds. The `E0`
    exponent suffix forces DOUBLE literals — a bare decimal literal
    parses as DECIMAL in Spark SQL and would change the arithmetic.
    """
    body = ",".join(
        "array(" + ",".join(f"{x:.6f}E0" for x in r) + ")" for r in rows
    )
    return F.expr(f"array({body})")
