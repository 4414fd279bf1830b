"""Portable rounding / fixed-point helpers.

Why not ``F.round``: Spark's round(double, n) goes through
``BigDecimal.valueOf`` — it rounds the *shortest decimal representation*
of the double — while DuckDB (and C) round the *binary value*. The two
disagree on any value whose shortest repr ends in 5 at the target digit
(common for money data). ``pround`` instead computes
``floor(x·10ⁿ + 0.5) / 10ⁿ`` — every step is an IEEE-754 primitive, so
any engine computing from the same input double produces the same
output double, bit for bit.

``cents`` converts 2-decimal money columns to exact int64 — aggregates
over cents are exact integers, making sums/avgs engine-independent by
construction (no float summation order anywhere). At true 100 TB scale
cent-sums of 1e11-unit products can overflow int64 — production would
use DECIMAL(38, n); the helpers note the bound.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def pround(col: Column, n: int) -> Column:
    """Portable round-half-up: floor(x·10ⁿ + 0.5) / 10ⁿ (double)."""
    scale = float(10**n)
    return (F.floor(col * F.lit(scale) + F.lit(0.5))).cast("double") / F.lit(scale)


def cents(col: Column, decimals: int = 2) -> Column:
    """Exact fixed-point int64 for a ≤`decimals`-decimal double column."""
    scale = float(10**decimals)
    return F.floor(col * F.lit(scale) + F.lit(0.5)).cast("long")


def sql_pround(expr: str, n: int) -> str:
    scale = f"1e{n}" if n > 0 else "1.0"
    return f"(floor(({expr}) * {scale} + 0.5) / {scale})"


def sql_cents(expr: str, decimals: int = 2) -> str:
    scale = f"1e{decimals}" if decimals > 0 else "1.0"
    return f"CAST(floor(({expr}) * {scale} + 0.5) AS BIGINT)"
