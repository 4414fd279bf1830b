"""Registry of declared queries and their DuckDB oracle SQL.

Every operator from SURVEY.md §2B registers here via the ``@query``
decorator; ``__spark_entry__.py`` exposes the two dicts to the driver.
Oracle SQL is ANSI SQL runnable by DuckDB against the same parquet
tables (views: region nation customer supplier part orders lineitem
events documents embeddings).

Design rule enforced socially by this module: the Spark implementation
and its oracle live side-by-side in the same source file, with every
computed column aliased identically in both (the driver sorts columns
by name before value-hashing).
"""

from __future__ import annotations

import textwrap
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` as queries()[name]; optionally its DuckDB oracle SQL.

    ``oracle=None`` ⇒ the driver records a weaker rows-only check
    (used for approximate / streaming / non-SQL-expressible operators).
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = textwrap.dedent(oracle).strip()
        return fn

    return deco


def load_all_operators() -> None:
    """Import every operator module so registration side effects run."""
    from kafka_parquet_writer_spark import operators  # noqa: F401
