"""Oracle output-dtype sweep: fail on DuckDB-widened column types.

The driver's correctness gate hashes oracle VALUES dtype-sensitively:
a DuckDB HUGEINT (int128) or widened DECIMAL column hashes differently
from the Spark bigint/double it numerically equals, so an oracle can be
value-correct and still fail the gate. DuckDB widens silently —
``sum(BIGINT)`` is HUGEINT, and the widening propagates through any
downstream expression (``//``, ``LEAST``, ``CASE``, arithmetic), which
is exactly how `mixture_sample` failed round 3 after a sum-only sweep
passed it.

This sweep closes the class: it PREPAREs (or zero-row-executes) every
registered oracle against the sf0.001 fixtures and fails if ANY output
column — whatever expression produced it — has a type outside the
allowlist of types the driver's comparison treats as Spark-equivalent.

Usage:  python tools/oracle_dtypes.py [key ...]     # default: all
Exit:   0 = clean, 1 = violations (printed per key/column).
Also importable: ``sweep()`` returns the violation list for pytest.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_DTYPE_SF", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# DuckDB type names whose Python values hash identically to the Spark
# value of the matching Spark type. Everything else (HUGEINT, DECIMAL,
# UHUGEINT, unsigned ints...) is a driver-hash hazard and fails.
ALLOWED_TYPES = {
    "BOOLEAN",
    "TINYINT", "SMALLINT", "INTEGER", "BIGINT",
    "FLOAT", "DOUBLE",
    "VARCHAR",
    "DATE", "TIME", "TIMESTAMP", "TIMESTAMP_NS", "TIMESTAMP WITH TIME ZONE",
    "BLOB",
    "INTERVAL",
}


def _type_ok(type_str: str) -> bool:
    t = type_str.upper()
    # nested types are fine as long as their element types are; check
    # every identifier inside LIST/STRUCT/MAP spellings.
    for bad in ("HUGEINT", "DECIMAL", "UINTEGER", "UBIGINT", "USMALLINT",
                "UTINYINT"):
        if bad in t:
            return False
    base = t.split("(")[0].strip()
    if base in ("LIST", "STRUCT", "MAP") or t.endswith("[]"):
        return True  # inner bad types caught by the substring scan above
    return base in ALLOWED_TYPES or t in ALLOWED_TYPES


def sweep(only: set[str] | None = None) -> list[tuple[str, str, str]]:
    """Return [(key, column, duckdb_type)] violations across all oracles."""
    import duckdb

    from kafka_parquet_writer_spark.registry import ORACLES, load_all_operators

    load_all_operators()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    violations: list[tuple[str, str, str]] = []
    for name, sql in ORACLES.items():
        if only and name not in only:
            continue
        # LIMIT-0 wrap resolves output types without computing the query;
        # falls back to a full execute for statements that reject wrapping.
        try:
            rel = con.sql(f"SELECT * FROM ({sql}) AS _t LIMIT 0")
            cols = list(zip(rel.columns, (str(t) for t in rel.types)))
        except Exception:
            res = con.execute(sql)
            cols = [(d[0], str(d[1])) for d in res.description]
        for col, dtype in cols:
            if not _type_ok(dtype):
                violations.append((name, col, dtype))
    return violations


def main() -> int:
    only = set(sys.argv[1:]) or None
    violations = sweep(only)
    if violations:
        for name, col, dtype in violations:
            print(f"FAIL  {name}: column `{col}` is {dtype} "
                  f"(driver hash hazard — CAST it in the oracle)")
        print(f"\n{len(violations)} violation(s)")
        return 1
    print("all oracle output dtypes clean")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
