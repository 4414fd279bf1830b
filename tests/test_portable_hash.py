"""Cross-engine contract of the portable hash family: the md5-prefix
token hash and affine permutations must be bit-identical between Spark
and DuckDB on arbitrary strings — this equivalence is what makes the
MinHash/SimHash/Jaccard oracles exact rather than approximate.

Also bounds the engine's approximate operators: approx_count_distinct
must stay within its advertised error of the exact count.
"""

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from kafka_parquet_writer_spark.catalog import load_table
from kafka_parquet_writer_spark.functions import texthash as TH

# printable-ish strings incl. unicode; md5 operates on UTF-8 bytes in both
_strings = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), min_size=0, max_size=40
)


@settings(max_examples=20, deadline=None)
@given(st.lists(_strings, min_size=1, max_size=20, unique=True))
def test_portable_hash_matches_duckdb(spark, values):
    sdf = spark.createDataFrame([(v,) for v in values], "s string").select(
        "s", TH.portable_tid(F.col("s")).alias("tid")
    )
    got = {r["s"]: r["tid"] for r in sdf.collect()}

    con = duckdb.connect()
    expr = TH.sql_portable_tid("s")
    want = {}
    for v in values:
        con.execute(f"SELECT {expr} AS tid FROM (SELECT ? AS s)", [v])
        want[v] = con.fetchone()[0]
    assert got == want


def test_affine_hash_matches_sql_fragment(spark):
    coeffs = TH.minhash_coeffs(4, seed=99)
    ids = list(range(0, 2_000_000, 97_001))
    sdf = spark.createDataFrame([(i,) for i in ids], "tid long").select(
        "tid",
        *[
            TH.affine_hash(F.col("tid"), a, b).alias(f"h{k}")
            for k, (a, b) in enumerate(coeffs)
        ],
    )
    got = {r["tid"]: tuple(r[f"h{k}"] for k in range(4)) for r in sdf.collect()}
    con = duckdb.connect()
    for i in ids:
        row = con.execute(
            "SELECT "
            + ", ".join(TH.sql_affine("tid", a, b) for a, b in coeffs)
            + f" FROM (SELECT CAST({i} AS BIGINT) AS tid)"
        ).fetchone()
        assert got[i] == tuple(row), i


def test_approx_count_distinct_within_error(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    exact = ev.select(F.countDistinct("event_id")).collect()[0][0]
    approx = ev.select(
        F.approx_count_distinct("event_id", rsd=0.05)
    ).collect()[0][0]
    assert abs(approx - exact) <= 0.15 * exact  # 3σ of the 5% rsd
