"""pagerank_edges structural properties on a known graph."""

from pyspark.sql import functions as F

from kafka_parquet_writer_spark.operators.graph import pagerank_edges


def _sym(spark, und):
    e = und + [(b, a) for a, b in und]
    return spark.createDataFrame(e, "src long, dst long")


def test_pagerank_center_of_star_ranks_highest(spark):
    # star: 0 connected to 1..4 — node 0 must dominate
    edges = _sym(spark, [(0, i) for i in range(1, 5)])
    rows = {r["node"]: r for r in pagerank_edges(edges).collect()}
    assert rows[0]["degree"] == 4
    leaves = [rows[i]["rank"] for i in range(1, 5)]
    assert all(rows[0]["rank"] > l for l in leaves)
    assert len(set(leaves)) == 1  # symmetric leaves tie exactly

    # probability mass ≈ 1 (fixed-point floor loses ≤ a few micro-units
    # per node per round)
    total = sum(r["rank"] for r in rows.values())
    assert 0.9 < total <= 1.0


def test_pagerank_path_middle_beats_ends(spark):
    edges = _sym(spark, [(1, 2), (2, 3)])
    rows = {r["node"]: r["rank"] for r in pagerank_edges(edges).collect()}
    assert rows[2] > rows[1] == rows[3]
