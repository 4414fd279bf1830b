"""Graph analytics over the near-duplicate document graph.

`dedup_clusters` (operators/dedup.py) answers "which docs are the same
cluster"; PageRank answers "which docs are CENTRAL" — a corpus-quality
/ canonical-document signal a pre-training pipeline uses to pick the
representative worth keeping (highest-centrality member) or to weight
sampling. The graph is the verified MinHash pair set, symmetrized.

Determinism discipline (see memory: oracle-portability-rules): a fixed
iteration count is UNROLLED into the plan — 5 chained join+aggregate
stages — and every rank is int64 micro-units (1e-6): the per-edge
contribution is floor(85·r / (100·deg)) and the damping base is
floor(0.15·1e6 / N), so both engines sum INTEGERS in every round and
the result is bit-identical regardless of partitioning or order. The
DuckDB oracle is the literally-unrolled identical algebra.

100 TB shape: each iteration is one shuffle join (ranks ⋈ edges on
src) + one aggregate (sum by dst) with map-side partials; the edge set
is scanned once per round via exchange reuse. Degree is attached to
edges ONCE before the loop. For web-scale graphs you add dangling-mass
redistribution and convergence checks (GraphFrames/Pregel territory);
the fixed-round unrolled form is the bounded-latency batch variant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_parquet_writer_spark.operators.dedup import (
    _minhash_oracle,
    dedup_minhash_lsh,
)
from kafka_parquet_writer_spark.functions.portable import pround
from kafka_parquet_writer_spark.registry import query

PR_ITERS = 5
PR_DAMP_NUM = 85      # damping 0.85 as an integer ratio (85/100)
PR_SCALE = 1_000_000  # rank fixed-point scale (micro-units)


def pagerank_edges(edges: DataFrame, iters: int = PR_ITERS) -> DataFrame:
    """Fixed-point PageRank over a symmetric (src, dst) edge set.

    Returns (node, degree, rank) with rank summing to ≈1 across nodes.
    The caller provides edges already symmetrized; nodes are the
    distinct sources (every node of a symmetric graph appears as src).

    The edge set is localCheckpointed before the loop: the unrolled
    iterations would otherwise re-plan (and, without exchange reuse,
    re-execute) the upstream pair-generation pipeline once per round —
    the same lineage-truncation discipline as connected_components.
    """
    edges = edges.localCheckpoint()
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # the LOOP INVARIANT is edges-with-degree, so checkpoint THAT:
    # left un-materialized, every unrolled round re-executes the deg
    # aggregate + join subtree (measured: 23 edge scans / 34 exchanges
    # in the 5-round plan; 8 scans / 24 exchanges with the invariant
    # pinned) — the GraphX pattern of materializing the degree-
    # annotated edge set once before iterating
    edges_d = edges.join(deg, "src").localCheckpoint()
    nodes = edges.select(F.col("src").alias("node")).distinct()
    nn = nodes.agg(F.count(F.lit(1)).alias("n"))
    ranks = nodes.crossJoin(F.broadcast(nn)).select(
        "node",
        F.floor(F.lit(float(PR_SCALE)) / F.col("n")).cast("long").alias("r"),
        F.floor(
            F.lit(float(PR_SCALE) * (100 - PR_DAMP_NUM) / 100) / F.col("n")
        ).cast("long").alias("base"),
    )
    for _ in range(iters):
        contrib = ranks.join(
            edges_d, ranks["node"] == edges_d["src"]
        ).select(
            "dst",
            F.floor(
                F.lit(float(PR_DAMP_NUM)) * F.col("r") / (100 * F.col("deg"))
            ).cast("long").alias("c"),
        )
        summed = contrib.groupBy("dst").agg(F.sum("c").alias("m"))
        ranks = (
            ranks.select("node", "base")
            .join(summed, ranks["node"] == summed["dst"], "left")
            .select(
                "node",
                "base",
                (F.col("base") + F.coalesce(F.col("m"), F.lit(0))).alias("r"),
            )
        )
    return (
        ranks.join(deg, ranks["node"] == deg["src"])
        .select(
            "node",
            F.col("deg").alias("degree"),
            pround(F.col("r").cast("double") / PR_SCALE, 6).alias("rank"),
        )
    )


def _pagerank_oracle() -> str:
    base_frac = float(PR_SCALE) * (100 - PR_DAMP_NUM) / 100
    cte = [
        f"pairs AS MATERIALIZED ({_minhash_oracle()})",
        "sym AS MATERIALIZED (SELECT d1 AS src, d2 AS dst FROM pairs"
        " UNION ALL SELECT d2, d1 FROM pairs)",
        "deg AS MATERIALIZED (SELECT src, count(*) AS deg FROM sym GROUP BY src)",
        "nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM sym)",
        "nn AS MATERIALIZED (SELECT count(*) AS n FROM nodes)",
        f"r0 AS MATERIALIZED (SELECT node,"
        f" CAST(floor({float(PR_SCALE)!r} / n) AS BIGINT) AS r,"
        f" CAST(floor({base_frac!r} / n) AS BIGINT) AS base"
        f" FROM nodes CROSS JOIN nn)",
    ]
    for i in range(1, PR_ITERS + 1):
        cte.append(
            f"c{i} AS MATERIALIZED (SELECT s.dst,"
            f" sum(CAST(floor({float(PR_DAMP_NUM)!r} * r.r / (100 * d.deg))"
            f" AS BIGINT)) AS m"
            f" FROM r{i-1} r JOIN sym s ON s.src = r.node"
            f" JOIN deg d ON d.src = s.src GROUP BY s.dst)"
        )
        cte.append(
            f"r{i} AS MATERIALIZED (SELECT p.node, p.base,"
            f" p.base + coalesce(c.m, 0) AS r"
            f" FROM r{i-1} p LEFT JOIN c{i} c ON c.dst = p.node)"
        )
    body = ",\n    ".join(cte)
    return f"""
    WITH {body}
    SELECT r.node, d.deg AS degree,
           (floor((CAST(r.r AS DOUBLE) / {PR_SCALE}) * 1e6 + 0.5) / 1e6)
             AS rank
    FROM r{PR_ITERS} r JOIN deg d ON d.src = r.node
    """


@query("graph_pagerank", oracle=_pagerank_oracle())
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank centrality over the verified near-duplicate graph —
    5 unrolled iterations, damping 0.85, int64 fixed-point throughout
    (see module docstring for why that makes an iterative graph
    algorithm value-hash-verifiable across engines)."""
    pairs = dedup_minhash_lsh(spark, sf_dir).select("d1", "d2")
    sym = pairs.select(
        F.col("d1").alias("src"), F.col("d2").alias("dst")
    ).unionAll(
        pairs.select(F.col("d2").alias("src"), F.col("d1").alias("dst"))
    )
    return pagerank_edges(sym)


def _triangles_oracle() -> str:
    return f"""
    WITH pairs AS MATERIALIZED (SELECT d1, d2 FROM ({_minhash_oracle()})),
    tri AS MATERIALIZED (
      SELECT e1.d1 AS a, e1.d2 AS b, e2.d2 AS c
      FROM pairs e1
      JOIN pairs e2 ON e2.d1 = e1.d2
      JOIN pairs e3 ON e3.d1 = e1.d1 AND e3.d2 = e2.d2
    ),
    nodes AS (SELECT DISTINCT d1 AS node FROM pairs
              UNION SELECT DISTINCT d2 FROM pairs),
    per AS (
      SELECT node, count(*) AS n_tri FROM (
        SELECT a AS node FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri
      ) GROUP BY node
    )
    SELECT n.node, CAST(coalesce(p.n_tri, 0) AS BIGINT) AS n_tri
    FROM nodes n LEFT JOIN per p USING (node)
    """


@query("graph_triangles", oracle=_triangles_oracle())
def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle participation counts over the verified near-duplicate
    graph — the local clustering signal that separates tight duplicate
    cliques (templated/boilerplate families) from chains of borderline
    matches; pipelines treat high-triangle docs as high-confidence
    duplicates worth a single representative.

    Scale shape: edges stay oriented d1 < d2, so each triangle
    {{a<b<c}} is enumerated exactly once as (a,b)⋈(b,c)⋈(a,c) — two
    equi-joins on the (already-bucketed, vocabulary-small) verified
    pair set, no symmetrization blow-up, no per-node adjacency
    materialization. Production graphs order by degree instead of id
    (the standard compact-forward optimization) — same plan, different
    orientation key. Both joins broadcast at dedup-graph densities.
    """
    pairs = (
        dedup_minhash_lsh(spark, sf_dir)
        .select("d1", "d2")
        .localCheckpoint()
    )
    e1 = pairs.select(F.col("d1").alias("a"), F.col("d2").alias("b"))
    e2 = pairs.select(F.col("d1").alias("b"), F.col("d2").alias("c"))
    e3 = pairs.select(F.col("d1").alias("a"), F.col("d2").alias("c"))
    tri = e1.join(e2, "b").join(e3, ["a", "c"])
    nodes = (
        pairs.select(F.col("d1").alias("node"))
        .union(pairs.select("d2"))
        .distinct()
    )
    per = (
        tri.select(F.col("a").alias("node"))
        .unionAll(tri.select("b"))
        .unionAll(tri.select("c"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_tri"))
    )
    return nodes.join(per, "node", "left").select(
        "node", F.coalesce(F.col("n_tri"), F.lit(0)).cast("long").alias("n_tri")
    )
