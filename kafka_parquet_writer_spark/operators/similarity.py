"""Similarity search over embedding vectors (north-star surface).

Two paths, same API shape:
- **Exact brute-force top-k** — the correctness baseline. Quadratic;
  fine for verification scale, and still the right choice when one side
  is small (queries broadcast against the corpus).
- **LSH-bucketed ANN** — random-hyperplane signatures turn candidate
  generation into an equi-join on bucket id; cost ∝ Σ bucket² instead
  of |Q|×|C|. The hyperplanes are seeded literals embedded in both the
  Spark plan and the oracle SQL, so even the *approximate* operator is
  value-hash-verified (both engines run the identical algorithm).

All cosine math is double-precision with rounding to 6 digits before
ranking, so rank order is engine-independent (ties broken by vec_id).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from kafka_parquet_writer_spark.catalog import load_table
from kafka_parquet_writer_spark.functions import vector as V
from kafka_parquet_writer_spark.functions.portable import pround, sql_pround
from kafka_parquet_writer_spark.registry import query
from kafka_parquet_writer_spark.session import repartition_for_compute

EMBED_DIM = 64
TOPK = 5
N_QUERIES = 10  # query side: vec_id < N_QUERIES

ANN_PLANES_SEED = 202
ANN_N_PLANES = 4  # 16 buckets — sized for the test corpus; more at scale
ANN_TOPK = 3
ANN_N_QUERIES = 20


def _ann_planes() -> list[list[float]]:
    rng = np.random.RandomState(ANN_PLANES_SEED)
    planes = rng.randn(ANN_N_PLANES, EMBED_DIM)
    return [[round(float(x), 6) for x in p] for p in planes]


ANN_PLANES = _ann_planes()


#: shared by similarity_topk (expression path) and
#: similarity_topk_blas (numpy/Arrow path) — one string, so the
#: "same oracle proves the fast path exact" claim can't drift
_TOPK_ORACLE = f"""
    WITH e AS (
      SELECT vec_id,
             CAST(embedding AS DOUBLE[]) AS v,
             sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                   CAST(embedding AS DOUBLE[]))) AS nrm
      FROM embeddings
    ),
    scored AS (
      SELECT q.vec_id AS q_id, c.vec_id AS n_id,
             (floor((list_dot_product(q.v, c.v) / (q.nrm * c.nrm)) * 1e6 + 0.5) / 1e6) AS cos
      FROM e q JOIN e c ON q.vec_id < {N_QUERIES} AND c.vec_id <> q.vec_id
    )
    SELECT q_id, n_id, cos,
           CAST(row_number() OVER (PARTITION BY q_id
                                   ORDER BY cos DESC, n_id) AS INTEGER) AS rnk
    FROM scored
    QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) <= {TOPK}
    """


@query(
    "similarity_topk",
    oracle=_TOPK_ORACLE,
)
def similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k: each query vector's 5 nearest neighbors.

    Scale shape: the query side is broadcast (it is small by
    construction); the corpus is scanned once; per-query heaps via
    window row_number ≤ k — no global sort, no corpus self-join.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qv")
    )
    # corpus side carries the per-row cosine work — spread it across
    # cores even when the source is a single parquet split
    c = repartition_for_compute(emb, F.col("vec_id")).select(
        F.col("vec_id").alias("n_id"), F.col("embedding").alias("cv")
    )
    cos = pround(V.cosine_expr(F.col("qv"), F.col("cv")), 6)
    scored = (
        F.broadcast(q)
        .join(c, F.col("n_id") != F.col("q_id"))
        .select("q_id", "n_id", cos.alias("cos"))
    )
    w = W.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("n_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= TOPK)
        .select("q_id", "n_id", "cos", "rnk")
    )


def _ann_oracle() -> str:
    dots = [
        f"list_dot_product(v, {V.sql_lit_vector(p)})" for p in ANN_PLANES
    ]
    bucket = " + ".join(
        f"(CASE WHEN {d} >= 0 THEN {1 << j} ELSE 0 END)" for j, d in enumerate(dots)
    )
    return f"""
    WITH e AS (
      SELECT vec_id,
             CAST(embedding AS DOUBLE[]) AS v,
             sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                   CAST(embedding AS DOUBLE[]))) AS nrm
      FROM embeddings
    ),
    b AS (SELECT vec_id, v, nrm, {bucket} AS bucket FROM e),
    scored AS (
      SELECT q.vec_id AS q_id, c.vec_id AS n_id,
             (floor((list_dot_product(q.v, c.v) / (q.nrm * c.nrm)) * 1e6 + 0.5) / 1e6) AS cos
      FROM b q JOIN b c
        ON q.bucket = c.bucket AND q.vec_id < {ANN_N_QUERIES}
       AND c.vec_id <> q.vec_id
    )
    SELECT q_id, n_id, cos,
           CAST(row_number() OVER (PARTITION BY q_id
                                   ORDER BY cos DESC, n_id) AS INTEGER) AS rnk
    FROM scored
    QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id)
            <= {ANN_TOPK}
    """


@query("similarity_ann_lsh", oracle=_ann_oracle())
def similarity_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via random-hyperplane LSH: bucket = sign-bit signature of 4
    seeded hyperplane projections; candidates are same-bucket only, then
    exact cosine re-rank, top-3.

    Scale: candidate generation is an equi-join on bucket — shuffle on a
    16-value key here, 2^p values in production (p sized so buckets fit
    executor memory). Recall is tunable via multi-probe or repeated
    plane sets (OR-amplification); the oracle runs the identical
    single-probe algorithm so results hash-match.
    """
    # bucket assignment does 4 × 64-dim dot products per row — give the
    # map side full core parallelism regardless of input split count
    emb = repartition_for_compute(
        load_table(spark, sf_dir, "embeddings"), F.col("vec_id")
    )
    v = F.col("embedding")
    bucket = None
    for j, p in enumerate(ANN_PLANES):
        bit = (V.dot_expr(v, V.lit_vector(p)) >= 0).cast("int") * F.lit(1 << j)
        bucket = bit if bucket is None else bucket + bit
    b = emb.select("vec_id", "embedding", bucket.alias("bucket"))
    q = b.filter(F.col("vec_id") < ANN_N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("qv"),
        F.col("bucket").alias("qb"),
    )
    c = b.select(
        F.col("vec_id").alias("n_id"),
        F.col("embedding").alias("cv"),
        F.col("bucket").alias("cb"),
    )
    cos = pround(V.cosine_expr(F.col("qv"), F.col("cv")), 6)
    scored = q.join(
        c, (F.col("qb") == F.col("cb")) & (F.col("n_id") != F.col("q_id"))
    ).select("q_id", "n_id", cos.alias("cos"))
    w = W.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("n_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= ANN_TOPK)
        .select("q_id", "n_id", "cos", "rnk")
    )


IVF_SEED = 303
IVF_CELLS = 8
IVF_PROBE = 2
IVF_TOPK = 3
IVF_N_QUERIES = 20


def _ivf_centroids() -> list[list[float]]:
    rng = np.random.RandomState(IVF_SEED)
    cs = rng.randn(IVF_CELLS, EMBED_DIM)
    return [[round(float(x), 6) for x in c] for c in cs]


IVF_CENTROIDS = _ivf_centroids()


def _ivf_cell_structs(v, centroids: list[list[float]] | None = None):
    """Array of (l2-score, cell-idx) structs vs every centroid.
    score_j = ‖c_j‖² − 2·v·c_j  (argmin over j ≡ nearest centroid;
    the ‖v‖² term is constant per row and dropped)."""
    cells = []
    for j, c in enumerate(centroids or IVF_CENTROIDS):
        c_norm2 = sum(x * x for x in c)
        score = F.lit(float(c_norm2)) - 2.0 * V.dot_expr(v, V.lit_vector(c))
        cells.append(F.struct(score.alias("s"), F.lit(j).alias("c")))
    return F.array(*cells)


#: symbolically-constant Column trees memoized per SparkContext —
#: (tag, applicationId, id(const)) -> (const strong-ref, columns)
_CONST_COL_MEMO: dict[tuple, tuple] = {}


def _memo_const_cols(tag: str, const, builder):
    """Memoize a Column tree that is a pure function of module-level
    constants (the centroid/codebook literal banks).

    Building these trees costs 0.3–1.0 s of py4j round-trips per
    invocation (measured r15 — data-INDEPENDENT, the same cost class
    the single-parse lit_matrix already shrank). Columns are immutable
    unresolved expression wrappers, safe to reuse across DataFrames
    and queries within one SparkContext; the key carries the
    applicationId so a restarted context rebuilds instead of touching
    stale JVM references, and id(const) with a strong reference held
    in the value so the id cannot be recycled while the entry lives.
    This caches EXPRESSIONS only — never data, plans-with-state, or
    results; every query still computes from the parquet inputs."""
    from pyspark import SparkContext

    sc = SparkContext._active_spark_context
    key = (tag, sc.applicationId if sc is not None else None, id(const))
    hit = _CONST_COL_MEMO.get(key)
    if hit is None:
        hit = (const, builder())
        _CONST_COL_MEMO[key] = hit
    return hit[1]


def kmeans_centroids(
    emb: DataFrame,
    n_cells: int,
    sample_fraction: float = 1.0,
    seed: int = IVF_SEED,
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Production IVF centroid selection: k-means on a sample (MLlib).

    The declared `similarity_ivf` query uses seeded random centroids so
    the DuckDB oracle can run the identical algorithm; a real deployment
    wants centroids that follow the data distribution — cells come out
    balanced, so probe cost (∝ Σ probed-cell sizes) stays predictable.

    Scale shape: train on a small sample (~1% — k-means only needs the
    coarse density landscape), which bounds driver/MLlib cost regardless
    of corpus size; the returned centroids are plain Python literals, so
    the assignment/probe/re-rank plan (`ivf_topk`) is byte-identical to
    the seeded-centroid plan — still per-row expressions + one equi-join.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    sample = emb if sample_fraction >= 1.0 else emb.sample(
        fraction=sample_fraction, seed=seed
    )
    feats = sample.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features")
    )
    model = KMeans(k=n_cells, seed=seed, maxIter=20).fit(feats)
    return [
        [round(float(x), 6) for x in center] for center in model.clusterCenters()
    ]


def ivf_topk(
    emb: DataFrame,
    centroids: list[list[float]],
    n_queries: int = IVF_N_QUERIES,
    probe: int = IVF_PROBE,
    topk: int = IVF_TOPK,
) -> DataFrame:
    """IVF assignment/probe/re-rank with caller-supplied centroids —
    the shared engine under `similarity_ivf` (seeded centroids, oracle-
    checked) and the k-means production path (`kmeans_centroids`)."""
    cells = emb.select(
        "vec_id",
        "embedding",
        _memo_const_cols(
            "ivf_cells",
            centroids,
            lambda: _ivf_cell_structs(F.col("embedding"), centroids),
        ).alias("cl"),
    )
    corpus = cells.select(
        F.col("vec_id").alias("n_id"),
        F.col("embedding").alias("cv"),
        F.array_min(F.col("cl"))["c"].alias("cell"),
    )
    probes = (
        cells.filter(F.col("vec_id") < n_queries)
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("embedding").alias("qv"),
            F.explode(F.slice(F.array_sort(F.col("cl")), 1, probe)).alias("p"),
        )
        .select("q_id", "qv", F.col("p.c").alias("cell"))
    )
    cos = pround(V.cosine_expr(F.col("qv"), F.col("cv")), 6)
    # each corpus vector lives in exactly one cell and a query's probe
    # rows carry distinct cells, so (q_id, n_id) pairs are unique
    scored = (
        F.broadcast(probes)
        .join(corpus, "cell")
        .filter(F.col("n_id") != F.col("q_id"))
        .select("q_id", "n_id", cos.alias("cos"))
    )
    w = W.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("n_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= topk)
        .select("q_id", "n_id", "cos")
    )


def _ivf_oracle() -> str:
    cell_structs = ", ".join(
        f"struct_pack(s := CAST({sum(x*x for x in c)!r} AS DOUBLE)"
        f" - 2.0 * list_dot_product(v, {V.sql_lit_vector(c)}), c := {j})"
        for j, c in enumerate(IVF_CENTROIDS)
    )
    return f"""
    WITH e AS (
      SELECT vec_id,
             CAST(embedding AS DOUBLE[]) AS v,
             sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                   CAST(embedding AS DOUBLE[]))) AS nrm
      FROM embeddings
    ),
    cells AS (SELECT vec_id, v, nrm, list_sort([{cell_structs}]) AS cl FROM e),
    corpus AS (SELECT vec_id, v, nrm, (cl[1]).c AS cell FROM cells),
    probes AS (
      SELECT vec_id, v, nrm, u.c AS cell
      FROM (SELECT vec_id, v, nrm, unnest(cl[1:{IVF_PROBE}]) AS u
            FROM cells WHERE vec_id < {IVF_N_QUERIES})
    ),
    scored AS (
      SELECT q.vec_id AS q_id, c.vec_id AS n_id,
             (floor((list_dot_product(q.v, c.v) / (q.nrm * c.nrm)) * 1e6 + 0.5) / 1e6) AS cos
      FROM probes q JOIN corpus c
        ON q.cell = c.cell AND c.vec_id <> q.vec_id
    )
    SELECT q_id, n_id, cos FROM scored
    QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id)
            <= {IVF_TOPK}
    """


@query("similarity_ivf", oracle=_ivf_oracle())
def similarity_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: corpus vectors are assigned to their nearest of 8
    seeded centroids (inverted file cells); each query probes its 2
    nearest cells and exact-cosine re-ranks within them, top-3.

    Scale shape: cell assignment is a pure per-row expression (argmin
    via array_min over (score, idx) structs — no shuffle, no explosion
    of the corpus); the join is an equi-join on cell id, cost
    ∝ Σ probed-cell sizes, never |Q|×|C|. In production the centroids
    come from a sampled k-means (MLlib KMeans on ~1% of rows) and
    IVF_CELLS scales to √N; the assignment/probe/re-rank plan is
    unchanged. The oracle runs the identical algorithm — centroids are
    seeded literals in both plans.

    A query's own vector can appear in a probed cell; it is excluded
    (n_id ≠ q_id), matching the brute-force operator's convention.
    """
    emb = repartition_for_compute(
        load_table(spark, sf_dir, "embeddings"), F.col("vec_id")
    )
    return ivf_topk(emb, IVF_CENTROIDS)


def brute_force_topk_matrix(
    emb: DataFrame, queries: list[tuple[int, list[float]]], k: int = 10
) -> DataFrame:
    """Vectorized brute-force top-k: the throughput path.

    The query set (small) ships to every partition as a numpy matrix;
    each Arrow batch of corpus vectors is scored with one BLAS matmul
    (`mapInPandas`), emitting (q_id, n_id, cos) candidates; a final
    window keeps global top-k per query. This is how you scan a 100 TB
    corpus: one pass, no shuffle until the (tiny) candidate set.
    """
    import pandas as pd

    q_ids = np.array([q[0] for q in queries], dtype=np.int64)
    q_mat = np.array([q[1] for q in queries], dtype=np.float64)
    q_nrm = np.linalg.norm(q_mat, axis=1, keepdims=True)
    if not np.all(q_nrm > 0.0):  # catches 0 and NaN norms
        raise ValueError("zero/NaN-norm query embedding: cosine undefined")
    q_mat = q_mat / q_nrm

    def score(batches):
        for pdf in batches:
            c_mat = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            norms = np.linalg.norm(c_mat, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            sims = (c_mat / norms) @ q_mat.T  # (batch, nq)
            # round to the module's 6-decimal contract BEFORE any
            # selection: ranking raw BLAS doubles would make rank
            # order (and top-k membership at the boundary) depend on
            # last-ulp summation-order differences vs the oracle's
            # sequential fold whenever two cosines round equal
            sims = np.floor(sims * 1e6 + 0.5) / 1e6
            ids = pdf["vec_id"].values
            n = len(pdf)
            top = min(k, n)
            for qi in range(len(q_ids)):
                # a query is never its own neighbor (the brute-force
                # operator's convention; rank-shifts everything if kept)
                col = sims[:, qi].copy()
                col[ids == q_ids[qi]] = -np.inf
                # per-batch top by (cos desc, n_id asc) — the same
                # total order the global window applies
                order = np.lexsort((ids, -col))[:top]
                idx = order[np.isfinite(col[order])]
                yield pd.DataFrame(
                    {
                        "q_id": q_ids[qi],
                        "n_id": ids[idx],
                        "cos": col[idx],
                    }
                )

    cands = emb.mapInPandas(score, schema="q_id long, n_id long, cos double")
    w = W.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("n_id"))
    return cands.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= k)


# --- product quantization (the compression half of IVF-PQ) -----------------

PQ_SEED = 404
PQ_M = 4          #: subspaces
PQ_SUBDIM = EMBED_DIM // PQ_M
PQ_K = 16         #: codebook entries per subspace


def _pq_codebooks() -> list[list[list[float]]]:
    rng = np.random.RandomState(PQ_SEED)
    return [
        [[round(float(x), 6) for x in c]
         for c in rng.randn(PQ_K, PQ_SUBDIM)]
        for _ in range(PQ_M)
    ]


PQ_CODEBOOKS = _pq_codebooks()


def _pq_oracle() -> str:
    best = []
    norms = []
    for m, book in enumerate(PQ_CODEBOOKS):
        sub = f"list_slice(v, {m * PQ_SUBDIM + 1}, {(m + 1) * PQ_SUBDIM})"
        structs = ", ".join(
            f"struct_pack(s := CAST({sum(x * x for x in c)!r} AS DOUBLE)"
            f" - 2.0 * list_dot_product({sub}, {V.sql_lit_vector(c)}),"
            f" c := {k})"
            for k, c in enumerate(book)
        )
        best.append(f"list_sort([{structs}])[1] AS b{m}")
        norms.append(f"list_dot_product({sub}, {sub}) AS n{m}")
    err = " + ".join(f"(b{m}.s + n{m})" for m in range(PQ_M))
    code = " + ".join(f"(b{m}.c) * {PQ_K ** m}" for m in range(PQ_M))
    return f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    s AS (SELECT vec_id, {", ".join(best)}, {", ".join(norms)} FROM e)
    SELECT vec_id,
           CAST({code} AS BIGINT) AS pq_code,
           {sql_pround(err, 6)} AS err6
    FROM s
    """


@query("embedding_pq", oracle=_pq_oracle())
def embedding_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization: each 64-dim embedding splits into 4
    subvectors of 16 dims; each subvector is assigned its nearest of 16
    seeded codebook centroids (argmin of ‖c‖² − 2·v·c, the constant
    ‖v‖² dropped from the compare and added back for the error). Emits
    the packed 16-bit PQ code and the exact squared reconstruction
    error — the compression half of an IVF-PQ index, which cuts vector
    storage 64·4 bytes → 2 bytes and makes the ANN candidate scan
    memory-resident at 100 TB.

    Scale shape: pure per-row expressions (no shuffle, no UDF) — the
    codebooks are plan literals (seeded here; production swaps in
    k-means-trained books exactly as `kmeans_centroids` does for IVF
    cells, same plan). The oracle runs the identical arithmetic; the
    sequential-fold dot product keeps doubles bit-identical.
    """
    emb = load_table(spark, sf_dir, "embeddings")

    def _build():
        v = F.col("embedding")
        errs, codes = [], []
        for m, book in enumerate(PQ_CODEBOOKS):
            sub = F.slice(v, m * PQ_SUBDIM + 1, PQ_SUBDIM)
            structs = F.array(
                *[
                    F.struct(
                        (
                            F.lit(float(sum(x * x for x in c)))
                            - 2.0 * V.dot_expr(sub, V.lit_vector(c))
                        ).alias("s"),
                        F.lit(k).alias("c"),
                    )
                    for k, c in enumerate(book)
                ]
            )
            best = F.array_min(structs)
            errs.append(best["s"] + V.sq_norm_expr(sub))
            codes.append(best["c"] * (PQ_K**m))
        err = errs[0]
        for e in errs[1:]:
            err = err + e
        code = codes[0]
        for c in codes[1:]:
            code = code + c
        return [
            code.cast("long").alias("pq_code"),
            pround(err, 6).alias("err6"),
        ]

    coded = _memo_const_cols("embpq_codes", PQ_CODEBOOKS, _build)
    return emb.select("vec_id", *coded)


@query(
    "similarity_topk_blas",
    oracle=_TOPK_ORACLE,
)
def similarity_topk_blas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The vectorized brute-force scan (brute_force_topk_matrix), put
    under the same value oracle as the expression-based
    `similarity_topk`: query vectors broadcast as a numpy matrix, each
    Arrow batch of corpus vectors scored with ONE BLAS matmul inside
    `mapInPandas`, per-batch top-k, then a global window. A green row
    proves the Arrow/numpy throughput path is numerically exact
    against DuckDB's sequential-fold dot products at the 6-decimal
    contract — the result that justifies using the fast path for real
    100 TB scans.

    The 10-row query-vector collect is input-gathering (the queries ARE
    the operator's parameter), not a distributed-compute collect.
    """
    from kafka_parquet_writer_spark.session import repartition_for_compute

    emb = repartition_for_compute(
        load_table(spark, sf_dir, "embeddings"), F.col("vec_id")
    )
    queries = [
        (r["vec_id"], list(r["embedding"]))
        for r in emb.filter(F.col("vec_id") < N_QUERIES)
        .select("vec_id", "embedding")
        .collect()
    ]
    out = brute_force_topk_matrix(emb, queries, k=TOPK)
    return out.select(
        "q_id",
        "n_id",
        pround(F.col("cos"), 6).alias("cos"),
        F.col("rnk").cast("int").alias("rnk"),
    )


# --- IVF-PQ fusion ----------------------------------------------------------

IVFPQ_N_QUERIES = 20
IVFPQ_PROBE = 2
IVFPQ_RERANK = 10   #: ADC shortlist size per query
IVFPQ_TOPK = 3


def _pq_sub_sql(vec_expr: str, m: int) -> str:
    return f"list_slice({vec_expr}, {m * PQ_SUBDIM + 1}, {(m + 1) * PQ_SUBDIM})"


def _ivfpq_oracle() -> str:
    # corpus side: cell (nearest IVF centroid) + per-subspace PQ codes
    cell_structs = ", ".join(
        f"struct_pack(s := CAST({sum(x*x for x in c)!r} AS DOUBLE)"
        f" - 2.0 * list_dot_product(v, {V.sql_lit_vector(c)}), c := {j})"
        for j, c in enumerate(IVF_CENTROIDS)
    )
    codes = []
    for m, book in enumerate(PQ_CODEBOOKS):
        sub = _pq_sub_sql("v", m)
        structs = ", ".join(
            f"struct_pack(s := CAST({sum(x * x for x in c)!r} AS DOUBLE)"
            f" - 2.0 * list_dot_product({sub}, {V.sql_lit_vector(c)}),"
            f" c := {k})"
            for k, c in enumerate(book)
        )
        codes.append(f"(list_sort([{structs}])[1]).c AS c{m}")
    # query side: per-subspace ADC lookup table, indexed by the
    # candidate's code — identical expression tree to the Spark plan
    terms = []
    for m, book in enumerate(PQ_CODEBOOKS):
        qsub = _pq_sub_sql("qv", m)
        lut = ", ".join(
            f"CAST({sum(x * x for x in c)!r} AS DOUBLE)"
            f" - 2.0 * list_dot_product({qsub}, {V.sql_lit_vector(c)})"
            for c in book
        )
        terms.append(
            f"([{lut}][c{m} + 1] + list_dot_product({qsub}, {qsub}))"
        )
    adc = " + ".join(terms)
    return f"""
    WITH e AS (
      SELECT vec_id,
             CAST(embedding AS DOUBLE[]) AS v,
             sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                   CAST(embedding AS DOUBLE[]))) AS nrm
      FROM embeddings
    ),
    cells AS (SELECT vec_id, v, nrm, list_sort([{cell_structs}]) AS cl FROM e),
    corpus AS (
      SELECT vec_id, (cl[1]).c AS cell, {", ".join(codes)}
      FROM cells
    ),
    probes AS (
      SELECT vec_id, v AS qv, nrm AS qnrm, u.c AS cell
      FROM (SELECT vec_id, v, nrm, unnest(cl[1:{IVFPQ_PROBE}]) AS u
            FROM cells WHERE vec_id < {IVFPQ_N_QUERIES})
    ),
    adc AS (
      SELECT q.vec_id AS q_id, q.qv AS qv, q.qnrm AS qnrm,
             c.vec_id AS n_id,
             {sql_pround(adc, 6)} AS adc6
      FROM probes q JOIN corpus c
        ON q.cell = c.cell AND c.vec_id <> q.vec_id
    ),
    short AS (
      SELECT q_id, qv, qnrm, n_id, adc6
      FROM adc
      QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY adc6, n_id)
              <= {IVFPQ_RERANK}
    ),
    rer AS (
      SELECT s.q_id, s.n_id,
             {sql_pround("list_dot_product(s.qv, e.v) / (s.qnrm * e.nrm)", 6)}
               AS cos
      FROM short s JOIN e ON e.vec_id = s.n_id
    )
    SELECT q_id, n_id, cos,
           CAST(row_number() OVER (PARTITION BY q_id
                                   ORDER BY cos DESC, n_id) AS INTEGER) AS rnk
    FROM rer
    QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id)
            <= {IVFPQ_TOPK}
    """


@query("similarity_ivf_pq", oracle=_ivfpq_oracle())
def similarity_ivf_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full IVF-PQ ANN pipeline — the two halves the repo already
    proves separately (`similarity_ivf` cells, `embedding_pq` codes)
    FUSED into the index structure real vector stores run at 100 TB:
    corpus vectors carry only (cell, 4×4-bit PQ code); a query probes
    its 2 nearest cells, scores candidates by ASYMMETRIC DISTANCE
    (per-subspace lookup table built from the query vector, indexed by
    the candidate's code — no candidate embedding touched), keeps an
    ADC shortlist of 10, and exact-cosine re-ranks only that shortlist
    into the final top-3. The oracle runs the identical algorithm
    (same seeded centroids/codebooks as plan literals, same fold
    order), so every stage — assignment, coding, ADC, re-rank — is
    value-hash-verified end to end.

    Scale shape: the candidate scan reads 2 bytes/vector instead of
    256 (the memory-residency argument for PQ); ADC is a pure per-row
    expression after one equi-join on cell id (cost ∝ Σ probed-cell
    sizes); only `IVFPQ_RERANK` rows per query ever touch a raw
    embedding again, via an equi-join of the (tiny, broadcast)
    shortlist against the vector store. Production swaps in k-means
    centroids/codebooks (`kmeans_centroids`) — same plan.
    """
    emb = repartition_for_compute(
        load_table(spark, sf_dir, "embeddings"), F.col("vec_id")
    )
    return ivf_pq_topk(emb, IVF_CENTROIDS, PQ_CODEBOOKS)


def pq_codebooks_kmeans(
    emb: DataFrame,
    n_books: int = PQ_M,
    n_codes: int = PQ_K,
    seed: int = PQ_SEED,
    sample_fraction: float = 1.0,
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Production PQ codebook training: per-subspace k-means (MLlib).

    The declared `similarity_ivf_pq` key uses seeded random codebooks
    so the DuckDB oracle can run the identical algorithm; seeded
    random codewords quantize badly (on the isotropic fixture the
    quantization error swamps neighbor gaps — measured in
    tests/test_round4_ops.py), so a real deployment trains each
    subspace's codebook on a sample, exactly as `kmeans_centroids`
    does for IVF cells. Returned books are plain literals — the
    `ivf_pq_topk` plan is byte-identical to the seeded-book plan.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    sample = emb if sample_fraction >= 1.0 else emb.sample(
        fraction=sample_fraction, seed=seed
    )
    subdim = EMBED_DIM // n_books
    books = []
    for m in range(n_books):
        feats = sample.select(
            array_to_vector(
                F.slice(F.col(vec_col), m * subdim + 1, subdim).cast(
                    "array<double>"
                )
            ).alias("features")
        )
        model = KMeans(k=n_codes, seed=seed + m, maxIter=20).fit(feats)
        books.append(
            [[round(float(x), 6) for x in c] for c in model.clusterCenters()]
        )
    return books


def ivf_pq_topk(
    emb: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    n_queries: int = IVFPQ_N_QUERIES,
    probe: int = IVFPQ_PROBE,
    rerank: int = IVFPQ_RERANK,
    topk: int = IVFPQ_TOPK,
) -> DataFrame:
    """The IVF-PQ engine with caller-supplied centroids/codebooks —
    shared by the declared seeded-constant key (oracle-checked) and
    the k-means production path (`kmeans_centroids` +
    `pq_codebooks_kmeans`)."""
    subdim = EMBED_DIM // len(codebooks)
    v = F.col("embedding")
    # the cell/code/ADC trees are pure functions of the constant
    # banks; _memo_const_cols skips their py4j re-construction on
    # every invocation after the first (r15: ~0.8 s of the 1.6 s warm
    # build was re-building these three fragments)
    cl = _memo_const_cols(
        "ivfpq_cells", centroids, lambda: _ivf_cell_structs(v, centroids)
    )
    # one 2-D literal + indexed transform per book (16 separate
    # expression trees per book made ANALYSIS the dominant cost —
    # 5.4 s plan build measured at sf0.01; same fix as the ANN
    # dedup centroid bank)

    def _code_structs(sub, norms):
        def fn(c, j):
            return F.struct(
                (F.element_at(norms, j + 1) - 2.0 * V.dot_expr(sub, c)).alias(
                    "s"
                ),
                j.alias("c"),
            )

        return fn

    def _build_code_cols():
        cols = []
        for m, book in enumerate(codebooks):
            norms = V.lit_vector([sum(x * x for x in c) for c in book])
            sub = F.slice(v, m * subdim + 1, subdim)
            structs = F.transform(V.lit_matrix(book), _code_structs(sub, norms))
            cols.append(F.array_min(structs)["c"].alias(f"c{m}"))
        return cols

    code_cols = _memo_const_cols("ivfpq_codes", codebooks, _build_code_cols)
    corpus = emb.select(
        F.col("vec_id").alias("n_id"),
        F.array_min(cl)["c"].alias("cell"),
        *code_cols,
    )
    probes = (
        emb.filter(F.col("vec_id") < n_queries)
        .select(
            F.col("vec_id").alias("q_id"),
            v.alias("qv"),
            F.explode(F.slice(F.array_sort(cl), 1, probe)).alias("p"),
        )
        .select("q_id", "qv", F.col("p.c").alias("cell"))
    )
    def _lut_entry(qsub, norms):
        def fn(c, j):
            return F.element_at(norms, j + 1) - 2.0 * V.dot_expr(qsub, c)

        return fn

    def _build_adc_terms():
        acc = None
        for m, book in enumerate(codebooks):
            norms = V.lit_vector([sum(x * x for x in c) for c in book])
            qsub = F.slice(F.col("qv"), m * subdim + 1, subdim)
            lut = F.transform(V.lit_matrix(book), _lut_entry(qsub, norms))
            term = F.element_at(lut, F.col(f"c{m}") + 1) + V.sq_norm_expr(qsub)
            acc = term if acc is None else acc + term
        return acc

    terms = _memo_const_cols("ivfpq_adc", codebooks, _build_adc_terms)
    adc = (
        F.broadcast(probes)
        .join(corpus, "cell")
        .filter(F.col("n_id") != F.col("q_id"))
        .select("q_id", "qv", "n_id", pround(terms, 6).alias("adc6"))
    )
    ws = W.partitionBy("q_id").orderBy(F.col("adc6"), F.col("n_id"))
    short = (
        adc.withColumn("srnk", F.row_number().over(ws))
        .filter(F.col("srnk") <= rerank)
        .drop("srnk")
    )
    store = emb.select(F.col("vec_id").alias("n_id"), F.col("embedding").alias("cv"))
    rer = (
        F.broadcast(short)
        .join(store, "n_id")
        .select(
            "q_id",
            "n_id",
            pround(V.cosine_expr(F.col("qv"), F.col("cv")), 6).alias("cos"),
        )
    )
    wk = W.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("n_id"))
    return (
        rer.withColumn("rnk", F.row_number().over(wk).cast("int"))
        .filter(F.col("rnk") <= topk)
        .select("q_id", "n_id", "cos", "rnk")
    )


# --- similarity_rerank_mmr --------------------------------------------------

MMR_CAND = 20   #: shortlist size entering the rerank
MMR_K = 5       #: diversified results returned
#: λ = 0.7 as integer tenths: mmr = 7·sim(q,d) − 3·max_{s∈sel} sim(d,s)
MMR_REL, MMR_DIV = 7, 3
MMR_SCALE = 1_000_000  #: fixed-point scale for vector components


def _mmr_oracle() -> str:
    rel, div, k, cand, s = MMR_REL, MMR_DIV, MMR_K, MMR_CAND, MMR_SCALE
    ctes = [
        f"""n AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
             sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                   CAST(embedding AS DOUBLE[]))) AS nrm
      FROM embeddings
    )""",
        f"""qv AS (
      SELECT vec_id,
             list_transform(v, x -> CAST(floor(x / nrm * {s} + 0.5)
                                         AS BIGINT)) AS q
      FROM n
    )""",
        """qry AS (SELECT q AS qq FROM qv ORDER BY vec_id LIMIT 1)""",
        f"""cand AS (
      SELECT vec_id, q,
             CAST(list_dot_product(q, qq) AS BIGINT) AS simq
      FROM qv CROSS JOIN qry
      WHERE vec_id > (SELECT min(vec_id) FROM qv)
      QUALIFY row_number() OVER (ORDER BY simq DESC, vec_id) <= {cand}
    )""",
        f"""sel1 AS (
      SELECT 1 AS rnk, vec_id, q, simq, CAST({rel} AS BIGINT) * simq AS mmr
      FROM cand ORDER BY simq DESC, vec_id LIMIT 1
    )""",
    ]
    prev = "sel1"
    for r in range(2, MMR_K + 1):
        ctes.append(f"""sel{r} AS (
      SELECT * FROM {prev}
      UNION ALL
      SELECT {r} AS rnk, vec_id, q, simq, mmr FROM (
        SELECT c.vec_id, c.q, c.simq,
               {rel} * c.simq
                 - {div} * max(CAST(list_dot_product(c.q, p.q) AS BIGINT))
                 AS mmr
        FROM cand c JOIN {prev} p ON true
        WHERE c.vec_id NOT IN (SELECT vec_id FROM {prev})
        GROUP BY c.vec_id, c.q, c.simq
        ORDER BY mmr DESC, c.vec_id LIMIT 1)
    )""")
        prev = f"sel{r}"
    return (
        "WITH " + ",\n    ".join(ctes)
        + f"\n    SELECT CAST(rnk AS INTEGER) AS rnk, vec_id,"
          f" CAST(simq AS BIGINT) AS simq, CAST(mmr AS BIGINT) AS mmr"
          f" FROM {prev}"
    )


@query("similarity_rerank_mmr", oracle=_mmr_oracle())
def similarity_rerank_mmr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-Marginal-Relevance rerank: the top-{MMR_CAND} cosine
    shortlist for a query vector is greedily re-selected into
    {MMR_K} DIVERSE results — each round picks argmax of
    {MMR_REL}·sim(query, d) − {MMR_DIV}·max_sim(d, already-selected)
    (λ = 0.7). The context-selection step a RAG / training-example
    pipeline runs after ANN retrieval so near-duplicate passages don't
    crowd the slate. ALL similarity arithmetic is exact int64 (1e-6
    fixed-point unit vectors → integer dots ≤ 2^46), so both engines
    walk the identical greedy trajectory through {MMR_K} unrolled
    oracle rounds, ties broken by vec_id.

    Scale shape: the expensive stage is the shortlist (any of the
    similarity_* retrieval paths; here the exact top-{MMR_CAND} — one
    scan + TakeOrderedAndProject). The greedy rerank touches only the
    {MMR_CAND}-row shortlist: a sequential O(K·CAND·dim) integer
    recurrence with no distributed structure, so it runs as ONE
    vectorized Python stage over the shortlist batch (guide §4: the
    boundary crosses {MMR_CAND} rows once). The r5 form expressed the
    recurrence as K unrolled DataFrame rounds, each fenced by a
    localCheckpoint — 6 eager driver actions per invocation (~4.4 s
    of the key's 4.5 s on the r15 before-split, exec 0.05 s); this
    form is a single lazy plan: scan → dot(q) → TakeOrdered({MMR_CAND})
    → one MapInPandas batch. Grouping per q_id turns the same stage
    into a million-shortlist rerank with zero plan changes."""
    from kafka_parquet_writer_spark.operators.dedup import _unit_vectors

    qv = _unit_vectors(spark, sf_dir).select(
        "vec_id",
        F.transform(
            "u", lambda x: F.floor(x * MMR_SCALE + F.lit(0.5)).cast("long")
        ).alias("q"),
    )
    # the query vector (min vec_id) rides along as a broadcast 1-row
    # join instead of a driver collect: no eager action at build time
    qry = (
        qv.orderBy("vec_id")
        .limit(1)
        .select(F.col("vec_id").alias("qid"), F.col("q").alias("qq"))
    )
    dot_q = F.aggregate(
        F.zip_with("q", "qq", lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    cand = (
        qv.crossJoin(F.broadcast(qry))
        .filter(F.col("vec_id") > F.col("qid"))
        .withColumn("simq", dot_q)
        .select("vec_id", "q", "simq")
        .orderBy(F.col("simq").desc(), "vec_id")
        .limit(MMR_CAND)
    )
    rel, div, k = MMR_REL, MMR_DIV, MMR_K

    def greedy(batches):
        import pandas as pd

        # the GlobalLimit shortlist arrives as one ≤MMR_CAND-row
        # partition; accumulate defensively across batches anyway
        rows = []
        for pdf in batches:
            for vec_id, q, simq in zip(pdf["vec_id"], pdf["q"], pdf["simq"]):
                rows.append((int(vec_id), [int(x) for x in q], int(simq)))
        if not rows:
            return
        # exact int64 greedy walk, ties by vec_id — the identical
        # trajectory the unrolled oracle rounds take (Python ints ARE
        # int64 here: |dot| ≤ dim·1e12 < 2^46)
        rows.sort(key=lambda t: (-t[2], t[0]))
        sel = [(1, rows[0][0], rows[0][2], rel * rows[0][2])]
        sel_q = [rows[0][1]]
        remaining = rows[1:]
        for r in range(2, k + 1):
            if not remaining:
                break
            best = None
            for vec_id, q, simq in remaining:
                maxsim = max(
                    sum(a * b for a, b in zip(q, pq)) for pq in sel_q
                )
                mmr = rel * simq - div * maxsim
                if best is None or (-mmr, vec_id) < (-best[3], best[0]):
                    best = (vec_id, q, simq, mmr)
            sel.append((r, best[0], best[2], best[3]))
            sel_q.append(best[1])
            remaining = [t for t in remaining if t[0] != best[0]]
        yield pd.DataFrame(
            {
                "rnk": [s[0] for s in sel],
                "vec_id": [s[1] for s in sel],
                "simq": [s[2] for s in sel],
                "mmr": [s[3] for s in sel],
            }
        )

    vt = dict(qv.dtypes)["vec_id"]
    return cand.mapInPandas(
        greedy, f"rnk int, vec_id {vt}, simq long, mmr long"
    )


# ---------------------------------------------------------------------------
# query-side top-k through the inverted multi-index
# ---------------------------------------------------------------------------

IMI_Q_NQ = 20  #: query vectors (vec_id < this)
IMI_Q_TOPK = 3


def _imi_query_oracle() -> str:
    from kafka_parquet_writer_spark.operators.dedup import (
        ANN_DEDUP_PROBE,
        ANN_IMI_SIDE,
        _imi_banks,
    )

    c1, c2 = _imi_banks(ANN_IMI_SIDE, ANN_IMI_SIDE)
    l1 = ", ".join(
        f"struct_pack(s := -list_dot_product(ua, {V.sql_lit_vector(c)}), "
        f"c := {j})"
        for j, c in enumerate(c1)
    )
    l2 = ", ".join(
        f"struct_pack(s := -list_dot_product(ub, {V.sql_lit_vector(c)}), "
        f"c := {j})"
        for j, c in enumerate(c2)
    )
    return f"""
    WITH n AS (
      SELECT vec_id,
             CAST(embedding AS DOUBLE[]) AS v,
             sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                   CAST(embedding AS DOUBLE[]))) AS nrm
      FROM embeddings
    ),
    e AS (SELECT vec_id, list_transform(v, x -> x / nrm) AS u FROM n),
    sp AS (SELECT vec_id, u, u[1:32] AS ua, u[33:64] AS ub FROM e),
    t AS (
      SELECT vec_id, u,
             list_sort([{l1}])[1:{ANN_DEDUP_PROBE}] AS t1,
             list_sort([{l2}])[1:{ANN_DEDUP_PROBE}] AS t2
      FROM sp
    ),
    combo AS (
      SELECT vec_id, u,
             list_sort(flatten(list_transform(t1, x ->
               list_transform(t2, y ->
                 struct_pack(s := x.s + y.s,
                             c := x.c * {ANN_IMI_SIDE} + y.c)))))
               [1:{ANN_DEDUP_PROBE}] AS cl
      FROM t
    ),
    corpus AS (SELECT vec_id, u, (cl[1]).c AS cell FROM combo),
    probes AS (
      SELECT vec_id, u, p.c AS cell
      FROM (SELECT vec_id, u, unnest(cl) AS p FROM combo
            WHERE vec_id < {IMI_Q_NQ})
    ),
    scored AS (
      SELECT q.vec_id AS q_id, c.vec_id AS n_id,
             (floor(list_dot_product(q.u, c.u) * 1e6 + 0.5) / 1e6) AS cos
      FROM probes q JOIN corpus c
        ON q.cell = c.cell AND c.vec_id <> q.vec_id
    )
    SELECT q_id, n_id, cos FROM scored
    QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id)
            <= {IMI_Q_TOPK}
    """


@query("similarity_ann_imi", oracle=_imi_query_oracle())
def similarity_ann_imi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-side ANN top-{IMI_Q_TOPK} through the inverted
    multi-index — the retrieval twin of dedup_embedding_ann_imi:
    corpus vectors land in their single nearest PRODUCT cell (probe
    1 over the m₁·m₂ subspace-pair codebook), queries probe their 4
    nearest product cells, and candidates are exact-cosine re-ranked.
    This is the Babenko-Lempitsky query path: a query touches
    m₁ + m₂ half-dim dots + 4 cells, while the effective cell count
    m₁·m₂ keeps per-cell candidate lists ~n/(m₁·m₂) — at 100 TB the
    banks grow as √m each, so the per-query cost grows as √(n/target)
    where flat IVF's grows as n/target.

    Scale shape: both assignment passes are the shared IMI
    mapInPandas gemms (narrow, two half-dots per bank row); the only
    exchange is the probe⋈corpus equi-join on cell id plus the
    per-query top-k window (probe rows per query are distinct cells
    and corpus rows live in one cell, so pairs are unique — no
    distinct needed before the window).
    """
    from kafka_parquet_writer_spark.operators.dedup import (
        ANN_IMI_SIDE,
        _make_imi_assigner,
        _unit_vectors,
    )

    emb = _unit_vectors(spark, sf_dir)
    corpus = emb.mapInPandas(
        _make_imi_assigner(ANN_IMI_SIDE, ANN_IMI_SIDE, probe=1),
        "vec_id long, u array<double>, cell long",
    ).select(
        F.col("vec_id").alias("n_id"), F.col("u").alias("cv"), "cell"
    )
    probes = (
        emb.filter(F.col("vec_id") < IMI_Q_NQ)
        .mapInPandas(
            _make_imi_assigner(ANN_IMI_SIDE, ANN_IMI_SIDE),
            "vec_id long, u array<double>, cell long",
        )
        .select(F.col("vec_id").alias("q_id"), F.col("u").alias("qv"), "cell")
    )
    cos = pround(V.dot_expr(F.col("qv"), F.col("cv")), 6)
    scored = (
        F.broadcast(probes)
        .join(corpus, "cell")
        .filter(F.col("n_id") != F.col("q_id"))
        .select("q_id", "n_id", cos.alias("cos"))
    )
    w = W.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("n_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= IMI_Q_TOPK)
        .select("q_id", "n_id", "cos")
    )


# --- materialized ANN (IVF-PQ) index lifecycle ------------------------------
#
# r14 VERDICT item 2: the text index has build -> serve -> maintain; the
# vector side was build -> serve only, and its "index" was an unbucketed
# mkdtemp parquet dir. This section closes the asymmetry: the PQ-coded
# corpus becomes a CELL-BUCKETED catalog table (sources/bucketed.py),
# value-oracled at build, with an incremental-maintenance key proving
# delta ≡ batch. Assignment and coding are PER-ROW expressions (nearest
# centroid + per-subspace argmin — no corpus-global statistic anywhere),
# so the delta path is embarrassingly incremental: code the new vectors,
# append. That is the structural contrast with the text side, where df
# (and for BM25, avgdl) couple documents together and force the
# affected-token / band-exit machinery of rag_index_delta and
# rag_bm25_index_delta.

#: ANN CDC split: vectors with vec_id % MOD == RESIDUE play the
#: newly-arrived delta; the rest are the already-indexed base
ANN_CDC_MOD = 5
ANN_CDC_RESIDUE = 0

#: bucket count for the cell-bucketed index table — one bucket per IVF
#: cell at fixture scale (IVF_CELLS = 8); production re-derives it with
#: suggest_bucket_count against measured at-rest bytes per cell
ANN_INDEX_BUCKETS = IVF_CELLS


def _pq_coded_select(df: DataFrame) -> DataFrame:
    """embeddings rows -> (n_id, cell, c0..c{PQ_M-1}): IVF cell
    assignment (nearest seeded centroid) + per-subspace PQ codes
    (argmin of ‖c‖² − 2·v·c per codebook). Pure per-row expressions —
    no shuffle, no UDF, no corpus-global term — shared by the build
    key, the delta key, and the streaming route's index accessor."""

    def _build():
        v = F.col("embedding")
        subdim = EMBED_DIM // PQ_M
        code_cols = []
        for m, book in enumerate(PQ_CODEBOOKS):
            sub = F.slice(v, m * subdim + 1, subdim)
            structs = F.array(
                *[
                    F.struct(
                        (
                            F.lit(float(sum(x * x for x in c)))
                            - 2.0 * V.dot_expr(sub, V.lit_vector(c))
                        ).alias("s"),
                        F.lit(k).alias("c"),
                    )
                    for k, c in enumerate(book)
                ]
            )
            code_cols.append(
                F.array_min(structs)["c"].cast("long").alias(f"c{m}")
            )
        return [
            F.array_min(_ivf_cell_structs(v))["c"].cast("long").alias("cell"),
            *code_cols,
        ]

    coded = _memo_const_cols("annidx_codes", PQ_CODEBOOKS, _build)
    return df.select(F.col("vec_id").alias("n_id"), *coded)


def _ann_index_oracle(where: str = "") -> str:
    """DuckDB form of the PQ-coded corpus — _ivfpq_oracle's corpus CTE
    as a standalone statement (cell via the same ‖c‖² − 2·v·c argmin,
    codes via per-subspace list_sort argmin)."""
    cell_structs = ", ".join(
        f"struct_pack(s := CAST({sum(x*x for x in c)!r} AS DOUBLE)"
        f" - 2.0 * list_dot_product(v, {V.sql_lit_vector(c)}), c := {j})"
        for j, c in enumerate(IVF_CENTROIDS)
    )
    codes = []
    for m, book in enumerate(PQ_CODEBOOKS):
        sub = _pq_sub_sql("v", m)
        structs = ", ".join(
            f"struct_pack(s := CAST({sum(x * x for x in c)!r} AS DOUBLE)"
            f" - 2.0 * list_dot_product({sub}, {V.sql_lit_vector(c)}),"
            f" c := {k})"
            for k, c in enumerate(book)
        )
        codes.append(
            f"CAST((list_sort([{structs}])[1]).c AS BIGINT) AS c{m}"
        )
    return f"""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
      FROM embeddings {where}
    )
    SELECT vec_id AS n_id,
           CAST((list_sort([{cell_structs}])[1]).c AS BIGINT) AS cell,
           {", ".join(codes)}
    FROM e
    """


@query("ann_index_build", oracle=_ann_index_oracle())
def ann_index_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized ANN-index BUILD — the vector-side analogue of
    rag_index_build, value-oracled: every corpus vector's IVF cell
    and 4×4-bit PQ codes, the table stream_ann_route_pq serves from
    (persisted cell-bucketed by _ensure_ann_index; this key returns
    the frame so DuckDB verifies assignment and coding end to end).
    At production widths the row is ~2 bytes of code + ids — the
    memory-residency argument for broadcasting ~100× more corpus than
    raw vectors allow.

    Scale shape: ONE embeddings scan and zero exchanges — assignment
    and coding are per-row functions of the vector and the (fixed)
    codebooks. Served by the Arrow/numpy mapper (one matmul per
    codebook per batch): the r15-build expression-tree form was
    zero-Python but paid ~2.5 s PER INVOCATION of py4j Column
    construction + Catalyst analysis over its ~1.5k literal nodes —
    data-INDEPENDENT driver cost (the same lesson stream_ann_route_pq
    measured in r14, and _pq_code_mapper's own docstring records:
    15 s of a 17 s streaming run was plan re-analysis). Numeric
    equivalence mapper ≡ expressions ≡ DuckDB is pinned by
    tests/test_round15_ops.py::test_stream_ann_index_delta_zero_state
    _append_only, which compares the mapper's rows against this key's.
    The cell-bucketed write pays its one shuffle at persist time so
    the serving join bucket-prunes forever after; build cost is the
    theoretical floor: read, code, write."""
    fn, schema = _pq_code_mapper()
    return (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .mapInPandas(fn, schema)
    )


def _ensure_ann_index(spark: SparkSession, sf_dir: str) -> str:
    """Build-once accessor for the CELL-BUCKETED PQ index table —
    replaces r14's unbucketed mkdtemp parquet (the gap its own
    docstring promised away: "materialized cell-bucketed index").
    Bucketing by cell makes the serving join's probe side co-locate
    per cell and lets a cell-pruned read touch one bucket file per
    probed cell at 100 TB. Content-fingerprint tagged (_index_tag on
    the embeddings source), so regenerated fixtures rebuild instead
    of serving stale codes; registered in the shared index database
    whose location is atexit-cleaned."""
    from kafka_parquet_writer_spark.operators.rag_prep import (
        _INDEX_DB,
        _ensure_index_db,
        _index_tag,
    )
    from kafka_parquet_writer_spark.sources.bucketed import write_bucketed

    tag = _index_tag(sf_dir, table="embeddings")
    tbl = f"{_INDEX_DB}.ann_pq_{tag}"
    if spark.catalog.tableExists(tbl):
        return tbl
    _ensure_index_db(spark)
    fn, schema = _pq_code_mapper()
    write_bucketed(
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .mapInPandas(fn, schema),
        tbl,
        bucket_cols="cell",
        n_buckets=ANN_INDEX_BUCKETS,
        sort_cols=["cell", "n_id"],
    )
    return tbl


def _ensure_ann_base_index(spark: SparkSession, sf_dir: str) -> str:
    """The deployed-index state when the delta arrives: the PQ index
    over the BASE vectors only (vec_id % ANN_CDC_MOD != RESIDUE),
    cell-bucketed like the full index."""
    from kafka_parquet_writer_spark.operators.rag_prep import (
        _INDEX_DB,
        _ensure_index_db,
        _index_tag,
    )
    from kafka_parquet_writer_spark.sources.bucketed import write_bucketed

    tag = _index_tag(sf_dir, table="embeddings")
    tbl = f"{_INDEX_DB}.ann_pq_base_{tag}"
    if spark.catalog.tableExists(tbl):
        return tbl
    _ensure_index_db(spark)
    fn, schema = _pq_code_mapper()
    base = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") % ANN_CDC_MOD != ANN_CDC_RESIDUE
    )
    write_bucketed(
        base.select("vec_id", "embedding").mapInPandas(fn, schema),
        tbl,
        bucket_cols="cell",
        n_buckets=ANN_INDEX_BUCKETS,
        sort_cols=["cell", "n_id"],
    )
    return tbl


@query("ann_index_delta", oracle=_ann_index_oracle())
def ann_index_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL ANN-index maintenance — delta ≡ batch for newly
    arrived vectors, completing the vector index's build → serve →
    maintain lifecycle (r14 VERDICT item 2). Cell assignment and PQ
    coding are PER-ROW functions of the vector and the (fixed)
    codebooks — no df, no avgdl, no corpus-global statistic — so the
    delta path is embarrassingly incremental: code ONLY the new
    vectors and append to the materialized base index. No anti-join,
    no affected-set computation, no re-ranking; the base table is
    read, never recomputed (and in production the append is a
    bucket-aligned file add, not even a table rewrite). The oracle is
    ann_index_build's full-corpus SQL: one green row proves base ∪
    coded-delta ≡ from-scratch build, bit-for-bit.

    The contrast WITH the text side is the design point: tf-idf
    maintenance pays an affected-token rebuild (df couples documents
    sharing a token — rag_index_delta), BM25 maintenance additionally
    risks a global re-rank (avgdl couples every document —
    rag_bm25_index_delta); PQ maintenance pays delta-rows × codebook
    comparisons, period. Retraining the codebooks on drifted data is
    a REBUILD decision (a new index generation), not maintenance —
    production monitors quantization error (embedding_pq's err6
    surface) to schedule it.

    Scale shape: one embeddings scan (the delta, vec_id % predicate
    at the scan — plan-gated) + one bucket-aligned read of the base
    table; zero joins, zero window passes; the union is exchange-free.
    Coding runs through the Arrow/numpy mapper for the same reason as
    ann_index_build: the expression-tree form re-paid ~2.5 s of py4j +
    Catalyst literal-tree cost per invocation."""
    fn, schema = _pq_code_mapper()
    base = spark.table(_ensure_ann_base_index(spark, sf_dir))
    delta = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") % ANN_CDC_MOD == ANN_CDC_RESIDUE)
        .select("vec_id", "embedding")
        .mapInPandas(fn, schema)
    )
    return base.unionByName(delta)


def _pq_code_mapper():
    """Arrow-vectorized twin of _pq_coded_select for mapInPandas: one
    numpy matmul per codebook per batch instead of ~1.5k literal
    expression nodes. Exists for the STREAMING maintainer
    (stream_ann_index_delta), where foreachBatch re-analyzes its plan
    every micro-batch and the literal trees cost ~3.5 s of Catalyst
    per batch — data-independent, so at fixture batch sizes it
    dominated (measured 15 s for a 4-batch run whose execution is
    ~2 s). The batch build key keeps the expression form (zero-python,
    zero-exchange, analyzed once); both are oracled against the SAME
    DuckDB SQL, which is the numeric-equivalence proof: argmin over
    ‖c‖² − 2·v·c agrees between numpy's pairwise-summed dots and the
    sequential folds on these fixtures (ulp-level sum-order
    differences would need an exact inter-centroid tie to flip an
    argmin; the seeded continuous data has none — the IMI keys have
    relied on the same property since r6).

    Returns (mapInPandas fn, schema string)."""
    cents = np.asarray(IVF_CENTROIDS, dtype=np.float64)
    cnorm = (cents * cents).sum(axis=1)
    books = [np.asarray(b, dtype=np.float64) for b in PQ_CODEBOOKS]
    bnorms = [(b * b).sum(axis=1) for b in books]
    subdim = EMBED_DIM // PQ_M

    def fn(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            V = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            out = {
                "n_id": pdf["vec_id"].to_numpy(),
                "cell": np.argmin(
                    cnorm[None, :] - 2.0 * (V @ cents.T), axis=1
                ).astype(np.int64),
            }
            for m, (b, bn) in enumerate(zip(books, bnorms)):
                sub = V[:, m * subdim : (m + 1) * subdim]
                out[f"c{m}"] = np.argmin(
                    bn[None, :] - 2.0 * (sub @ b.T), axis=1
                ).astype(np.int64)
            yield pd.DataFrame(out)

    schema = "n_id long, cell long, " + ", ".join(
        f"c{m} long" for m in range(PQ_M)
    )
    return fn, schema
