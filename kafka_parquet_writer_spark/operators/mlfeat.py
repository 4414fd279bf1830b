"""Feature-engineering / data-quality operators for ML pipelines over
the landed tables: robust (MAD) outlier detection, equal-frequency
feature binning, and deterministic exact-k per-group sampling.

Downstream-consumer surface like operators/llm_prep.py — the reference
engine stops at parquet landing (`KafkaProtoParquetWriter.java:156-380`).
All three are built-in-expression pipelines with exact DuckDB oracles;
medians/quantiles are pre-rounded to 6 digits before reuse so the two
engines' last-ulp interpolation differences can't cascade into derived
columns or threshold membership.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from kafka_parquet_writer_spark.catalog import load_table
from kafka_parquet_writer_spark.functions.portable import pround, sql_pround
from kafka_parquet_writer_spark.registry import query

#: scale factor making MAD a consistent σ estimator for normal data
MAD_SIGMA = 1.4826
#: robust-z threshold for flagging
MAD_Z = 3.5

#: equal-frequency bin count
BIN_N = 10

#: deterministic per-group sample size
RESERVOIR_K = 20
#: affine coefficients for the sampling hash (literals in both engines)
RES_A, RES_B, RES_P = 48_271, 11, 2_147_483_647


@query(
    "anomaly_mad",
    oracle=f"""
    WITH med AS (
      SELECT event_type,
             {sql_pround('quantile_cont(value, 0.5)', 6)} AS med
      FROM events GROUP BY event_type
    ),
    dev AS (
      SELECT e.event_id, e.event_type, e.value, m.med,
             abs(e.value - m.med) AS adev
      FROM events e JOIN med m USING (event_type)
    ),
    mad AS (
      SELECT event_type,
             {sql_pround('quantile_cont(adev, 0.5)', 6)} AS mad
      FROM dev GROUP BY event_type
    )
    SELECT d.event_id, d.event_type,
           {sql_pround('d.value', 2)} AS value_r,
           {sql_pround(f'(d.value - d.med) / ({MAD_SIGMA} * m.mad)', 4)}
             AS robust_z
    FROM dev d JOIN mad m USING (event_type)
    WHERE m.mad > 0
      AND abs(d.value - d.med) > {MAD_Z} * {MAD_SIGMA} * m.mad
    """,
)
def anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection: flag events whose value deviates from
    its type's median by more than {MAD_Z} robust standard deviations
    (MAD × {MAD_SIGMA}) — the median/MAD pair is insensitive to the
    very outliers it hunts, unlike mean/stddev z-scores.

    Scale shape: two grouped exact-median aggregations (tiny outputs,
    |event_type| rows) broadcast back onto the fact scan — the events
    table itself is never shuffled, only scanned twice. At 100 TB swap
    `percentile` for `approx_percentile` (t-digest, mergeable
    partials, one scan's memory per group instead of a sort buffer);
    the join shape is unchanged. Medians are pre-rounded to 6 digits
    so Spark's `percentile` and DuckDB's `quantile_cont` last-ulp
    interpolation differences can't flip threshold membership.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    med = ev.groupBy("event_type").agg(
        pround(F.percentile("value", 0.5), 6).alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        pround(F.percentile("adev", 0.5), 6).alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .filter(
            (F.col("mad") > 0)
            & (F.col("adev") > MAD_Z * MAD_SIGMA * F.col("mad"))
        )
        .select(
            "event_id",
            "event_type",
            pround(F.col("value"), 2).alias("value_r"),
            pround(
                (F.col("value") - F.col("med"))
                / (MAD_SIGMA * F.col("mad")),
                4,
            ).alias("robust_z"),
        )
    )


@query(
    "feature_binning",
    oracle=f"""
    WITH b AS (
      SELECT event_type, value,
             ntile({BIN_N}) OVER (PARTITION BY event_type
                                  ORDER BY value, event_id) AS bin
      FROM events
    )
    SELECT event_type, CAST(bin AS INTEGER) AS bin,
           count(*) AS n,
           {sql_pround('min(value)', 2)} AS lo,
           {sql_pround('max(value)', 2)} AS hi
    FROM b
    GROUP BY event_type, bin
    """,
)
def feature_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency (quantile) feature binning: assign each event's
    value to one of {BIN_N} equally-populated bins per event type and
    emit the per-bin boundaries — the discretization step feeding
    categorical models and histogram-based feature stores. ntile's
    ordering includes the unique event_id tie-break so bin assignment
    is deterministic in both engines.

    Scale shape: one shuffle on event_type with a per-group sort —
    honest for exact equal-frequency bins. The 100 TB variant computes
    approximate boundaries first (`approx_percentile`, one mergeable
    pass) and assigns bins with a broadcast range lookup, trading bin
    exactness for a map-only second pass; this operator is the exact
    baseline that variant is judged against.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    w = W.partitionBy("event_type").orderBy("value", "event_id")
    return (
        ev.withColumn("bin", F.ntile(BIN_N).over(w))
        .groupBy("event_type", "bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            pround(F.min("value"), 2).alias("lo"),
            pround(F.max("value"), 2).alias("hi"),
        )
    )


@query(
    "sample_reservoir_group",
    oracle=f"""
    SELECT event_id, event_type
    FROM (
      SELECT event_id, event_type,
             row_number() OVER (
               PARTITION BY event_type
               ORDER BY (event_id * {RES_A} + {RES_B}) % {RES_P}, event_id
             ) AS rn
      FROM events
    )
    WHERE rn <= {RESERVOIR_K}
    """,
)
def sample_reservoir_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-k per-group sampling, reservoir-style but deterministic:
    rank rows inside each group by an affine hash of their id and keep
    the {RESERVOIR_K} smallest — a uniform-without-replacement k-sample
    that is reproducible across runs and engines (no rand(), no
    driver-side reservoir).

    Complements `sample_stratified` (rate-based, output size varies
    with the data): here the output size is exactly k per group, the
    contract eval-set builders need. Scale shape: one shuffle on the
    group key with per-group sort; for extreme-cardinality groups the
    same hash supports a two-phase top-k (per-partition k-smallest,
    then merge) — Spark's sort-based `row_number` + filter already
    stays O(k) memory per group via top-k pushdown
    (WindowGroupLimit in the physical plan).
    """
    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type")
    rank_key = (F.col("event_id") * RES_A + RES_B) % RES_P
    w = W.partitionBy("event_type").orderBy(rank_key, F.col("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= RESERVOIR_K)
        .select("event_id", "event_type")
    )


# --- embedding_cluster_kmeans -----------------------------------------------

KM_K = 8        #: clusters
KM_ITERS = 3    #: Lloyd assignment rounds (2 centroid updates between)
KM_SCALE = 1_000_000  #: fixed-point scale for vector components
KM_DIM = 64


def _km_oracle() -> str:
    k, iters, s, d = KM_K, KM_ITERS, KM_SCALE, KM_DIM
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
        f"""cents0 AS (
      SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER)
               AS cid,
             q AS c
      FROM (SELECT vec_id, q FROM qv ORDER BY vec_id LIMIT {k})
    )""",
    ]
    for it in range(1, iters + 1):
        ctes.append(f"""a{it} AS (
      SELECT vec_id, q, cid FROM (
        SELECT v.vec_id, v.q, c.cid,
               row_number() OVER (
                 PARTITION BY v.vec_id
                 ORDER BY list_dot_product(v.q, c.c) DESC, c.cid) AS rn
        FROM qv v CROSS JOIN cents{it - 1} c)
      WHERE rn = 1
    )""")
        if it < iters:
            ctes.append(f"""cents{it} AS (
      SELECT cid, list(CAST(floor(s_v / cnt) AS BIGINT) ORDER BY dim) AS c
      FROM (
        SELECT cid, r.i AS dim, sum(q[r.i]) AS s_v, count(*) AS cnt
        FROM a{it}, range(1, {d + 1}) AS r(i)
        GROUP BY cid, r.i)
      GROUP BY cid
    )""")
    return (
        "WITH " + ",\n    ".join(ctes)
        + f"\n    SELECT vec_id, CAST(cid AS INTEGER) AS cluster FROM a{iters}"
    )


@query("embedding_cluster_kmeans", oracle=_km_oracle())
def embedding_cluster_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus clustering: {KM_K}-means over the embedding table,
    {KM_ITERS} Lloyd rounds from a deterministic seed (the {KM_K}
    smallest vec_ids) — the topic-bucketing step a training-data
    pipeline runs before balancing a mixture across semantic domains
    (cluster-then-sample). ALL arithmetic is exact int64: unit vectors
    quantize to 1e-6 fixed point, similarity is the integer dot
    (≤ 2^46, order-free), and centroid updates are floor(sum/size)
    per dimension — so both engines walk bit-identical centroid
    trajectories and the oracle value-hash-matches the assignments
    (float k-means would diverge across engines on summation order).

    Scale shape per round — the MLlib k-means driver pattern:
    centroids live on the DRIVER ({KM_K}·{KM_DIM} int64s, constant
    size) and ride the assignment UDF's closure; assignment is one
    gemm per Arrow batch (mapInPandas — int64 matmul is exact and
    np.argmax's first-max rule IS the smallest-cid tie-break); the
    update is posexplode → ({KM_K}·{KM_DIM})-key two-phase aggregate
    whose map-side combine collapses every partition to ≤512 rows
    before a bounded 512-row collect. Rounds are a fixed small
    constant; each is one fact pass. Empty clusters drop out (both
    engines identically). A first cut kept centroids as a broadcast
    DataFrame with a crossJoin + window argmax — 3 extra shuffle
    stages per round and interpreted zip_with dots; the driver-side
    loop halved wall time at identical (oracle-verified) output.
    """
    import numpy as np

    from kafka_parquet_writer_spark.operators.dedup import _unit_vectors

    # cache() the quantized input across the Lloyd rounds — the MLlib
    # k-means access pattern. Without it every mapInPandas assignment
    # pass rebuilds scan→normalize→quantize: {KM_ITERS} update rounds
    # + the final assignment ≈ 4 full source scans where one cached
    # scan serves all of them (at 100 TB that is 4× the dominant
    # cost). Caching cannot change values; the oracle stays exact.
    qv = _unit_vectors(spark, sf_dir).select(
        "vec_id",
        F.transform(
            "u", lambda x: F.floor(x * KM_SCALE + F.lit(0.5)).cast("long")
        ).alias("q"),
    ).cache()
    seed_rows = qv.orderBy("vec_id").limit(KM_K).collect()
    cents = {i: np.array(r["q"], dtype=np.int64) for i, r in enumerate(seed_rows)}

    def assigner(c_map: dict):
        cids = np.array(sorted(c_map), dtype=np.int64)
        c = np.vstack([c_map[i] for i in sorted(c_map)])

        def assign(batches):
            import pandas as pd

            for pdf in batches:
                if not len(pdf):
                    continue
                u = np.vstack(pdf["q"].to_numpy()).astype(np.int64)
                s = u @ c.T  # exact int64 dots
                # first occurrence of the max ≡ smallest cid on ties
                best = cids[np.argmax(s, axis=1)]
                yield pd.DataFrame(
                    {
                        "vec_id": pdf["vec_id"],
                        "q": pdf["q"],
                        "cid": best.astype(np.int32),
                    }
                )

        return assign

    assign = None
    for it in range(1, KM_ITERS + 1):
        assign = qv.mapInPandas(
            assigner(cents), "vec_id long, q array<long>, cid int"
        )
        if it < KM_ITERS:
            # bounded collect: ≤ K·DIM = 512 (cid, dim, sum, count) rows
            per_dim = (
                assign.select("cid", F.posexplode("q").alias("dim0", "v"))
                .groupBy("cid", "dim0")
                .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
                .collect()
            )
            cents = {}
            for r in per_dim:
                arr = cents.setdefault(
                    r["cid"], np.zeros(KM_DIM, dtype=np.int64)
                )
                # python // floors — identical to both engines' floor
                # of the (exactly-representable-quotient) division
                arr[r["dim0"]] = r["s"] // r["n"]
    return assign.select("vec_id", F.col("cid").cast("int").alias("cluster"))
