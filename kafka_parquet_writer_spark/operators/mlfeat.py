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
