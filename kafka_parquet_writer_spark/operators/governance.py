"""Data-governance operators: declarative quality-rule sweeps, OLAP
cube summaries, and deterministic weighted sampling.

The reference lands records in parquet and stops
(`KafkaProtoParquetWriter.java:156-380`); a production lake needs a
verification pass over what landed (dq_rules — the expectations gate
run before a partition is published), rollup summaries for monitoring
(agg_cube), and weighted down-sampling for manual audit / labeling
queues (sample_weighted). All three are single-pass, shuffle-light,
and exactly DuckDB-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_parquet_writer_spark.catalog import load_table
from kafka_parquet_writer_spark.functions import texthash as TH
from kafka_parquet_writer_spark.functions.portable import cents, sql_cents
from kafka_parquet_writer_spark.registry import query

# --- dq_rules --------------------------------------------------------------
#: (rule name, SQL boolean over lineitem that flags a VIOLATION)
#: one conditional-agg pass computes all of them; adding a rule is one
#: tuple, not one job
DQ_LINEITEM_RULES = [
    ("l_quantity_in_range", "l_quantity < 1 OR l_quantity > 50"),
    ("l_extendedprice_positive", "l_extendedprice <= 0"),
    (
        "l_shipdate_in_era",
        "l_shipdate < DATE '1992-01-01' OR l_shipdate > DATE '1998-12-31'",
    ),
    ("l_returnflag_enum", "l_returnflag NOT IN ('A', 'N', 'R')"),
    ("l_discount_in_range", "l_discount < 0 OR l_discount > 0.11"),
]
DQ_ORDERS_RULES = [
    ("o_totalprice_positive", "o_totalprice <= 0"),
    ("o_orderstatus_enum", "o_orderstatus NOT IN ('O', 'F', 'P')"),
]


@query(
    "dq_rules",
    oracle=f"""
    SELECT rule, n_checked, n_violations FROM (
      SELECT rule, n_checked, n_violations FROM (
        SELECT count(*) AS n_checked,
               {', '.join(f'''CAST(sum(CASE WHEN {pred} THEN 1 ELSE 0 END)
                     AS BIGINT) AS "{name}"''' for name, pred in DQ_LINEITEM_RULES)}
        FROM lineitem
      ) UNPIVOT (n_violations FOR rule IN (
        {', '.join(f'"{name}"' for name, _ in DQ_LINEITEM_RULES)}))
      UNION ALL
      SELECT rule, n_checked, n_violations FROM (
        SELECT count(*) AS n_checked,
               {', '.join(f'''CAST(sum(CASE WHEN {pred} THEN 1 ELSE 0 END)
                     AS BIGINT) AS "{name}"''' for name, pred in DQ_ORDERS_RULES)}
        FROM orders
      ) UNPIVOT (n_violations FOR rule IN (
        {', '.join(f'"{name}"' for name, _ in DQ_ORDERS_RULES)}))
      UNION ALL
      SELECT 'o_orderkey_unique' AS rule, count(*) AS n_checked,
             count(*) - count(DISTINCT o_orderkey) AS n_violations
      FROM orders
    )
    """,
)
def dq_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality expectations, evaluated as ONE
    conditional-aggregation pass per table: range checks, enum checks,
    cross-field ordering, and key uniqueness, reported as
    (rule, n_checked, n_violations). This is the publish gate a lake
    runs after every ingest batch — violations > 0 holds the partition
    back.

    Scale shape: each table is scanned once; every rule is a partial
    sum inside the same hash aggregate, so 10 rules cost the same
    shuffle as 1 (a rules-as-joins design would scan per rule). The
    uniqueness rule is the only distinct aggregation; Spark plans it as
    an expand + two-phase agg on the key — still one scan.
    """

    def sweep(df: DataFrame, rules: list[tuple[str, str]]) -> DataFrame:
        agg = df.agg(
            F.count(F.lit(1)).alias("n_checked"),
            *[
                F.sum(F.when(F.expr(pred), 1).otherwise(0)).alias(name)
                for name, pred in rules
            ],
        )
        stack = ", ".join(f"'{name}', `{name}`" for name, _ in rules)
        return agg.selectExpr(
            f"stack({len(rules)}, {stack}) AS (rule, n_violations)",
            "n_checked",
        ).select("rule", "n_checked", "n_violations")

    li = sweep(load_table(spark, sf_dir, "lineitem"), DQ_LINEITEM_RULES)
    orders = load_table(spark, sf_dir, "orders")
    o = sweep(orders, DQ_ORDERS_RULES)
    uniq = orders.agg(
        F.lit("o_orderkey_unique").alias("rule"),
        F.count(F.lit(1)).alias("n_checked"),
        (F.count(F.lit(1)) - F.count_distinct(F.col("o_orderkey"))).alias(
            "n_violations"
        ),
    ).select("rule", "n_checked", "n_violations")
    return li.unionByName(o).unionByName(uniq)


# --- agg_cube --------------------------------------------------------------


@query(
    "agg_cube",
    oracle=f"""
    SELECT CASE WHEN GROUPING(o_orderstatus) = 1 THEN 'ALL'
                ELSE o_orderstatus END AS status,
           CASE WHEN GROUPING(o_orderpriority) = 1 THEN 'ALL'
                ELSE o_orderpriority END AS priority,
           count(*) AS n,
           CAST(sum({sql_cents('o_totalprice')}) AS BIGINT) AS total_vc
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full CUBE lattice over (status, priority): every combination of
    subtotal levels in one statement, with GROUPING() markers rewritten
    to 'ALL' labels (portable across engines; a NULL marker would be
    ambiguous against genuinely-NULL dimension values). The dashboard
    rollup companion to grouping_sets' hand-picked levels.

    Scale shape: Spark plans CUBE as an Expand (4 replicas of each row
    at 2 dims) feeding ONE two-phase hash aggregate — cost is
    2^dims × scan, never 2^dims separate jobs. Keep dims small; at
    100 TB a 2-3 dimension cube is one shuffle of modest expansion.
    """
    o = load_table(spark, sf_dir, "orders")
    # grouping() is only defined inside the agg of a cube/rollup —
    # surface the markers there, rewrite to labels in the projection
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(cents(F.col("o_totalprice"))).alias("total_vc"),
            F.grouping("o_orderstatus").alias("g_s"),
            F.grouping("o_orderpriority").alias("g_p"),
        )
        .select(
            F.when(F.col("g_s") == 1, "ALL")
            .otherwise(F.col("o_orderstatus"))
            .alias("status"),
            F.when(F.col("g_p") == 1, "ALL")
            .otherwise(F.col("o_orderpriority"))
            .alias("priority"),
            "n",
            "total_vc",
        )
    )


# --- sample_weighted -------------------------------------------------------
#: sample size and the fixed-point scale for the priority ratio
SAMPLE_K = 200
PRIORITY_SCALE = 1_000_000
#: affine coefficients for the per-row uniform hash (any a ∈ [1, P))
SW_A, SW_B = 16_807, 7


@query(
    "sample_weighted",
    oracle=f"""
    SELECT o_orderkey, w_cents,
           {TH.sql_affine('o_orderkey', SW_A, SW_B)} * {PRIORITY_SCALE}
             // w_cents AS priority
    FROM (SELECT o_orderkey, {sql_cents('o_totalprice')} AS w_cents
          FROM orders)
    ORDER BY priority, o_orderkey
    LIMIT {SAMPLE_K}
    """,
)
def sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling without replacement: each row
    draws a pseudo-uniform integer from an affine hash of its key and
    competes with priority u·SCALE/weight — the integer-arithmetic
    analogue of the Efraimidis-Spirakis u^(1/w) exponential-key scheme.
    Higher weight ⇒ stochastically smaller priority ⇒ more likely
    sampled; the same K rows come out on every engine and every run
    (audit queues and labeling batches must be reproducible).

    All-integer priorities: u < 2^31 and SCALE = 10^6 keep the product
    under 2^51, and integer division can't drift a boundary row the
    way float u^(1/w) would between engines.

    Scale shape: TakeOrderedAndProject — per-partition top-K then a
    K-sized merge on the driver; no global sort, no full shuffle
    (the same plan gate as sort_limit_topk).
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", cents(F.col("o_totalprice")).alias("w_cents")
    )
    priority = F.expr(
        f"(o_orderkey * {SW_A} + {SW_B}) % {TH.MERSENNE_P}"
        f" * {PRIORITY_SCALE} div w_cents"
    )
    return (
        o.withColumn("priority", priority)
        .orderBy("priority", "o_orderkey")
        .limit(SAMPLE_K)
    )


# --- agg_approx_quantile ---------------------------------------------------


@query(
    "agg_approx_quantile",
    oracle="""
    SELECT event_type,
           (floor((quantile_cont(value, 0.50)) * 1e6 + 0.5) / 1e6) AS p50_exact,
           (floor((quantile_cont(value, 0.95)) * 1e6 + 0.5) / 1e6) AS p95_exact,
           TRUE AS approx_in_rank_band
    FROM events
    GROUP BY event_type
    """,
)
def agg_approx_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate quantiles (Greenwald-Khanna family via
    `approx_percentile`) with an in-query accuracy gate — the 100 TB
    path for percentile dashboards: mergeable constant-memory sketches
    per group instead of a per-group sort buffer (agg_percentiles is
    the exact twin).

    Oracle form (the agg_approx_distinct pattern): the sketch value is
    engine-specific, so the checked output carries the exact
    interpolated percentiles plus a boolean accuracy gate — DuckDB
    asserts the literal TRUE, so sketch drift flips the hash.

    The gate is a true RANK check, because GK's guarantee is on rank
    (error ≤ n/accuracy = 1e-4·n here): the sketch's answer occupies
    the rank interval [#\\{v < a\\}+1, #\\{v ≤ a\\}] (ties widen it),
    and the gate asserts that interval intersects p·n ± (0.01·n + 1)
    — a 100× margin over the sketch's bound plus one rank of slack
    for boundary conventions, valid at EVERY group size. Two earlier
    forms were both gap-dominated at small n and are kept here as the
    cautionary tale: ±2% of the interpolated value flipped false on a
    199-row group whose interpolated p95 (150.02) sits 4% below its
    nearest data element (156.01) — surfaced by the r11 sf0.001 sweep
    — and interpolated-quantile band edges at p ± 0.01 are narrower
    than ONE element gap for n below ~100 (0.02·(n−1) ranks), so a
    rank-exact sketch answer still fell outside — surfaced by the r11
    review's live repro at n = 50. Any gate phrased in the VALUE
    domain measures local order-statistic density, not sketch error;
    only rank comparisons are scale-free.

    Scale shape: the rank count is a second aggregate over events
    after a broadcast join of the per-group sketch row (|groups|
    rows) — two map-side-combined shuffles on the same key, no sort
    buffer beyond what the exact-percentile columns already pay.
    """
    from kafka_parquet_writer_spark.functions.portable import pround

    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    sk = ev.groupBy("event_type").agg(
        F.percentile("value", 0.50).alias("e50"),
        F.percentile("value", 0.95).alias("e95"),
        F.approx_percentile("value", 0.50, 10_000).alias("a50"),
        F.approx_percentile("value", 0.95, 10_000).alias("a95"),
        # non-null count: percentile/approx_percentile and the lt/le
        # rank sums below all ignore NULL values, so row count would
        # inflate the p·n rank target on a null-bearing group and the
        # gate could flip false (r11 ADVICE)
        F.count("value").alias("n"),
    )
    j = ev.join(F.broadcast(sk), "event_type")
    g = j.groupBy("event_type").agg(
        F.first("e50").alias("e50"),
        F.first("e95").alias("e95"),
        F.first("n").alias("n"),
        F.sum((F.col("value") < F.col("a50")).cast("long")).alias("lt50"),
        F.sum((F.col("value") <= F.col("a50")).cast("long")).alias("le50"),
        F.sum((F.col("value") < F.col("a95")).cast("long")).alias("lt95"),
        F.sum((F.col("value") <= F.col("a95")).cast("long")).alias("le95"),
    )

    def in_band(lt, le, p):
        slack = 0.01 * F.col("n") + F.lit(1.0)
        target = F.lit(p) * F.col("n")
        return (F.col(le) >= target - slack) & (
            F.col(lt) + 1 <= target + slack
        )

    ok = in_band("lt50", "le50", 0.50) & in_band("lt95", "le95", 0.95)
    return g.select(
        "event_type",
        pround(F.col("e50"), 6).alias("p50_exact"),
        pround(F.col("e95"), 6).alias("p95_exact"),
        ok.alias("approx_in_rank_band"),
    )


# --- agg_mode ---------------------------------------------------------------


@query(
    "agg_mode",
    oracle="""
    SELECT o_orderpriority, o_orderstatus AS modal_status, n
    FROM (
      SELECT o_orderpriority, o_orderstatus, count(*) AS n,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY count(*) DESC, o_orderstatus)
               AS rnk
      FROM orders
      GROUP BY o_orderpriority, o_orderstatus
    )
    WHERE rnk = 1
    """,
)
def agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group MODE (most frequent value) with a deterministic
    tiebreak — the argmax-over-counts pattern behind 'typical value'
    dashboards and categorical imputation. Built-in `mode()` breaks
    ties arbitrarily (engine- and partition-order-dependent), so the
    declared form is count + rank with an explicit (count DESC, value)
    order both engines reproduce exactly.

    Scale shape: one two-phase aggregate over (group, value) —
    map-side combine shrinks the shuffle to distinct pairs — then a
    window over the aggregate, whose size is |groups|×|values|, not
    the table. The mode never touches raw rows twice.
    """
    o = load_table(spark, sf_dir, "orders")
    from pyspark.sql.window import Window as W

    counts = o.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = W.partitionBy("o_orderpriority").orderBy(
        F.col("n").desc(), "o_orderstatus"
    )
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .select(
            "o_orderpriority",
            F.col("o_orderstatus").alias("modal_status"),
            "n",
        )
    )


# --- agg_hll_partitioned ----------------------------------------------------


@query(
    "agg_hll_partitioned",
    oracle="""
    SELECT strftime(to_timestamp((CAST(floor(epoch(ts)) AS BIGINT) // 604800) * 604800),
                    '%Y-%m-%d') AS wk,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact,
           TRUE AS merged_within_5pct
    FROM events
    GROUP BY 1
    """,
)
def agg_hll_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count sketches ACROSS partitions — the
    incremental-analytics pattern: per-DAY HLL sketches (Datasketches
    via `hll_sketch_agg`, the thing a daily job would persist beside
    each partition) are UNIONED into weekly estimates with
    `hll_union_agg`, so the weekly answer never rescans the raw days.
    The in-query gate asserts the merged estimate lands within ±5% of
    the exact weekly distinct (the agg_approx_distinct oracle
    pattern: DuckDB asserts the literal TRUE, so union drift flips
    the value hash).

    Scale shape: raw data is touched once at daily grain; weekly /
    monthly / arbitrary re-slices merge fixed-size sketch blobs —
    at 100 TB that is the difference between a distinct query per
    dashboard tile and a byte-sized fold. This is the read-side twin
    of the reference's write-side partitioning (#6): day files carry
    their own mergeable summaries.
    """
    ev = load_table(spark, sf_dir, "events")
    # derive each day's week bucket from the day window start
    daily = ev.groupBy(F.window("ts", "1 day").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sk")
    ).select(
        F.date_format(
            F.timestamp_seconds(
                F.floor(
                    F.unix_timestamp(F.col("day.start")) / (7 * 86400)
                )
                * (7 * 86400)
            ),
            "yyyy-MM-dd",
        ).alias("wk"),
        "sk",
    )
    weekly = daily.groupBy("wk").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx")
    )
    exact = ev.groupBy(
        F.date_format(
            F.timestamp_seconds(
                F.floor(F.unix_timestamp("ts") / (7 * 86400)) * (7 * 86400)
            ),
            "yyyy-MM-dd",
        ).alias("wk")
    ).agg(F.countDistinct("user_id").alias("n_exact"))
    return exact.join(weekly, "wk").select(
        "wk",
        "n_exact",
        (
            (F.col("approx") >= 0.95 * F.col("n_exact"))
            & (F.col("approx") <= 1.05 * F.col("n_exact"))
        ).alias("merged_within_5pct"),
    )


# --- agg_countmin -----------------------------------------------------------

CM_SEED = 777
CM_D = 3      #: hash rows
CM_W = 64     #: counters per row — 192 ints total; production: 4×2^18
CM_COEFFS = TH.minhash_coeffs(CM_D, seed=CM_SEED)
CM_HH_FRAC = 200  #: evaluate tokens holding ≥ 1/200 of the stream


def _cm_probes_sql(tid_expr: str) -> str:
    structs = ", ".join(
        f"struct_pack(m := {m}, b := ({TH.sql_affine(tid_expr, a, b)} % {CM_W}))"
        for m, (a, b) in enumerate(CM_COEFFS)
    )
    return f"[{structs}]"


def _cm_oracle() -> str:
    return f"""
    WITH toks AS (
      SELECT unnest({TH.sql_words('text')}) AS token FROM documents
    ),
    tids AS (
      SELECT token, {TH.sql_portable_tid('token')} AS tid FROM toks
    ),
    tot AS (SELECT count(*) AS n FROM toks),
    cm AS (
      SELECT u.m AS m, u.b AS bucket, CAST(count(*) AS BIGINT) AS cnt
      FROM (SELECT {_cm_probes_sql('tid')} AS pb FROM tids), unnest(pb) AS t(u)
      GROUP BY u.m, u.b
    ),
    exact AS (
      SELECT token, tid, CAST(count(*) AS BIGINT) AS n_exact
      FROM tids GROUP BY token, tid
      HAVING count(*) * {CM_HH_FRAC} >= (SELECT n FROM tot)
    ),
    probes AS (
      SELECT token, n_exact, u.m AS m, u.b AS bucket
      FROM (SELECT token, n_exact, {_cm_probes_sql('tid')} AS pb FROM exact),
           unnest(pb) AS t(u)
    )
    SELECT p.token AS token, p.n_exact AS n_exact,
           CAST(min(cm.cnt) AS BIGINT) AS est_cm,
           (min(cm.cnt) >= p.n_exact) AS no_underestimate
    FROM probes p JOIN cm ON cm.m = p.m AND cm.bucket = p.bucket
    GROUP BY p.token, p.n_exact
    """


def _cm_probes_expr(tid_col):
    return F.array(
        *[
            F.struct(
                F.lit(m).alias("m"),
                (TH.affine_hash(tid_col, a, b) % CM_W).alias("b"),
            )
            for m, (a, b) in enumerate(CM_COEFFS)
        ]
    )


@query("agg_countmin", oracle=_cm_oracle())
def agg_countmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch over the token stream: 3 seeded hash rows × 64
    counters; a token's estimate is the MIN of its 3 counters. The
    heavy-hitter set (≥ 1/200 of the stream) is then read back out of
    the sketch and compared against exact counts — the oracle builds
    the IDENTICAL sketch in DuckDB (same portable hashes, same affine
    rows), so the estimates are value-hash-verified, not just bounded;
    `no_underestimate` additionally pins CM's one-sided-error
    guarantee.

    Scale shape (the point of the operator): the sketch build is a
    groupBy on (row, bucket) — D·W=192 distinct keys, so map-side
    partial aggregation collapses each partition to ≤192 rows before
    the shuffle, regardless of corpus size. Sketches from different
    partitions/days MERGE by cell-wise addition (same mergeable-
    summary family as `agg_hll_partitioned`); reading an estimate
    touches D counters. Production sizing: W = ⌈e/ε⌉, D = ⌈ln 1/δ⌉.
    The probe join broadcasts the 192-row sketch.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(TH.words_expr("text")).alias("token"))
    tids = toks.withColumn("tid", TH.portable_tid(F.col("token")))
    tot = toks.agg(F.count(F.lit(1)).alias("n_total"))
    cm = (
        tids.select(F.explode(_cm_probes_expr(F.col("tid"))).alias("u"))
        .groupBy(F.col("u.m").alias("m"), F.col("u.b").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    exact = (
        tids.groupBy("token", "tid")
        .agg(F.count(F.lit(1)).alias("n_exact"))
        .join(F.broadcast(tot))
        .filter(F.col("n_exact") * CM_HH_FRAC >= F.col("n_total"))
    )
    probes = exact.select(
        "token", "n_exact", F.explode(_cm_probes_expr(F.col("tid"))).alias("u")
    )
    return (
        probes.join(
            F.broadcast(cm),
            (F.col("u.m") == F.col("m")) & (F.col("u.b") == F.col("bucket")),
        )
        .groupBy("token", "n_exact")
        .agg(F.min("cnt").alias("est_cm"))
        .select(
            "token",
            "n_exact",
            "est_cm",
            (F.col("est_cm") >= F.col("n_exact")).alias("no_underestimate"),
        )
    )


# --- agg_audience_overlap ---------------------------------------------------

OPH_K = 64          #: buckets (one-permutation MinHash register count)
OPH_A, OPH_B = 48_271, 11  #: affine permutation (a ∈ [1, P))
#: loose OPH accuracy gate in basis points (σ ≈ √(j(1−j)/K) ≈ 0.04)
OPH_TOL_BP = 2_000


@query(
    "agg_audience_overlap",
    oracle=f"""
    WITH aud AS (
      SELECT DISTINCT CAST(hour(ts) AS INTEGER) AS h, user_id FROM events
    ),
    hashed AS (
      SELECT h, {TH.sql_affine('user_id', OPH_A, OPH_B)} AS hv FROM aud
    ),
    sk AS (
      SELECT h, hv % {OPH_K} AS b, CAST(min(hv) AS BIGINT) AS m
      FROM hashed GROUP BY h, hv % {OPH_K}
    ),
    est AS (
      SELECT x.h AS h,
             CAST(10000 * sum(CASE WHEN x.m = y.m THEN 1 ELSE 0 END)
                  // count(*) AS BIGINT) AS j_est_bp
      FROM sk x JOIN sk y ON y.h = x.h + 1 AND y.b = x.b
      GROUP BY x.h
    ),
    sizes AS (
      SELECT h, count(*) AS n FROM aud GROUP BY h
    ),
    inter AS (
      SELECT x.h AS h, count(y.user_id) AS i
      FROM aud x LEFT JOIN aud y
        ON y.user_id = x.user_id AND y.h = x.h + 1
      WHERE x.h < 23
      GROUP BY x.h
    ),
    exact AS (
      SELECT i.h AS h,
             CAST(10000 * i.i // (sa.n + sb.n - i.i) AS BIGINT)
               AS j_exact_bp
      FROM inter i
      JOIN sizes sa ON sa.h = i.h
      JOIN sizes sb ON sb.h = i.h + 1
    )
    SELECT e.h AS h, est.j_est_bp AS j_est_bp, e.j_exact_bp AS j_exact_bp,
           (abs(est.j_est_bp - e.j_exact_bp) <= {OPH_TOL_BP}) AS close
    FROM exact e JOIN est ON est.h = e.h
    """,
)
def agg_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap (Jaccard) between consecutive hours' user
    sets, estimated from ONE-PERMUTATION MinHash sketches: each hour's
    users hash through one seeded affine permutation into {OPH_K}
    buckets keeping the per-bucket MINIMUM — J(A,B) ≈ matching minima
    / co-probed buckets. The third mergeable-sketch family member
    beside HLL (distinct counts) and count-min (frequencies): bucket
    minima merge by elementwise min, and unlike HLL the sketch
    supports set SIMILARITY/intersection algebra. The oracle builds
    the identical sketch, so the estimates themselves are
    value-hash-verified; the exact Jaccard and a ±{OPH_TOL_BP}bp gate
    ride along.

    Scale shape: the sketch build is groupBy(h, bucket) min — map-side
    combine collapses every partition to ≤24·{OPH_K} rows before the
    ONE shuffle, regardless of event volume; pair scoring joins
    64-row sketches. The exact side (a users×users-scale join) exists
    only as this fixture-scale verification gate — production reads
    sketches alone.
    """
    ev = load_table(spark, sf_dir, "events")
    aud = ev.select(
        F.hour("ts").cast("int").alias("h"), "user_id"
    ).distinct()
    hv = TH.affine_hash(F.col("user_id"), OPH_A, OPH_B)
    sk = (
        aud.select("h", hv.alias("hv"))
        .groupBy("h", (F.col("hv") % OPH_K).alias("b"))
        .agg(F.min("hv").alias("m"))
    )
    x = sk.select(
        F.col("h").alias("h"), F.col("b").alias("b"), F.col("m").alias("mx")
    )
    y = sk.select(
        (F.col("h") - 1).alias("h"), F.col("b").alias("b"),
        F.col("m").alias("my"),
    )
    est = (
        x.join(F.broadcast(y), ["h", "b"])
        .groupBy("h")
        .agg(
            (
                10000
                * F.sum(F.when(F.col("mx") == F.col("my"), 1).otherwise(0))
                / F.count(F.lit(1))
            )
            .cast("long")
            .alias("j_est_bp")
        )
    )
    sizes = aud.groupBy("h").agg(F.count(F.lit(1)).alias("n"))
    ay = aud.select((F.col("h") - 1).alias("h"), F.col("user_id").alias("uy"))
    inter = (
        aud.filter(F.col("h") < 23)
        .join(ay, (aud.h == ay.h) & (aud.user_id == F.col("uy")), "left")
        .drop(ay.h)
        .groupBy("h")
        .agg(F.count("uy").alias("i"))
    )
    sa = sizes.select(F.col("h"), F.col("n").alias("na"))
    sb = sizes.select((F.col("h") - 1).alias("h"), F.col("n").alias("nb"))
    exact = (
        inter.join(F.broadcast(sa), "h")
        .join(F.broadcast(sb), "h")
        .select(
            "h",
            (
                10000 * F.col("i") / (F.col("na") + F.col("nb") - F.col("i"))
            )
            .cast("long")
            .alias("j_exact_bp"),
        )
    )
    return exact.join(est, "h").select(
        "h",
        "j_est_bp",
        "j_exact_bp",
        (
            F.abs(F.col("j_est_bp") - F.col("j_exact_bp")) <= OPH_TOL_BP
        ).alias("close"),
    )


# --- agg_theta_sketch -------------------------------------------------------

THETA_K = 64            #: KMV retained minima per set
#: hash range: md5-based portable hash folded to 31 bits. KMV needs a
#: hash UNIFORM over its declared range — the OPH-style affine
#:   (a·id + b) mod P
#: is an arithmetic progression that never wraps P for the fixture's
#: small sequential ids (max id·a ≪ P), so its k smallest values sit
#: at ≈ k·a and the density estimate count·P/θ overshoots ~20×
#: (measured before this was fixed). md5 is uniform by construction;
#: 31 bits keeps count·M ≤ 2^37 in exact int64 algebra.
THETA_M = 1 << 31
#: accuracy gates: |est − exact| ≤ max(abs floor, pct·exact/100)
THETA_UNION_ABS, THETA_UNION_PCT = 15, 35
THETA_INTER_ABS, THETA_INTER_PCT = 20, 60


def _theta_oracle() -> str:
    m = THETA_M
    return f"""
    WITH aud AS (
      SELECT DISTINCT CAST(hour(ts) AS INTEGER) AS h, user_id FROM events
    ),
    hashed AS (
      SELECT DISTINCT h,
        ({TH.sql_portable_hash64("CAST(user_id AS VARCHAR)")}) % {m} AS hv
      FROM aud
    ),
    ranked AS (
      SELECT h, hv, row_number() OVER (PARTITION BY h ORDER BY hv) AS rn
      FROM hashed
    ),
    sk AS (SELECT h, hv, rn FROM ranked WHERE rn <= {THETA_K}),
    th AS (
      SELECT h,
             CASE WHEN max(rn) < {THETA_K} THEN {m}
                  ELSE max(hv) END AS theta
      FROM sk GROUP BY h
    ),
    pairs AS (
      SELECT ta.h AS h, least(ta.theta, tb.theta) AS t
      FROM th ta JOIN th tb ON tb.h = ta.h + 1
    ),
    ca AS (
      SELECT s.h AS h, count(*) AS na
      FROM sk s JOIN pairs p ON p.h = s.h
      WHERE s.hv < p.t GROUP BY s.h
    ),
    cb AS (
      SELECT s.h - 1 AS h, count(*) AS nb
      FROM sk s JOIN pairs p ON p.h = s.h - 1
      WHERE s.hv < p.t GROUP BY s.h - 1
    ),
    ci AS (
      SELECT a.h AS h, count(*) AS ni
      FROM sk a JOIN sk b ON b.h = a.h + 1 AND b.hv = a.hv
      JOIN pairs p ON p.h = a.h
      WHERE a.hv < p.t GROUP BY a.h
    ),
    est AS (
      SELECT p.h AS h,
             CAST((ca.na + cb.nb - COALESCE(ci.ni, 0)) * {m} // p.t
                  AS BIGINT) AS est_union,
             CAST(COALESCE(ci.ni, 0) * {m} // p.t AS BIGINT) AS est_inter,
             CAST((ca.na - COALESCE(ci.ni, 0)) * {m} // p.t
                  AS BIGINT) AS est_diff
      FROM pairs p
      JOIN ca ON ca.h = p.h
      JOIN cb ON cb.h = p.h
      LEFT JOIN ci ON ci.h = p.h
    ),
    sizes AS (SELECT h, count(*) AS n FROM aud GROUP BY h),
    iex AS (
      SELECT x.h AS h, count(y.user_id) AS i
      FROM aud x LEFT JOIN aud y
        ON y.user_id = x.user_id AND y.h = x.h + 1
      WHERE x.h < 23
      GROUP BY x.h
    ),
    exact AS (
      SELECT i.h AS h,
             CAST(sa.n + sb.n - i.i AS BIGINT) AS n_union,
             CAST(i.i AS BIGINT) AS n_inter
      FROM iex i
      JOIN sizes sa ON sa.h = i.h
      JOIN sizes sb ON sb.h = i.h + 1
    )
    SELECT e.h AS h, est.est_union, est.est_inter, est.est_diff,
           e.n_union, e.n_inter,
           (abs(est.est_union - e.n_union)
              <= greatest({THETA_UNION_ABS},
                          {THETA_UNION_PCT} * e.n_union // 100))
             AS close_union,
           (abs(est.est_inter - e.n_inter)
              <= greatest({THETA_INTER_ABS},
                          {THETA_INTER_PCT} * e.n_inter // 100))
             AS close_inter
    FROM exact e JOIN est ON est.h = e.h
    """


@query("agg_theta_sketch", oracle=_theta_oracle())
def agg_theta_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta/KMV sketch SET ALGEBRA between consecutive hours' user
    sets: each set keeps its {THETA_K} smallest seeded-permutation
    hash values (θ = the k-th minimum, or P in exact mode when the
    set is smaller than K); for a pair, θ = min(θ_A, θ_B) and
    union/intersection/difference cardinalities are estimated as
    |S ∩ [0,θ)| · P / θ — the full set-algebra member of the
    mergeable-sketch family (HLL counts distincts but cannot
    intersect; OPH estimates similarity but not cardinalities). All
    arithmetic is int64 (count·P ≤ 2^41), so the oracle builds the
    bit-identical sketch and the estimates value-hash-match exactly;
    exact set sizes and two-sided accuracy gates ride along.

    Scale shape (r16: the θ-prefilter/truncation-monoid form this
    docstring always promised): sketches are built as PER-HOUR ARRAY
    BLOBS in ONE aggregation — collect_set's partial aggregation
    merges per-partition distinct sets map-side (the union half of
    the monoid) and the K-minima truncation runs once per set on the
    merged array, so the k-minima selection never sorts more than the
    set's distinct membership and no per-(hour,hash) row stream ever
    feeds a ranking window. The exact sizes ride the SAME aggregate
    (count over the distinct audience), and all downstream set
    algebra — θ, pair θ = min, |S ∩ [0,θ)| counts, intersection —
    is per-row array arithmetic on a 24-row frame: zero joins touch
    anything larger than the hour list. The exact-intersection gate
    lane replaces its audience self-join with one lag window per
    user (a user contributes to i(h) iff its next distinct hour is
    h+1). At 100 TB the blob aggregate shards by (hour, salt) first
    (union-and-truncate is associative), exactly like the HLL key's
    sketch merge; pair joins still touch only K-row blobs.
    """
    from pyspark.sql.window import Window as W

    m, K = THETA_M, THETA_K
    ev = load_table(spark, sf_dir, "events")
    aud = ev.select(
        F.hour("ts").cast("int").alias("h"), "user_id"
    ).distinct()
    hv = TH.portable_hash64(F.col("user_id").cast("string")) % m
    # ONE aggregation yields both the exact set size (distinct users)
    # and the sketch blob: the K smallest DISTINCT hash values
    # (collect_set dedups hash collisions exactly like the oracle's
    # DISTINCT (h, hv))
    sk = aud.groupBy("h").agg(
        F.count(F.lit(1)).alias("n"),
        F.slice(F.array_sort(F.collect_set(hv)), 1, K).alias("arr"),
    )
    # θ = the K-th smallest distinct hash, or P in exact mode (set
    # smaller than K) — element K of the sorted blob IS max(hv) of
    # the oracle's rank-≤K rows
    theta = (
        F.when(F.size("arr") < K, F.lit(m))
        .otherwise(F.element_at("arr", K))
        .cast("long")
    )
    ska = sk.select("h", "n", "arr", theta.alias("theta"))
    nxt_h = ska.select(
        (F.col("h") - 1).alias("h"),
        F.col("n").alias("snb"),
        F.col("arr").alias("arr_b"),
        F.col("theta").alias("theta_b"),
    )
    pr = ska.join(nxt_h, "h").select(
        "h",
        F.col("n").alias("sna"),
        "snb",
        "arr",
        "arr_b",
        F.least("theta", "theta_b").alias("t"),
    )

    def below_t(arr):
        return F.size(F.filter(arr, lambda x: x < F.col("t")))

    est = (
        pr.select(
            "h",
            "sna",
            "snb",
            "t",
            below_t(F.col("arr")).alias("na"),
            below_t(F.col("arr_b")).alias("nb"),
            below_t(F.array_intersect("arr", "arr_b")).alias("ni"),
        )
        # the oracle's est CTE INNER-joins the ca/cb count lanes, so an
        # hour whose A- or B-side sketch has no member below θ has no
        # row there (group never forms); ni rides a LEFT join → 0
        .filter((F.col("na") > 0) & (F.col("nb") > 0))
        .select(
            "h",
            "sna",
            "snb",
            # int64 `div` throughout: count·P ≤ 2^41, and double
            # division + cast could land one below the exact quotient
            F.expr(f"(na + nb - ni) * CAST({m} AS BIGINT) div t")
            .cast("long")
            .alias("est_union"),
            F.expr(f"ni * CAST({m} AS BIGINT) div t")
            .cast("long")
            .alias("est_inter"),
            F.expr(f"(na - ni) * CAST({m} AS BIGINT) div t")
            .cast("long")
            .alias("est_diff"),
        )
    )
    # exact intersection sizes: a user counts toward i(h) iff its next
    # distinct active hour is h+1 — one lag window per user replaces
    # the audience self-join on user_id (same shuffle key, half the
    # shuffled volume, no join fan-out)
    wu = W.partitionBy("user_id").orderBy("h")
    ic = (
        aud.withColumn("nxt", F.lead("h").over(wu))
        .filter((F.col("h") < 23) & (F.col("nxt") == F.col("h") + 1))
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    # hours with zero intersection still carry an exact row (the
    # oracle's LEFT JOIN + count(y.user_id) = 0)
    exact = (
        est.join(F.broadcast(ic), "h", "left")
        .withColumn("i", F.coalesce("i", F.lit(0)))
        .select(
            "h",
            "est_union",
            "est_inter",
            "est_diff",
            (F.col("sna") + F.col("snb") - F.col("i"))
            .cast("long")
            .alias("n_union"),
            F.col("i").cast("long").alias("n_inter"),
        )
    )
    return exact.select(
        "h",
        "est_union",
        "est_inter",
        "est_diff",
        "n_union",
        "n_inter",
        (
            F.abs(F.col("est_union") - F.col("n_union"))
            <= F.greatest(
                F.lit(THETA_UNION_ABS),
                (F.lit(THETA_UNION_PCT) * F.col("n_union") / 100).cast("long"),
            )
        ).alias("close_union"),
        (
            F.abs(F.col("est_inter") - F.col("n_inter"))
            <= F.greatest(
                F.lit(THETA_INTER_ABS),
                (F.lit(THETA_INTER_PCT) * F.col("n_inter") / 100).cast("long"),
            )
        ).alias("close_inter"),
    )


# --- agg_quantile_sketch -----------------------------------------------------

#: sample size per group — rank error is O(1/sqrt(K)); 256 gives
#: ~±3pp standard error at the median, gated in tests
QSK_K = 256
QSK_QS = (25, 50, 75, 90, 99)


def _qsketch_partial(batches):
    """Map-side sketch builder: per Arrow batch, keep the QSK_K rows
    with the smallest (h, vc) per group. Bottom-k is a MERGEABLE
    sketch (KMV sample): bottom-k of a union of bottom-k partials is
    the global bottom-k, so any partitioning/batching yields the
    identical final sample."""
    for pdf in batches:
        if not len(pdf):
            continue
        yield (
            pdf.sort_values(["h", "vc"], kind="mergesort")
            .groupby("flag", sort=False)
            .head(QSK_K)
        )[["flag", "h", "vc"]]


def _qsketch_oracle() -> str:
    h = TH.sql_portable_hash64(
        "CAST(l_orderkey * 8 + l_linenumber AS VARCHAR)"
    )
    qcols = ",\n           ".join(
        f"vals[CAST(({q} * (n - 1)) // 100 AS BIGINT) + 1] AS q{q}"
        for q in QSK_QS
    )
    return f"""
    WITH x AS (
      SELECT l_returnflag AS flag,
             {h} AS h,
             {sql_cents('l_extendedprice')} AS vc
      FROM lineitem
    ),
    r AS (
      SELECT flag, vc,
             row_number() OVER (PARTITION BY flag ORDER BY h, vc) AS rn
      FROM x
    ),
    v AS (
      SELECT flag, list_sort(list(vc)) AS vals, count(*) AS n
      FROM r WHERE rn <= {QSK_K} GROUP BY flag
    )
    SELECT flag AS l_returnflag,
           CAST(n AS BIGINT) AS n_samp,
           {qcols}
    FROM v
    """


@query("agg_quantile_sketch", oracle=_qsketch_oracle())
def agg_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABLE quantile sketch with an EXACT value oracle —
    completing the repo's sketch family (HLL, count-min, one-perm
    minhash, theta now have a quantile member). A t-digest's centroid
    layout depends on merge order, so no cross-engine value oracle
    can pin it; this operator instead uses the KMV-style
    deterministic bottom-k sample: per group keep the {QSK_K} rows
    whose portable 60-bit hash of a unique row key is smallest, then
    read quantiles off the value-sorted sample (index
    ⌊q·(k−1)/100⌋). The hash order is a fixed uniform permutation of
    the group, so the sample is a uniform-without-replacement sample
    — rank error O(1/√{QSK_K}), accuracy-gated in tests — while
    every engine that agrees on the hash agrees on the sample
    BIT-FOR-BIT, which is what lets the driver value-hash the output
    (agg_approx_quantile gates a boolean instead; this one matches
    values).

    Scale shape — the mergeable-sketch contract, same as
    agg_hll_partitioned: the map side (_qsketch_partial, one
    mapInPandas pass) collapses every Arrow batch to ≤{QSK_K} rows
    per group BEFORE any exchange, so the single groupBy shuffle
    moves O(batches·groups·{QSK_K}) sketch rows, never the fact
    table; the reduce side merges partials by sort+truncate (bottom-k
    union IS bottom-k) inside one collect_list aggregate bounded at
    partials·{QSK_K} elements per group. Adding more executors adds
    partials, not shuffle width. l_orderkey·8 + l_linenumber is
    unique per lineitem row (linenumber ≤ 7), so the hash is a
    per-row permutation draw.
    """
    li = load_table(spark, sf_dir, "lineitem")
    x = li.select(
        F.col("l_returnflag").alias("flag"),
        TH.portable_hash64(
            (F.col("l_orderkey") * 8 + F.col("l_linenumber"))
            .cast("long")
            .cast("string")
        ).alias("h"),
        cents(F.col("l_extendedprice")).alias("vc"),
    )
    part = x.mapInPandas(_qsketch_partial, "flag string, h long, vc long")
    merged = part.groupBy("flag").agg(
        F.slice(
            F.array_sort(F.collect_list(F.struct("h", "vc"))), 1, QSK_K
        ).alias("samp")
    )
    v = merged.select(
        "flag",
        F.array_sort(F.transform("samp", lambda s: s["vc"])).alias("vals"),
        F.size("samp").alias("n"),
    )
    # integer division: (q*(n-1)) div 100, matching the oracle
    qcols = [
        F.element_at(
            "vals",
            F.expr(f"CAST(({q} * (n - 1)) DIV 100 AS INT) + 1"),
        ).alias(f"q{q}")
        for q in QSK_QS
    ]
    return v.select(
        F.col("flag").alias("l_returnflag"),
        F.col("n").cast("long").alias("n_samp"),
        *qcols,
    )
