"""Geospatial-shaped neighbor join: radius search via grid cells.

The fixture has no coordinates, so each event gets a deterministic
synthetic position in integer DECI-DEGREES (exact integer arithmetic
end to end — float degrees would make grid assignment and distance
engine-sensitive at cell boundaries). The operator shape is the real
one: points bucket into grid cells sized >= the search radius, each
probe point expands to its 3x3 cell neighborhood, candidates meet in
an equi-join on cell id, and the exact distance predicate verifies —
the same candidate-generation-then-verify pattern as the embedding
grid join (operators/dedup.py), in 2-d.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_parquet_writer_spark.catalog import load_table
from kafka_parquet_writer_spark.registry import query

#: search radius and grid cell size, in deci-degrees (cell >= radius)
GEO_RADIUS_D = 15
GEO_CELL_D = 15
#: synthetic position generators (integer deci-degrees)
#: lat in [-600, 600), lon in [-1800, 1800)


def _pos_sql(id_expr: str, key_expr: str) -> tuple[str, str]:
    lat = f"(({key_expr} * 37 + {id_expr} * 11) % 1200 - 600)"
    lon = f"(({id_expr} * 73 + {key_expr} * 17) % 3600 - 1800)"
    return lat, lon


def _pos_cols(id_col: str, key_col: str) -> tuple[F.Column, F.Column]:
    lat = (F.col(key_col) * 37 + F.col(id_col) * 11) % 1200 - 600
    lon = (F.col(id_col) * 73 + F.col(key_col) * 17) % 3600 - 1800
    return lat, lon


def _geo_oracle() -> str:
    lat_a, lon_a = _pos_sql("a.event_id", "a.user_id")
    lat_b, lon_b = _pos_sql("b.event_id", "b.user_id")
    return f"""
    SELECT a.event_id AS a_id, b.event_id AS b_id,
           CAST(({lat_a} - {lat_b}) * ({lat_a} - {lat_b})
              + ({lon_a} - {lon_b}) * ({lon_a} - {lon_b}) AS BIGINT)
             AS dist2
    FROM (SELECT event_id, user_id FROM events
          WHERE event_type = 'purchase') a
    JOIN (SELECT event_id, user_id FROM events
          WHERE event_type = 'signup') b
      ON ({lat_a} - {lat_b}) * ({lat_a} - {lat_b})
       + ({lon_a} - {lon_b}) * ({lon_a} - {lon_b})
         <= {GEO_RADIUS_D * GEO_RADIUS_D}
    """


@query("join_geo_radius", oracle=_geo_oracle())
def join_geo_radius(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius neighbor join: every purchase event paired with the
    signup events within {GEO_RADIUS_D} deci-degrees of its synthetic
    position (flat-grid distance — the operator shape, not great-
    circle math). Probe points expand to their 3x3 grid neighborhood
    (cell size = radius, so any in-radius neighbor shares one of the
    9 cells — lossless); candidates meet in an **equi-join on cell**,
    then the exact distance predicate verifies. The oracle is the
    naive all-pairs join, so a green row proves the grid is lossless.

    Scale shape: cost ~ sum over cells of |A_cell_nbhd| x |B_cell| —
    density-bounded, never |A| x |B|; skewed cells (urban cores)
    split by refining the grid exactly like the embedding grid join.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type"
    )
    lat, lon = _pos_cols("event_id", "user_id")
    pts = ev.select(
        "event_id", "event_type", lat.alias("lat"), lon.alias("lon")
    )
    a = pts.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("a_id"),
        F.col("lat").alias("lat_a"),
        F.col("lon").alias("lon_a"),
    )
    b = pts.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("b_id"),
        F.col("lat").alias("lat_b"),
        F.col("lon").alias("lon_b"),
        F.floor(F.col("lat") / GEO_CELL_D).alias("cy"),
        F.floor(F.col("lon") / GEO_CELL_D).alias("cx"),
    )
    probe = (
        a.withColumn("dy", F.explode(F.array(*[F.lit(i) for i in (-1, 0, 1)])))
        .withColumn("dx", F.explode(F.array(*[F.lit(i) for i in (-1, 0, 1)])))
        .select(
            "a_id",
            "lat_a",
            "lon_a",
            (F.floor(F.col("lat_a") / GEO_CELL_D) + F.col("dy")).alias("cy"),
            (F.floor(F.col("lon_a") / GEO_CELL_D) + F.col("dx")).alias("cx"),
        )
    )
    dist2 = (
        (F.col("lat_a") - F.col("lat_b")) * (F.col("lat_a") - F.col("lat_b"))
        + (F.col("lon_a") - F.col("lon_b"))
        * (F.col("lon_a") - F.col("lon_b"))
    )
    return (
        probe.join(b, ["cy", "cx"])
        .filter(dist2 <= GEO_RADIUS_D * GEO_RADIUS_D)
        .select("a_id", "b_id", dist2.cast("long").alias("dist2"))
    )
