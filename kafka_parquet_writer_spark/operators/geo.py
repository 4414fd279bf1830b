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


# --- join_point_in_polygon --------------------------------------------------

#: literal polygons in integer deci-degrees, (lon, lat) vertex lists.
#: "ell" is concave — the case a bbox test gets wrong and ray casting
#: must handle. Space: lon ∈ [-1800, 1800), lat ∈ [-600, 600).
POLYGONS = {
    "ell": [(-1200, -600), (0, -600), (0, -300), (-600, -300),
            (-600, 0), (-1200, 0)],
    "tri": [(300, -300), (900, -300), (600, 300)],
    "box": [(1000, 200), (1600, 200), (1600, 550), (1000, 550)],
}
PIP_CELL = 300  #: grid cell size in deci-degrees


def _pip_cells() -> list[tuple[int, str]]:
    """(cell_id, polygon) coverage rows from each polygon's bbox —
    the candidate-generation map (a superset of the polygon: exact
    ray cast decides)."""
    rows = []
    for name, verts in POLYGONS.items():
        xs = [v[0] for v in verts]
        ys = [v[1] for v in verts]
        for cx in range((min(xs) + 1800) // PIP_CELL,
                        (max(xs) + 1800) // PIP_CELL + 1):
            for cy in range((min(ys) + 600) // PIP_CELL,
                            (max(ys) + 600) // PIP_CELL + 1):
                rows.append((cx * 100 + cy, name))
    return rows


def _crossings_sql(name: str, px: str, py: str) -> str:
    """Integer-exact ray-cast crossing count for one polygon: edge
    (x1,y1)→(x2,y2) crosses the +x ray from (px,py) iff the edge
    straddles py half-open and the intersection is right of px —
    px < x1 + (py−y1)(x2−x1)/(y2−y1), cross-multiplied by dy with a
    sign flip so it stays integer."""
    verts = POLYGONS[name]
    terms = []
    for i, (x1, y1) in enumerate(verts):
        x2, y2 = verts[(i + 1) % len(verts)]
        dy = y2 - y1
        if dy == 0:
            continue  # horizontal edge never straddles half-open
        sgn = 1 if dy > 0 else -1
        terms.append(
            f"(CASE WHEN (({y1} > {py}) <> ({y2} > {py}))"
            f" AND ((({px}) - {x1}) * {dy} - (({py}) - {y1}) * {x2 - x1})"
            f" * {sgn} < 0 THEN 1 ELSE 0 END)"
        )
    return " + ".join(terms)


def _crossings_col(name: str, px, py):
    verts = POLYGONS[name]
    total = None
    for i, (x1, y1) in enumerate(verts):
        x2, y2 = verts[(i + 1) % len(verts)]
        dy = y2 - y1
        if dy == 0:
            continue
        sgn = 1 if dy > 0 else -1
        straddle = (F.lit(y1) > py) != (F.lit(y2) > py)
        right = ((px - x1) * dy - (py - y1) * (x2 - x1)) * sgn < 0
        term = F.when(straddle & right, 1).otherwise(0)
        total = term if total is None else total + term
    return total


def _pip_oracle() -> str:
    lat, lon = _pos_sql("event_id", "user_id")
    arms = " UNION ALL ".join(
        f"""SELECT '{name}' AS poly, event_id
            FROM pts WHERE ({_crossings_sql(name, 'lon', 'lat')}) % 2 = 1"""
        for name in sorted(POLYGONS)
    )
    return f"""
    WITH pts AS (
      SELECT event_id, {lat} AS lat, {lon} AS lon FROM events
    )
    SELECT poly, count(*) AS n_inside,
           CAST(sum(event_id) AS BIGINT) AS id_sum
    FROM ({arms})
    GROUP BY poly
    """


@query("join_point_in_polygon", oracle=_pip_oracle())
def join_point_in_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-polygon join, grid-bucketed: each synthetic event
    position maps to its {PIP_CELL}-deci-degree grid cell; polygons
    pre-expand to their bbox cell coverage (a tiny literal map,
    broadcast); candidates meet in an equi-join on cell id and an
    INTEGER-EXACT ray cast (cross-multiplied intersection compare —
    no division, no floats, so cell-boundary and edge cases are
    engine-identical) decides containment, including the concave
    polygon a bbox test would get wrong. The oracle ray-casts every
    point against every polygon with no grid, so a green row proves
    the candidate map lossless.

    Scale shape: the polygon→cell map is O(polygons × bbox cells) and
    broadcast; the fact table is filtered to candidate cells BEFORE
    any exact math — cost ∝ points in covered cells, never
    points × polygons. Real GIS sharding (quadtrees, H3) refines the
    same candidate-then-verify pattern; the ray cast stays per-row.
    """
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    lat, lon = _pos_cols("event_id", "user_id")
    pts = ev.select("event_id", lat.alias("lat"), lon.alias("lon"))
    pts = pts.withColumn(
        "cell",
        ((F.col("lon") + 1800) / PIP_CELL).cast("int") * 100
        + ((F.col("lat") + 600) / PIP_CELL).cast("int"),
    )
    cells = spark.createDataFrame(_pip_cells(), "cell int, poly string")
    cand = pts.join(F.broadcast(cells), "cell")
    crossings = None
    for name in sorted(POLYGONS):
        c = _crossings_col(name, F.col("lon"), F.col("lat"))
        crossings = (
            F.when(F.col("poly") == name, c)
            if crossings is None
            else crossings.when(F.col("poly") == name, c)
        )
    inside = cand.filter(crossings % 2 == 1)
    return inside.groupBy("poly").agg(
        F.count(F.lit(1)).alias("n_inside"),
        F.sum("event_id").alias("id_sum"),
    )
