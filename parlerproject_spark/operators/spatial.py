"""Grid-bucketed spatial distance joins.

The reference carries GPS coordinates in EXIF metadata
(analysis/preview_data.ipynb cell 8: `GPSLatitude` /`GPSLongitude` DMS
strings) but never joins on them; proximity search over those
coordinates is the engine-added operator (paired with
functions/geo.dms_to_decimal, SURVEY F15).

Scale shape: a radius self-join done naively is a cross join —
O(n²) distance evaluations no cluster survives at 100 TB.  The
standard fix (uniform-grid spatial hashing, the same cell-bucket
strategy PostGIS/Sedona use before exact refinement) bounds the
candidate set: every point gets ONE home cell; the left side of the
join is exploded to its 3×3 neighbor cells; equi-joining exploded
cell == home cell yields exactly the point pairs whose cells are
adjacent, and the exact haversine predicate refines them.  Candidate
count is Σ_cell |cell|·|3×3 neighborhood| — linear in n for any
bounded point density, and the join is a plain hash equi-join on the
cell key, so it shuffles once and AQE skew-handling applies to hot
cells.  No distance is ever computed outside a 3×3 neighborhood.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0


def haversine_km(lat1: Column, lon1: Column, lat2: Column,
                 lon2: Column) -> Column:
    """Great-circle distance in km (haversine formula), pure JVM math
    — sin/cos/asin Column expressions, no UDF."""
    rlat1, rlat2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2 - lat1) / 2
    dlon = F.radians(lon2 - lon1) / 2
    a = (F.sin(dlat) * F.sin(dlat)
         + F.cos(rlat1) * F.cos(rlat2) * F.sin(dlon) * F.sin(dlon))
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))


def grid_distance_pairs(points: DataFrame, *, radius_km: float,
                        cell_deg: float, id_col: str = "id",
                        lat_col: str = "lat",
                        lon_col: str = "lon") -> DataFrame:
    """All unordered point pairs within `radius_km`, via a 3×3
    neighbor-cell equi-join instead of a cross join.

    `cell_deg` is the caller's completeness contract: any two points
    within `radius_km` must differ by < `cell_deg` in BOTH latitude
    and longitude degrees (latitude: radius_km/110.57; longitude:
    divide further by cos of the worst-case latitude in the data).
    Under that contract the 3×3 neighborhood of a point's home cell
    contains every true match, so the bucketed join is EXACT — the
    sf0.01 oracle checks it against a brute-force distance join.

    Pair uniqueness needs no distinct(): the right side sits in its
    single home cell, the left side is exploded to 9 cells, so a
    given (left, right) pair meets on exactly one cell key, and the
    strict left.id < right.id predicate keeps exactly one of the two
    orientations.
    Columns: id_a, id_b (id_a < id_b), dist_km (round 4).
    """
    cx = F.floor(F.col(lon_col) / F.lit(cell_deg)).cast("long")
    cy = F.floor(F.col(lat_col) / F.lit(cell_deg)).cast("long")
    home = points.select(
        F.col(id_col).alias("id"), F.col(lat_col).alias("lat"),
        F.col(lon_col).alias("lon"), cx.alias("cx"), cy.alias("cy"))
    off = F.expr("explode(flatten(transform(sequence(-1, 1), "
                 "dx -> transform(sequence(-1, 1), "
                 "dy -> struct(dx, dy)))))")
    left = (home.select("*", off.alias("o"))
            .select(F.col("id").alias("id_a"), F.col("lat").alias("lat_a"),
                    F.col("lon").alias("lon_a"),
                    (F.col("cx") + F.col("o.dx")).alias("jx"),
                    (F.col("cy") + F.col("o.dy")).alias("jy")))
    right = home.select(F.col("id").alias("id_b"),
                        F.col("lat").alias("lat_b"),
                        F.col("lon").alias("lon_b"),
                        F.col("cx").alias("jx"), F.col("cy").alias("jy"))
    dist = F.round(haversine_km(F.col("lat_a"), F.col("lon_a"),
                                F.col("lat_b"), F.col("lon_b")), 4)
    return (left.join(right, ["jx", "jy"])
            .filter(F.col("id_a") < F.col("id_b"))
            .withColumn("dist_km", dist)
            .filter(F.col("dist_km") <= radius_km)
            .select("id_a", "id_b", "dist_km"))
