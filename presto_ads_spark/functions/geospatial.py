"""Geospatial-lite: the point/envelope subset of the reference's 98
ST_* functions (presto-geospatial/.../GeoFunctions.java).

Full OGC geometry needs a library (Apache Sedona provides the same ST_*
names on Spark — drop-in when available on the cluster; SURVEY.md §2.4
marks geospatial phase-late/optional). The subset here is dependency-free
and exact: points are ``struct<x double, y double>``, envelopes are
``struct<xmin, ymin, xmax, ymax>`` — which covers the distance /
containment / intersection predicates that power the reference's spatial
join (SpatialJoinOperator, ExtractSpatialJoins.java:101-109), expressed as
plain Spark expressions so a broadcast spatial join is just
``small.join(big, st_contains(...))``.
"""

GEOSPATIAL_SQL_FUNCTIONS: list[str] = [
    """CREATE OR REPLACE TEMPORARY FUNCTION st_point(x DOUBLE, y DOUBLE)
       RETURNS STRUCT<x: DOUBLE, y: DOUBLE> RETURN named_struct('x', x, 'y', y)""",
    """CREATE OR REPLACE TEMPORARY FUNCTION st_x(p STRUCT<x: DOUBLE, y: DOUBLE>)
       RETURNS DOUBLE RETURN p.x""",
    """CREATE OR REPLACE TEMPORARY FUNCTION st_y(p STRUCT<x: DOUBLE, y: DOUBLE>)
       RETURNS DOUBLE RETURN p.y""",
    """CREATE OR REPLACE TEMPORARY FUNCTION st_distance(
         a STRUCT<x: DOUBLE, y: DOUBLE>, b STRUCT<x: DOUBLE, y: DOUBLE>)
       RETURNS DOUBLE RETURN sqrt((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y))""",
    """CREATE OR REPLACE TEMPORARY FUNCTION st_make_envelope(
         xmin DOUBLE, ymin DOUBLE, xmax DOUBLE, ymax DOUBLE)
       RETURNS STRUCT<xmin: DOUBLE, ymin: DOUBLE, xmax: DOUBLE, ymax: DOUBLE>
       RETURN named_struct('xmin', xmin, 'ymin', ymin, 'xmax', xmax, 'ymax', ymax)""",
    """CREATE OR REPLACE TEMPORARY FUNCTION st_contains(
         env STRUCT<xmin: DOUBLE, ymin: DOUBLE, xmax: DOUBLE, ymax: DOUBLE>,
         p STRUCT<x: DOUBLE, y: DOUBLE>)
       RETURNS BOOLEAN RETURN
         p.x >= env.xmin AND p.x <= env.xmax AND p.y >= env.ymin AND p.y <= env.ymax""",
    """CREATE OR REPLACE TEMPORARY FUNCTION st_within(
         p STRUCT<x: DOUBLE, y: DOUBLE>,
         env STRUCT<xmin: DOUBLE, ymin: DOUBLE, xmax: DOUBLE, ymax: DOUBLE>)
       RETURNS BOOLEAN RETURN st_contains(env, p)""",
    """CREATE OR REPLACE TEMPORARY FUNCTION st_area(
         env STRUCT<xmin: DOUBLE, ymin: DOUBLE, xmax: DOUBLE, ymax: DOUBLE>)
       RETURNS DOUBLE RETURN (env.xmax - env.xmin) * (env.ymax - env.ymin)""",
    """CREATE OR REPLACE TEMPORARY FUNCTION st_intersects_env(
         a STRUCT<xmin: DOUBLE, ymin: DOUBLE, xmax: DOUBLE, ymax: DOUBLE>,
         b STRUCT<xmin: DOUBLE, ymin: DOUBLE, xmax: DOUBLE, ymax: DOUBLE>)
       RETURNS BOOLEAN RETURN
         a.xmin <= b.xmax AND b.xmin <= a.xmax AND a.ymin <= b.ymax AND b.ymin <= a.ymax""",
    # --- BingTileFunctions.java: Web-Mercator tile math (pure integer /
    #     trig; the spatial-indexing primitive for tile-bucketed joins) ----
    """CREATE OR REPLACE TEMPORARY FUNCTION bing_tile_x(lon DOUBLE, zoom INT)
       RETURNS INT RETURN
         CAST(least(greatest(floor((lon + 180.0) / 360.0 * shiftleft(1, zoom)), 0),
                    shiftleft(1, zoom) - 1) AS INT)""",
    """CREATE OR REPLACE TEMPORARY FUNCTION bing_tile_y(lat DOUBLE, zoom INT)
       RETURNS INT RETURN
         CAST(least(greatest(floor((1.0 - ln(tan(radians(lat)) + 1.0 / cos(radians(lat))) / pi())
                    / 2.0 * shiftleft(1, zoom)), 0), shiftleft(1, zoom) - 1) AS INT)""",
    # quadkey: base-4 string of interleaved x/y bits, length = zoom.
    """CREATE OR REPLACE TEMPORARY FUNCTION bing_tile_quadkey(tx INT, ty INT, zoom INT)
       RETURNS STRING RETURN
         array_join(transform(sequence(zoom, 1, -1),
           i -> CAST((CASE WHEN (tx & shiftleft(1, i - 1)) > 0 THEN 1 ELSE 0 END)
                   + (CASE WHEN (ty & shiftleft(1, i - 1)) > 0 THEN 2 ELSE 0 END) AS STRING)), '')""",
]
