"""Geospatial functions — a dependency-free planar subset of the
reference's 98 ST_* functions (presto-geospatial/.../GeoFunctions.java),
expressed entirely as JVM-side Spark SQL expressions (no Python, no
geometry library).

Geometry representation: ``STRUCT<gtype: STRING, pts: ARRAY<STRUCT<x
DOUBLE, y DOUBLE>>>`` — POINT (1 pt), LINESTRING (n pts), POLYGON (one
closed exterior ring, first = last). WKT parse/serialize covers exactly
those shapes; MULTI*/holes/EMPTY are out of scope (use Apache Sedona for
full OGC geometry on a real cluster — same ST_* names, drop-in).

Implementation note: Spark SQL temp functions cannot be CALLED from inside
higher-order-function lambdas (the analyzer loses the lambda variable when
inlining), so the segment/orientation primitives below are Python-side
*expression templates* inlined into each lambda body at registration time.

Semantics notes (documented deviations):
- ST_Contains/ST_Within are boundary-INCLUSIVE (ST_Covers-style): a point
  on the polygon boundary is contained. OGC's boundary-exclusion corner
  is not modeled.
- ST_Distance is exact for all supported shape pairs when the shapes do
  not intersect (min over vertex-to-segment distances, where segment-pair
  minima are attained) and 0 when they do.
- ST_AsText prints Spark double repr ('1.0', not ESRI's '1').

The predicate set powers the reference's spatial join
(SpatialJoinOperator, ExtractSpatialJoins.java:101-109): a broadcast
spatial join is just ``small.join(big, st_contains(...))`` and the
bing-tile functions provide the tile-bucketed equi-join path for
fact-fact spatial joins at scale.
"""

_G = "STRUCT<gtype: STRING, pts: ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>>"
_PTS = "ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>"


# --- expression templates (inlined — see implementation note above) -------


def _orient(ax, ay, bx, by, cx, cy) -> str:
    """Signed double area of triangle abc (positive = counter-clockwise)."""
    return (
        f"(({bx} - {ax}) * ({cy} - {ay}) - ({by} - {ay}) * ({cx} - {ax}))"
    )


def _on_seg(ax, ay, bx, by, px, py) -> str:
    """Point p collinear with and inside the bbox of segment ab."""
    return (
        f"({_orient(ax, ay, bx, by, px, py)} = 0.0"
        f" AND {px} >= least({ax}, {bx}) AND {px} <= greatest({ax}, {bx})"
        f" AND {py} >= least({ay}, {by}) AND {py} <= greatest({ay}, {by}))"
    )


def _seg_intersects(ax, ay, bx, by, cx, cy, dx, dy) -> str:
    """Segments ab and cd share at least one point (proper crossing via
    opposite orientations, or an endpoint on the other segment)."""
    return (
        f"((sign({_orient(cx, cy, dx, dy, ax, ay)})"
        f"  * sign({_orient(cx, cy, dx, dy, bx, by)}) < 0"
        f"  AND sign({_orient(ax, ay, bx, by, cx, cy)})"
        f"  * sign({_orient(ax, ay, bx, by, dx, dy)}) < 0)"
        f" OR {_on_seg(cx, cy, dx, dy, ax, ay)}"
        f" OR {_on_seg(cx, cy, dx, dy, bx, by)}"
        f" OR {_on_seg(ax, ay, bx, by, cx, cy)}"
        f" OR {_on_seg(ax, ay, bx, by, dx, dy)})"
    )


def _pt_seg_dist(px, py, ax, ay, bx, by) -> str:
    """Distance from p to segment ab (projection clamped to [0,1])."""
    d2 = f"(({bx} - {ax}) * ({bx} - {ax}) + ({by} - {ay}) * ({by} - {ay}))"
    t = (
        f"least(greatest((({px} - {ax}) * ({bx} - {ax})"
        f" + ({py} - {ay}) * ({by} - {ay})) / {d2}, 0.0), 1.0)"
    )
    return (
        f"(CASE WHEN {d2} = 0.0"
        f" THEN sqrt(power({px} - {ax}, 2) + power({py} - {ay}, 2))"
        f" ELSE sqrt(power({px} - ({ax} + {t} * ({bx} - {ax})), 2)"
        f"         + power({py} - ({ay} + {t} * ({by} - {ay})), 2)) END)"
    )


def _ring_contains(pts, px, py) -> str:
    """Boundary-inclusive point-in-ring: on-edge OR odd crossing parity."""
    xi, yi = f"element_at({pts}, i).x", f"element_at({pts}, i).y"
    xj, yj = f"element_at({pts}, i + 1).x", f"element_at({pts}, i + 1).y"
    return (
        f"(exists(sequence(1, size({pts}) - 1), i ->"
        f" {_on_seg(xi, yi, xj, yj, px, py)})"
        f" OR aggregate(sequence(1, size({pts}) - 1), 0, (acc, i) ->"
        f" acc + CASE WHEN (({yi} <= {py} AND {yj} > {py})"
        f" OR ({yj} <= {py} AND {yi} > {py}))"
        f" AND {px} < {xi} + ({py} - {yi}) * ({xj} - {xi}) / ({yj} - {yi})"
        f" THEN 1 ELSE 0 END) % 2 = 1)"
    )


def _pt_chain_dist(px, py, pts) -> str:
    """Min distance from p to a point chain (vertices + segments)."""
    xi, yi = f"element_at({pts}, i).x", f"element_at({pts}, i).y"
    xj, yj = f"element_at({pts}, i + 1).x", f"element_at({pts}, i + 1).y"
    return (
        f"(CASE WHEN size({pts}) = 1"
        f" THEN sqrt(power({px} - element_at({pts}, 1).x, 2)"
        f"         + power({py} - element_at({pts}, 1).y, 2))"
        f" ELSE aggregate(sequence(1, size({pts}) - 1),"
        f" CAST('Infinity' AS DOUBLE), (acc, i) ->"
        f" least(acc, {_pt_seg_dist(px, py, xi, yi, xj, yj)})) END)"
    )


def _chains_intersect(a, b) -> str:
    """Any segment of chain a intersects any segment of chain b."""
    ax, ay = f"element_at({a}, i).x", f"element_at({a}, i).y"
    bx = f"element_at({a}, least(i + 1, size({a}))).x"
    by = f"element_at({a}, least(i + 1, size({a}))).y"
    cx, cy = f"element_at({b}, j).x", f"element_at({b}, j).y"
    dx = f"element_at({b}, least(j + 1, size({b}))).x"
    dy = f"element_at({b}, least(j + 1, size({b}))).y"
    return (
        f"(exists(sequence(1, greatest(size({a}) - 1, 1)), i ->"
        f" exists(sequence(1, greatest(size({b}) - 1, 1)), j ->"
        f" {_seg_intersects(ax, ay, bx, by, cx, cy, dx, dy)})))"
    )


_SHOELACE = (
    "aggregate(sequence(1, size(g.pts) - 1), CAST(0.0 AS DOUBLE), (acc, i) ->"
    " acc + element_at(g.pts, i).x * element_at(g.pts, i + 1).y"
    " - element_at(g.pts, i + 1).x * element_at(g.pts, i).y)"
)


GEOSPATIAL_SQL_FUNCTIONS: list[str] = [
    # --- helper functions (top-level-callable; bodies are inlined
    #     templates so their own lambdas never call a SQL UDF) ------------
    f"""CREATE OR REPLACE TEMPORARY FUNCTION geo_ring_contains(
         pts {_PTS}, px DOUBLE, py DOUBLE)
       RETURNS BOOLEAN RETURN {_ring_contains("pts", "px", "py")}""",
    f"""CREATE OR REPLACE TEMPORARY FUNCTION geo_pt_chain_dist(
         px DOUBLE, py DOUBLE, pts {_PTS})
       RETURNS DOUBLE RETURN {_pt_chain_dist("px", "py", "pts")}""",
    f"""CREATE OR REPLACE TEMPORARY FUNCTION geo_chains_intersect(
         a {_PTS}, b {_PTS})
       RETURNS BOOLEAN RETURN {_chains_intersect("a", "b")}""",
    # --- constructors & accessors (GeoFunctions.java) --------------------
    """CREATE OR REPLACE TEMPORARY FUNCTION st_point(x DOUBLE, y DOUBLE)
       RETURNS STRUCT<gtype: STRING, pts: ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>>
       RETURN named_struct('gtype', 'POINT',
                           'pts', array(named_struct('x', x, 'y', y)))""",
    f"""CREATE OR REPLACE TEMPORARY FUNCTION st_geometry_from_text(wkt STRING)
       RETURNS {_G} RETURN named_struct(
         'gtype', upper(trim(split(wkt, '\\\\(')[0])),
         'pts', transform(
            split(regexp_extract(wkt, '\\\\(+([^()]*)\\\\)+', 1), '\\\\s*,\\\\s*'),
            s -> named_struct(
              'x', CAST(split(trim(s), '\\\\s+')[0] AS DOUBLE),
              'y', CAST(split(trim(s), '\\\\s+')[1] AS DOUBLE))))""",
    f"""CREATE OR REPLACE TEMPORARY FUNCTION st_astext(g {_G})
       RETURNS STRING RETURN CASE g.gtype
         WHEN 'POINT' THEN concat('POINT (',
           CAST(element_at(g.pts, 1).x AS STRING), ' ',
           CAST(element_at(g.pts, 1).y AS STRING), ')')
         WHEN 'LINESTRING' THEN concat('LINESTRING (', array_join(
           transform(g.pts, p -> concat(CAST(p.x AS STRING), ' ', CAST(p.y AS STRING))), ', '), ')')
         WHEN 'POLYGON' THEN concat('POLYGON ((', array_join(
           transform(g.pts, p -> concat(CAST(p.x AS STRING), ' ', CAST(p.y AS STRING))), ', '), '))')
       END""",
    f"""CREATE OR REPLACE TEMPORARY FUNCTION st_geometry_type(g {_G})
       RETURNS STRING RETURN concat('ST_', initcap(lower(g.gtype)))""",
    f"""CREATE OR REPLACE TEMPORARY FUNCTION st_x(g {_G})
       RETURNS DOUBLE RETURN element_at(g.pts, 1).x""",
    f"""CREATE OR REPLACE TEMPORARY FUNCTION st_y(g {_G})
       RETURNS DOUBLE RETURN element_at(g.pts, 1).y""",
    f"""CREATE OR REPLACE TEMPORARY FUNCTION st_xmin(g {_G})
       RETURNS DOUBLE RETURN array_min(transform(g.pts, p -> p.x))""",
    f"""CREATE OR REPLACE TEMPORARY FUNCTION st_xmax(g {_G})
       RETURNS DOUBLE RETURN array_max(transform(g.pts, p -> p.x))""",
    f"""CREATE OR REPLACE TEMPORARY FUNCTION st_ymin(g {_G})
       RETURNS DOUBLE RETURN array_min(transform(g.pts, p -> p.y))""",
    f"""CREATE OR REPLACE TEMPORARY FUNCTION st_ymax(g {_G})
       RETURNS DOUBLE RETURN array_max(transform(g.pts, p -> p.y))""",
    f"""CREATE OR REPLACE TEMPORARY FUNCTION st_num_points(g {_G})
       RETURNS INT RETURN CASE WHEN g.gtype = 'POLYGON'
         THEN size(g.pts) - 1 ELSE size(g.pts) END""",
    f"""CREATE OR REPLACE TEMPORARY FUNCTION st_point_n(g {_G}, i INT)
       RETURNS {_G} RETURN named_struct('gtype', 'POINT',
         'pts', array(element_at(g.pts, i)))""",
    f"""CREATE OR REPLACE TEMPORARY FUNCTION st_is_closed(g {_G})
       RETURNS BOOLEAN RETURN size(g.pts) > 1
         AND element_at(g.pts, 1) = element_at(g.pts, size(g.pts))""",
    f"""CREATE OR REPLACE TEMPORARY FUNCTION st_is_empty(g {_G})
       RETURNS BOOLEAN RETURN size(g.pts) = 0""",
    f"""CREATE OR REPLACE TEMPORARY FUNCTION st_exterior_ring(g {_G})
       RETURNS {_G} RETURN named_struct('gtype', 'LINESTRING', 'pts', g.pts)""",
    f"""CREATE OR REPLACE TEMPORARY FUNCTION st_boundary(g {_G})
       RETURNS {_G} RETURN named_struct('gtype', 'LINESTRING', 'pts', g.pts)""",
    """CREATE OR REPLACE TEMPORARY FUNCTION st_make_envelope(
         xmin DOUBLE, ymin DOUBLE, xmax DOUBLE, ymax DOUBLE)
       RETURNS STRUCT<gtype: STRING, pts: ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>>
       RETURN named_struct('gtype', 'POLYGON', 'pts', array(
         named_struct('x', xmin, 'y', ymin), named_struct('x', xmax, 'y', ymin),
         named_struct('x', xmax, 'y', ymax), named_struct('x', xmin, 'y', ymax),
         named_struct('x', xmin, 'y', ymin)))""",
    f"""CREATE OR REPLACE TEMPORARY FUNCTION st_envelope(g {_G})
       RETURNS {_G} RETURN st_make_envelope(st_xmin(g), st_ymin(g), st_xmax(g), st_ymax(g))""",
    # --- measures --------------------------------------------------------
    f"""CREATE OR REPLACE TEMPORARY FUNCTION st_area(g {_G})
       RETURNS DOUBLE RETURN CASE WHEN g.gtype = 'POLYGON'
         THEN abs({_SHOELACE}) / 2.0 ELSE 0.0 END""",
    f"""CREATE OR REPLACE TEMPORARY FUNCTION st_length(g {_G})
       RETURNS DOUBLE RETURN CASE WHEN g.gtype IN ('LINESTRING', 'POLYGON')
         THEN aggregate(sequence(1, size(g.pts) - 1), CAST(0.0 AS DOUBLE), (acc, i) ->
           acc + sqrt(power(element_at(g.pts, i + 1).x - element_at(g.pts, i).x, 2)
                    + power(element_at(g.pts, i + 1).y - element_at(g.pts, i).y, 2)))
         ELSE NULL END""",
    f"""CREATE OR REPLACE TEMPORARY FUNCTION st_centroid(g {_G})
       RETURNS {_G} RETURN CASE g.gtype
         WHEN 'POINT' THEN g
         WHEN 'LINESTRING' THEN named_struct('gtype', 'POINT', 'pts', array(named_struct(
           'x', aggregate(g.pts, CAST(0.0 AS DOUBLE), (a, p) -> a + p.x) / size(g.pts),
           'y', aggregate(g.pts, CAST(0.0 AS DOUBLE), (a, p) -> a + p.y) / size(g.pts))))
         WHEN 'POLYGON' THEN named_struct('gtype', 'POINT', 'pts', array(named_struct(
           'x', aggregate(sequence(1, size(g.pts) - 1), CAST(0.0 AS DOUBLE), (acc, i) ->
                  acc + (element_at(g.pts, i).x + element_at(g.pts, i + 1).x)
                      * (element_at(g.pts, i).x * element_at(g.pts, i + 1).y
                         - element_at(g.pts, i + 1).x * element_at(g.pts, i).y))
                / (3.0 * {_SHOELACE}),
           'y', aggregate(sequence(1, size(g.pts) - 1), CAST(0.0 AS DOUBLE), (acc, i) ->
                  acc + (element_at(g.pts, i).y + element_at(g.pts, i + 1).y)
                      * (element_at(g.pts, i).x * element_at(g.pts, i + 1).y
                         - element_at(g.pts, i + 1).x * element_at(g.pts, i).y))
                / (3.0 * {_SHOELACE}))))
       END""",
    # --- predicates ------------------------------------------------------
    f"""CREATE OR REPLACE TEMPORARY FUNCTION st_contains(outer_g {_G}, inner_g {_G})
       RETURNS BOOLEAN RETURN CASE
         WHEN outer_g.gtype = 'POLYGON' AND inner_g.gtype = 'POINT' THEN
           geo_ring_contains(outer_g.pts,
             element_at(inner_g.pts, 1).x, element_at(inner_g.pts, 1).y)
         WHEN outer_g.gtype = 'POLYGON' THEN
           forall(inner_g.pts, p -> {_ring_contains("outer_g.pts", "p.x", "p.y")})
         WHEN outer_g.gtype = 'POINT' THEN
           inner_g.gtype = 'POINT' AND element_at(outer_g.pts, 1) = element_at(inner_g.pts, 1)
         ELSE FALSE END""",
    f"""CREATE OR REPLACE TEMPORARY FUNCTION st_within(inner_g {_G}, outer_g {_G})
       RETURNS BOOLEAN RETURN st_contains(outer_g, inner_g)""",
    f"""CREATE OR REPLACE TEMPORARY FUNCTION st_intersects(a {_G}, b {_G})
       RETURNS BOOLEAN RETURN
         st_xmin(a) <= st_xmax(b) AND st_xmin(b) <= st_xmax(a)
         AND st_ymin(a) <= st_ymax(b) AND st_ymin(b) <= st_ymax(a)
         AND (
           CASE WHEN a.gtype = 'POINT' AND b.gtype = 'POINT'
                  THEN element_at(a.pts, 1) = element_at(b.pts, 1)
                WHEN a.gtype = 'POINT' AND b.gtype = 'POLYGON'
                  THEN geo_ring_contains(b.pts, element_at(a.pts, 1).x, element_at(a.pts, 1).y)
                WHEN b.gtype = 'POINT' AND a.gtype = 'POLYGON'
                  THEN geo_ring_contains(a.pts, element_at(b.pts, 1).x, element_at(b.pts, 1).y)
                WHEN a.gtype = 'POINT'
                  THEN geo_pt_chain_dist(element_at(a.pts, 1).x, element_at(a.pts, 1).y, b.pts) = 0.0
                WHEN b.gtype = 'POINT'
                  THEN geo_pt_chain_dist(element_at(b.pts, 1).x, element_at(b.pts, 1).y, a.pts) = 0.0
                ELSE geo_chains_intersect(a.pts, b.pts)
                  OR (a.gtype = 'POLYGON' AND geo_ring_contains(a.pts,
                        element_at(b.pts, 1).x, element_at(b.pts, 1).y))
                  OR (b.gtype = 'POLYGON' AND geo_ring_contains(b.pts,
                        element_at(a.pts, 1).x, element_at(a.pts, 1).y))
           END)""",
    f"""CREATE OR REPLACE TEMPORARY FUNCTION st_disjoint(a {_G}, b {_G})
       RETURNS BOOLEAN RETURN NOT st_intersects(a, b)""",
    f"""CREATE OR REPLACE TEMPORARY FUNCTION st_equals(a {_G}, b {_G})
       RETURNS BOOLEAN RETURN a.gtype = b.gtype AND a.pts = b.pts""",
    f"""CREATE OR REPLACE TEMPORARY FUNCTION st_distance(a {_G}, b {_G})
       RETURNS DOUBLE RETURN CASE
         WHEN st_intersects(a, b) THEN 0.0
         WHEN a.gtype = 'POINT'
           THEN geo_pt_chain_dist(element_at(a.pts, 1).x, element_at(a.pts, 1).y, b.pts)
         WHEN b.gtype = 'POINT'
           THEN geo_pt_chain_dist(element_at(b.pts, 1).x, element_at(b.pts, 1).y, a.pts)
         ELSE least(
           array_min(transform(a.pts, p -> {_pt_chain_dist("p.x", "p.y", "b.pts")})),
           array_min(transform(b.pts, p -> {_pt_chain_dist("p.x", "p.y", "a.pts")})))
         END""",
    # legacy alias kept from round 1 (envelope-overlap test on two geoms)
    f"""CREATE OR REPLACE TEMPORARY FUNCTION st_intersects_env(a {_G}, b {_G})
       RETURNS BOOLEAN RETURN
         st_xmin(a) <= st_xmax(b) AND st_xmin(b) <= st_xmax(a)
         AND st_ymin(a) <= st_ymax(b) AND st_ymin(b) <= st_ymax(a)""",
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
