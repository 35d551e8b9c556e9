"""Geospatial functions — a dependency-free planar subset of the
reference's ST_* surface (presto-geospatial/.../GeoFunctions.java,
BingTileFunctions.java, aggregation/{ConvexHullAggregation,
GeometryUnionAgg}.java), expressed as JVM-side Spark SQL expressions
(plus one Python UDF for convex hull — see below).

Geometry representation::

    STRUCT<gtype: STRING,
           pts:   ARRAY<STRUCT<x DOUBLE, y DOUBLE>>,
           rings: ARRAY<STRUCT<pid INT, hole BOOLEAN,
                               pts ARRAY<STRUCT<x DOUBLE, y DOUBLE>>>>>

``rings`` is the full structure: one entry per ring/chain, ``pid``
grouping rings into polygons (MULTIPOLYGON), ``hole`` marking interior
rings. ``pts`` is a denormalized convenience chain — the exterior ring
for POLYGON, the flattened point set for everything else — kept so that
bbox/point accessors stay single-array expressions. EMPTY geometries
have zero rings. GEOMETRYCOLLECTION is not modeled.

WKT parse/serialize covers POINT, LINESTRING, POLYGON (with holes),
MULTIPOINT, MULTILINESTRING, MULTIPOLYGON, and the EMPTY forms of each.

Implementation note: Spark SQL temp functions cannot be CALLED from
inside higher-order-function lambdas (the analyzer loses the lambda
variable when inlining), so the segment/orientation primitives below are
Python-side *expression templates* inlined into each lambda body at
registration time; lambda variable names are suffixed (``gi_``/``rr_``…)
so nested inlining never shadows an outer binding.

Semantics notes (documented deviations from the Esri-backed reference):
- ST_Contains/ST_Within are boundary-INCLUSIVE (ST_Covers-style); a
  point on any ring boundary is contained. Point-in-polygon uses even-odd
  parity over ALL rings, which handles holes and valid (disjoint-part)
  multipolygons uniformly.
- Polygon containment of extended shapes checks vertex containment only
  (no edge-crossing subtraction); exact for convex outers.
- ST_Distance is exact for non-intersecting supported shapes (min over
  per-ring vertex-to-segment distances); a point inside a polygon hole
  measures to the nearest ring, not just the exterior.
- ST_IsSimple / ST_IsValid are structural checks (ring closure, arity,
  duplicate vertices), not full OGC validation; geometry_invalid_reason
  mirrors them.
- ST_Union dissolves convex polygon pairs (contained operand collapses;
  overlapping pairs partition as a + (b \\ a) pieces, area-exact);
  other inputs and geometry_union(_agg) remain COLLECTION merges
  (pid-remapped ring concatenation): correct cardinality/containment
  for disjoint inputs, no boolean clipping of overlaps.
- ST_Difference / ST_SymDifference / ST_Intersection compute the
  clipping-free cases exactly (point-set operands, disjoint, equal,
  containment with hole punch, axis-rect intersection) AND the general
  convex overlay: ST_Intersection clips any simple single-ring polygon
  by a CONVEX polygon (Sutherland-Hodgman, geo_clip_convex Python UDF);
  ST_Difference / ST_SymDifference decompose convex-convex pairs into
  disjoint pieces by incremental half-plane clipping (geo_diff_convex,
  MULTIPOLYGON result). Non-convex x non-convex overlay returns NULL
  (the reference delegates that to Esri's clipping engine); both UDFs
  follow the convex-hull off-hot-path policy.
- ST_AsBinary is pure-SQL little-endian ISO WKB (doubles via reflect
  doubleToLongBits); ST_GeomFromBinary decodes through a WKT-emitting
  Python UDF + the JVM parse; malformed WKB returns NULL (Presto
  raises). simplify_geometry is Douglas–Peucker via a ring-array Python
  UDF; line_locate_point is an exact segment-projection fold.
- ST_Buffer supports points (32-gon) only; other shapes return NULL.
- ST_Crosses/ST_Overlaps/ST_Touches are predicate approximations built
  from intersects/contains/boundary tests (documented per function).
- ST_Relate evaluates the canonical DE-9IM masks (equals/disjoint/
  within/contains/touches/crosses/overlaps/intersects) through the
  predicate set; other patterns return NULL. GEOMETRYCOLLECTION is
  not implemented.
- ST_AsText prints Spark double repr ('1.0', not ESRI's '1').
- Spark limitation worth knowing: a PYTHON-UDF-backed function
  (st_convex_hull, simplify_geometry, st_geom_from_binary) whose
  argument expression contains a nested lambda that CAPTURES an outer
  lambda's variable cannot be extracted by Spark's planner ("Cannot
  evaluate expression"); all SQL bodies here are kept capture-free so
  the surfaces compose.

The predicate set powers the reference's spatial join
(SpatialJoinOperator, ExtractSpatialJoins.java:101-109): a broadcast
spatial join is ``small.join(big, st_contains(...))``, and the bing-tile
functions provide the tile-bucketed equi-join path for fact-fact spatial
joins at scale (geometry_to_bing_tiles → explode → equi-join on tile).

Convex hull (ST_ConvexHull and the convex_hull_agg expansion) runs a
Monotone-chain scan in a Python UDF: hull construction needs a
stack-pop loop no SQL fold can express; it is a per-group rollup
operation, never a per-row hot path, matching the repo's Python-UDF
policy (functions/__init__._register_python_udfs).
"""

_PT = "STRUCT<x: DOUBLE, y: DOUBLE>"
_PTS = "ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>"
_RINGS = (
    "ARRAY<STRUCT<pid: INT, hole: BOOLEAN,"
    " pts: ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>>>"
)
_G = (
    "STRUCT<gtype: STRING, pts: ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>,"
    " rings: ARRAY<STRUCT<pid: INT, hole: BOOLEAN,"
    " pts: ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>>>>"
)

_EMPTY_PTS = f"CAST(array() AS {_PTS})"
_EMPTY_RINGS = f"CAST(array() AS {_RINGS})"


def _mk_ring(pid, hole, pts) -> str:
    return f"named_struct('pid', {pid}, 'hole', {hole}, 'pts', {pts})"


def _mk_geo(gtype, pts, rings) -> str:
    return f"named_struct('gtype', {gtype}, 'pts', {pts}, 'rings', {rings})"


def _single_ring(pts) -> str:
    return f"array({_mk_ring('0', 'false', pts)})"


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


def _on_any_edge(pts, px, py, iv="ge_") -> str:
    """p lies on some segment of the (closed or open) chain ``pts``."""
    xi, yi = f"element_at({pts}, {iv}).x", f"element_at({pts}, {iv}).y"
    xj, yj = f"element_at({pts}, {iv} + 1).x", f"element_at({pts}, {iv} + 1).y"
    return (
        f"(exists(sequence(1, size({pts}) - 1), {iv} ->"
        f" {_on_seg(xi, yi, xj, yj, px, py)}))"
    )


def _crossings(pts, px, py, iv="gc_", acc="ca_") -> str:
    """Ray-crossing count (rightward ray from p) over one ring chain."""
    xi, yi = f"element_at({pts}, {iv}).x", f"element_at({pts}, {iv}).y"
    xj, yj = f"element_at({pts}, {iv} + 1).x", f"element_at({pts}, {iv} + 1).y"
    return (
        f"(aggregate(sequence(1, size({pts}) - 1), 0, ({acc}, {iv}) ->"
        f" {acc} + CASE WHEN (({yi} <= {py} AND {yj} > {py})"
        f" OR ({yj} <= {py} AND {yi} > {py}))"
        f" AND {px} < {xi} + ({py} - {yi}) * ({xj} - {xi}) / ({yj} - {yi})"
        f" THEN 1 ELSE 0 END))"
    )


def _rings_contain(rings, px, py) -> str:
    """Boundary-inclusive point-in-polygonal-geometry: on any ring edge,
    OR odd total crossing parity over all rings (even-odd rule — handles
    holes and disjoint multipolygon parts uniformly)."""
    return (
        f"(exists({rings}, re_ -> {_on_any_edge('re_.pts', px, py)})"
        f" OR aggregate({rings}, 0, (rca_, rr_) ->"
        f" rca_ + {_crossings('rr_.pts', px, py)}) % 2 = 1)"
    )


def _pt_chain_dist(px, py, pts, iv="pc_", acc="pa_") -> str:
    """Min distance from p to a point chain (vertices + segments)."""
    xi, yi = f"element_at({pts}, {iv}).x", f"element_at({pts}, {iv}).y"
    xj, yj = f"element_at({pts}, {iv} + 1).x", f"element_at({pts}, {iv} + 1).y"
    return (
        f"(CASE WHEN size({pts}) = 1"
        f" THEN sqrt(power({px} - element_at({pts}, 1).x, 2)"
        f"         + power({py} - element_at({pts}, 1).y, 2))"
        f" ELSE aggregate(sequence(1, size({pts}) - 1),"
        f" CAST('Infinity' AS DOUBLE), ({acc}, {iv}) ->"
        f" least({acc}, {_pt_seg_dist(px, py, xi, yi, xj, yj)})) END)"
    )


def _pt_rings_dist(px, py, rings) -> str:
    """Min distance from p to every ring chain of a geometry (no phantom
    segments across ring boundaries)."""
    return (
        f"(aggregate({rings}, CAST('Infinity' AS DOUBLE), (pra_, prr_) ->"
        f" least(pra_, {_pt_chain_dist(px, py, 'prr_.pts')})))"
    )


def _chains_intersect(a, b, iv="ci_", jv="cj_") -> str:
    """Any segment of chain a intersects any segment of chain b."""
    ax, ay = f"element_at({a}, {iv}).x", f"element_at({a}, {iv}).y"
    bx = f"element_at({a}, least({iv} + 1, size({a}))).x"
    by = f"element_at({a}, least({iv} + 1, size({a}))).y"
    cx, cy = f"element_at({b}, {jv}).x", f"element_at({b}, {jv}).y"
    dx = f"element_at({b}, least({jv} + 1, size({b}))).x"
    dy = f"element_at({b}, least({jv} + 1, size({b}))).y"
    return (
        f"(exists(sequence(1, greatest(size({a}) - 1, 1)), {iv} ->"
        f" exists(sequence(1, greatest(size({b}) - 1, 1)), {jv} ->"
        f" {_seg_intersects(ax, ay, bx, by, cx, cy, dx, dy)})))"
    )


def _rings_chains_intersect(ra, rb) -> str:
    return (
        f"(exists({ra}, xa_ -> exists({rb}, xb_ ->"
        f" {_chains_intersect('xa_.pts', 'xb_.pts')})))"
    )


def _shoelace(pts, iv="sl_", acc="sa_") -> str:
    """Signed double area of one closed ring."""
    return (
        f"(aggregate(sequence(1, size({pts}) - 1), CAST(0.0 AS DOUBLE),"
        f" ({acc}, {iv}) -> {acc}"
        f" + element_at({pts}, {iv}).x * element_at({pts}, {iv} + 1).y"
        f" - element_at({pts}, {iv} + 1).x * element_at({pts}, {iv}).y))"
    )


def _chain_len(pts, iv="cl_", acc="la_") -> str:
    return (
        f"(aggregate(sequence(1, size({pts}) - 1), CAST(0.0 AS DOUBLE),"
        f" ({acc}, {iv}) -> {acc}"
        f" + sqrt(power(element_at({pts}, {iv} + 1).x - element_at({pts}, {iv}).x, 2)"
        f"      + power(element_at({pts}, {iv} + 1).y - element_at({pts}, {iv}).y, 2))))"
    )


def _parse_chain(s) -> str:
    """'x y, x y, …' (any residual parens stripped) → pts array."""
    clean = f"regexp_replace({s}, '[()]', '')"
    return (
        f"transform(split({clean}, ','), tk_ -> named_struct("
        f"'x', CAST(split(trim(tk_), '\\\\s+')[0] AS DOUBLE),"
        f"'y', CAST(split(trim(tk_), '\\\\s+')[1] AS DOUBLE)))"
    )


# ring-text separators: ') , (' at ring depth, ')) , ((' at polygon depth
_RSEP = r"'\\)\\s*,\\s*\\('"
_PSEP = r"'\\)\\s*\\)\\s*,\\s*\\(\\s*\\('"
# full WKT body: first '(' to last ')' (greedy)
_WKT_BODY = "regexp_extract(wkt, " + r"'\\((.*)\\)'" + ", 1)"

_PTS_JOIN = (
    "array_join(transform({pts}, pj_ ->"
    " concat(CAST(pj_.x AS STRING), ' ', CAST(pj_.y AS STRING))), ', ')"
)


def _pts_join(pts) -> str:
    return _PTS_JOIN.format(pts=pts)


def _numg(g) -> str:
    """Template: number of component geometries (ST_NumGeometries)."""
    return (
        f"(CASE WHEN size({g}.rings) = 0 THEN 0"
        f" WHEN {g}.gtype = 'MULTIPOINT' THEN size({g}.pts)"
        f" WHEN {g}.gtype = 'MULTILINESTRING' THEN size({g}.rings)"
        f" WHEN {g}.gtype = 'MULTIPOLYGON'"
        f" THEN size(array_distinct(transform({g}.rings, np_ -> np_.pid)))"
        f" ELSE 1 END)"
    )


def _geon(g, n) -> str:
    """Template: n-th component geometry (ST_GeometryN); inlined into
    st_geometries' lambda (a SQL-UDF call there would not resolve)."""
    nth_pid = (
        f"element_at(array_distinct(transform({g}.rings, gp_ -> gp_.pid)), {n})"
    )
    return (
        f"(CASE WHEN {n} < 1 OR {n} > {_numg(g)} THEN NULL"
        f" WHEN {g}.gtype = 'MULTIPOINT' THEN "
        + _mk_geo(
            "'POINT'",
            f"array(element_at({g}.pts, {n}))",
            _single_ring(f"array(element_at({g}.pts, {n}))"),
        )
        + f" WHEN {g}.gtype = 'MULTILINESTRING' THEN "
        + _mk_geo(
            "'LINESTRING'",
            f"element_at({g}.rings, {n}).pts",
            _single_ring(f"element_at({g}.rings, {n}).pts"),
        )
        + f" WHEN {g}.gtype = 'MULTIPOLYGON' THEN "
        + _mk_geo(
            "'POLYGON'",
            f"element_at(filter({g}.rings, gr_ -> gr_.pid = {nth_pid}"
            " AND NOT gr_.hole), 1).pts",
            f"transform(filter({g}.rings, gr_ -> gr_.pid = {nth_pid}),"
            " (gr2_, gx_) -> " + _mk_ring("0", "gx_ > 0", "gr2_.pts") + ")",
        )
        + f" ELSE {g} END)"
    )


GEOSPATIAL_SQL_FUNCTIONS: list[str] = [
    # --- helper functions (top-level-callable; bodies are inlined
    #     templates so their own lambdas never call a SQL UDF) ------------
    f"""CREATE OR REPLACE TEMPORARY FUNCTION geo_ring_contains(
         pts {_PTS}, px DOUBLE, py DOUBLE)
       RETURNS BOOLEAN RETURN
         {_on_any_edge("pts", "px", "py")}
         OR {_crossings("pts", "px", "py")} % 2 = 1""",
    f"""CREATE OR REPLACE TEMPORARY FUNCTION geo_rings_contain(
         rings {_RINGS}, px DOUBLE, py DOUBLE)
       RETURNS BOOLEAN RETURN {_rings_contain("rings", "px", "py")}""",
    f"""CREATE OR REPLACE TEMPORARY FUNCTION geo_pt_chain_dist(
         px DOUBLE, py DOUBLE, pts {_PTS})
       RETURNS DOUBLE RETURN {_pt_chain_dist("px", "py", "pts")}""",
    f"""CREATE OR REPLACE TEMPORARY FUNCTION geo_pt_rings_dist(
         px DOUBLE, py DOUBLE, rings {_RINGS})
       RETURNS DOUBLE RETURN {_pt_rings_dist("px", "py", "rings")}""",
    f"""CREATE OR REPLACE TEMPORARY FUNCTION geo_chains_intersect(
         a {_PTS}, b {_PTS})
       RETURNS BOOLEAN RETURN {_chains_intersect("a", "b")}""",
    f"""CREATE OR REPLACE TEMPORARY FUNCTION geo_rings_intersect(
         a {_RINGS}, b {_RINGS})
       RETURNS BOOLEAN RETURN {_rings_chains_intersect("a", "b")}""",
    # --- WKT parse --------------------------------------------------------
    #     geo_parse_rings builds the ring structure; st_geometry_from_text
    #     assembles the geometry (calls are top-level — allowed).
    f"""CREATE OR REPLACE TEMPORARY FUNCTION geo_wkt_type(wkt STRING)
       RETURNS STRING RETURN upper(regexp_extract(trim(wkt), '^([A-Za-z]+)', 1))""",
    "CREATE OR REPLACE TEMPORARY FUNCTION geo_parse_rings(wkt STRING)"
    f" RETURNS {_RINGS} RETURN CASE"
    " WHEN upper(wkt) RLIKE " + r"'EMPTY\\s*$'" + f" THEN {_EMPTY_RINGS}"
    " WHEN geo_wkt_type(wkt) IN ('POINT', 'LINESTRING', 'MULTIPOINT') THEN"
    f" array({_mk_ring('0', 'false', _parse_chain(_WKT_BODY))})"
    " WHEN geo_wkt_type(wkt) = 'POLYGON' THEN"
    f" transform(split({_WKT_BODY}, {_RSEP}),"
    f" (rt_, rix_) -> {_mk_ring('0', 'rix_ > 0', _parse_chain('rt_'))})"
    " WHEN geo_wkt_type(wkt) = 'MULTILINESTRING' THEN"
    f" transform(split({_WKT_BODY}, {_RSEP}),"
    f" (rt_, rix_) -> {_mk_ring('rix_', 'false', _parse_chain('rt_'))})"
    " WHEN geo_wkt_type(wkt) = 'MULTIPOLYGON' THEN"
    f" flatten(transform(split({_WKT_BODY}, {_PSEP}),"
    " (pt_, pix_) -> transform(split(pt_, " + _RSEP + "),"
    f" (rt_, rix_) -> {_mk_ring('pix_', 'rix_ > 0', _parse_chain('rt_'))})))"
    " ELSE NULL END",
    f"""CREATE OR REPLACE TEMPORARY FUNCTION geo_pts_of(rings {_RINGS}, gt STRING)
       RETURNS {_PTS} RETURN CASE
         WHEN rings IS NULL OR size(rings) = 0 THEN {_EMPTY_PTS}
         WHEN gt = 'POLYGON' THEN element_at(rings, 1).pts
         ELSE flatten(transform(rings, fr_ -> fr_.pts)) END""",
    f"""CREATE OR REPLACE TEMPORARY FUNCTION st_geometry_from_text(wkt STRING)
       RETURNS {_G} RETURN {_mk_geo(
           "geo_wkt_type(wkt)",
           "geo_pts_of(geo_parse_rings(wkt), geo_wkt_type(wkt))",
           "geo_parse_rings(wkt)")}""",
    # ST_Polygon / ST_LineFromText: type-checked parse (GeoFunctions
    # stPolygon/stLineFromText reject other geometry types).
    f"""CREATE OR REPLACE TEMPORARY FUNCTION st_polygon(wkt STRING)
       RETURNS {_G} RETURN CASE WHEN geo_wkt_type(wkt) = 'POLYGON'
         THEN st_geometry_from_text(wkt) ELSE NULL END""",
    f"""CREATE OR REPLACE TEMPORARY FUNCTION st_line_from_text(wkt STRING)
       RETURNS {_G} RETURN CASE WHEN geo_wkt_type(wkt) = 'LINESTRING'
         THEN st_geometry_from_text(wkt) ELSE NULL END""",
    # --- constructors -----------------------------------------------------
    f"""CREATE OR REPLACE TEMPORARY FUNCTION st_point(x DOUBLE, y DOUBLE)
       RETURNS {_G} RETURN {_mk_geo(
           "'POINT'",
           "array(named_struct('x', x, 'y', y))",
           _single_ring("array(named_struct('x', x, 'y', y))"))}""",
    f"""CREATE OR REPLACE TEMPORARY FUNCTION st_linestring(points ARRAY<{_G}>)
       RETURNS {_G} RETURN {_mk_geo(
           "'LINESTRING'",
           "transform(points, lp_ -> element_at(lp_.pts, 1))",
           _single_ring("transform(points, lp_ -> element_at(lp_.pts, 1))"))}""",
    f"""CREATE OR REPLACE TEMPORARY FUNCTION st_multipoint(points ARRAY<{_G}>)
       RETURNS {_G} RETURN {_mk_geo(
           "'MULTIPOINT'",
           "transform(points, lp_ -> element_at(lp_.pts, 1))",
           _single_ring("transform(points, lp_ -> element_at(lp_.pts, 1))"))}""",
    f"""CREATE OR REPLACE TEMPORARY FUNCTION st_make_envelope(
         xmin DOUBLE, ymin DOUBLE, xmax DOUBLE, ymax DOUBLE)
       RETURNS {_G} RETURN {_mk_geo(
           "'POLYGON'",
           "array(named_struct('x', xmin, 'y', ymin),"
           " named_struct('x', xmax, 'y', ymin),"
           " named_struct('x', xmax, 'y', ymax),"
           " named_struct('x', xmin, 'y', ymax),"
           " named_struct('x', xmin, 'y', ymin))",
           _single_ring(
               "array(named_struct('x', xmin, 'y', ymin),"
               " named_struct('x', xmax, 'y', ymin),"
               " named_struct('x', xmax, 'y', ymax),"
               " named_struct('x', xmin, 'y', ymax),"
               " named_struct('x', xmin, 'y', ymin))"))}""",
    # --- serialization ----------------------------------------------------
    f"""CREATE OR REPLACE TEMPORARY FUNCTION st_astext(g {_G})
       RETURNS STRING RETURN CASE
         WHEN g IS NULL THEN NULL
         WHEN size(g.rings) = 0 THEN concat(g.gtype, ' EMPTY')
         WHEN g.gtype = 'POINT' THEN concat('POINT (', {_pts_join("g.pts")}, ')')
         WHEN g.gtype = 'LINESTRING' THEN
           concat('LINESTRING (', {_pts_join("g.pts")}, ')')
         WHEN g.gtype = 'MULTIPOINT' THEN
           concat('MULTIPOINT (', {_pts_join("g.pts")}, ')')
         WHEN g.gtype IN ('POLYGON', 'MULTILINESTRING') THEN
           concat(g.gtype, ' (', array_join(transform(g.rings, sr_ ->
             concat('(', {_pts_join("sr_.pts")}, ')')), ', '), ')')
         WHEN g.gtype = 'MULTIPOLYGON' THEN
           concat('MULTIPOLYGON (', array_join(
             transform(array_distinct(transform(g.rings, dp_ -> dp_.pid)),
               mp_ -> concat('(', array_join(
                 transform(filter(g.rings, fr2_ -> fr2_.pid = mp_),
                   sr2_ -> concat('(', {_pts_join("sr2_.pts")}, ')')), ', '),
                 ')')), ', '), ')')
       END""",
    # --- accessors --------------------------------------------------------
    f"""CREATE OR REPLACE TEMPORARY FUNCTION st_geometry_type(g {_G})
       RETURNS STRING RETURN CASE g.gtype
         WHEN 'MULTIPOINT' THEN 'ST_MultiPoint'
         WHEN 'MULTILINESTRING' THEN 'ST_MultiLineString'
         WHEN 'MULTIPOLYGON' THEN 'ST_MultiPolygon'
         WHEN 'LINESTRING' THEN 'ST_LineString'
         ELSE concat('ST_', initcap(lower(g.gtype))) END""",
    # try_element_at: POINT EMPTY has no vertex — Presto returns NULL
    # (GeoFunctions.java:843 stX / :857 stY isEmpty guard).
    f"""CREATE OR REPLACE TEMPORARY FUNCTION st_x(g {_G})
       RETURNS DOUBLE RETURN try_element_at(g.pts, 1).x""",
    f"""CREATE OR REPLACE TEMPORARY FUNCTION st_y(g {_G})
       RETURNS DOUBLE RETURN try_element_at(g.pts, 1).y""",
    f"""CREATE OR REPLACE TEMPORARY FUNCTION st_xmin(g {_G})
       RETURNS DOUBLE RETURN array_min(transform(g.pts, p -> p.x))""",
    f"""CREATE OR REPLACE TEMPORARY FUNCTION st_xmax(g {_G})
       RETURNS DOUBLE RETURN array_max(transform(g.pts, p -> p.x))""",
    f"""CREATE OR REPLACE TEMPORARY FUNCTION st_ymin(g {_G})
       RETURNS DOUBLE RETURN array_min(transform(g.pts, p -> p.y))""",
    f"""CREATE OR REPLACE TEMPORARY FUNCTION st_ymax(g {_G})
       RETURNS DOUBLE RETURN array_max(transform(g.pts, p -> p.y))""",
    # ST_NumPoints: vertex count; polygonal rings exclude the repeated
    # closing point (GeoFunctions stNumPoints).
    f"""CREATE OR REPLACE TEMPORARY FUNCTION st_num_points(g {_G})
       RETURNS INT RETURN aggregate(g.rings, 0, (na_, nr_) ->
         na_ + size(nr_.pts)
             - CASE WHEN g.gtype IN ('POLYGON', 'MULTIPOLYGON') THEN 1 ELSE 0 END)""",
    f"""CREATE OR REPLACE TEMPORARY FUNCTION st_point_n(g {_G}, i INT)
       RETURNS {_G} RETURN CASE WHEN g.gtype = 'LINESTRING'
         AND i >= 1 AND i <= size(g.pts) THEN {_mk_geo(
           "'POINT'",
           "array(element_at(g.pts, i))",
           _single_ring("array(element_at(g.pts, i))"))}
         ELSE NULL END""",
    f"""CREATE OR REPLACE TEMPORARY FUNCTION st_start_point(g {_G})
       RETURNS {_G} RETURN st_point_n(g, 1)""",
    f"""CREATE OR REPLACE TEMPORARY FUNCTION st_end_point(g {_G})
       RETURNS {_G} RETURN st_point_n(g, CAST(size(g.pts) AS INT))""",
    f"""CREATE OR REPLACE TEMPORARY FUNCTION st_is_closed(g {_G})
       RETURNS BOOLEAN RETURN size(g.rings) > 0 AND forall(g.rings, cr_ ->
         size(cr_.pts) > 1
         AND element_at(cr_.pts, 1) = element_at(cr_.pts, size(cr_.pts)))""",
    f"""CREATE OR REPLACE TEMPORARY FUNCTION st_is_empty(g {_G})
       RETURNS BOOLEAN RETURN size(g.rings) = 0 OR size(g.pts) = 0""",
    # ST_IsSimple: structural approximation — no repeated vertices other
    # than ring closure (full OGC simplicity would need self-intersection
    # tests; documented deviation).
    f"""CREATE OR REPLACE TEMPORARY FUNCTION st_is_simple(g {_G})
       RETURNS BOOLEAN RETURN forall(g.rings, qr_ ->
         size(array_distinct(qr_.pts)) >= size(qr_.pts)
           - CASE WHEN size(qr_.pts) > 1
                  AND element_at(qr_.pts, 1) = element_at(qr_.pts, size(qr_.pts))
             THEN 1 ELSE 0 END)""",
    f"""CREATE OR REPLACE TEMPORARY FUNCTION st_is_ring(g {_G})
       RETURNS BOOLEAN RETURN g.gtype = 'LINESTRING'
         AND st_is_closed(g) AND st_is_simple(g)""",
    # ST_IsValid: structural checks only (closure + minimum arity);
    # geometry_invalid_reason mirrors the same checks.
    f"""CREATE OR REPLACE TEMPORARY FUNCTION st_is_valid(g {_G})
       RETURNS BOOLEAN RETURN CASE
         WHEN g IS NULL THEN NULL
         WHEN size(g.rings) = 0 THEN true
         WHEN g.gtype IN ('POLYGON', 'MULTIPOLYGON') THEN forall(g.rings, vr_ ->
           size(vr_.pts) >= 4
           AND element_at(vr_.pts, 1) = element_at(vr_.pts, size(vr_.pts)))
         WHEN g.gtype IN ('LINESTRING', 'MULTILINESTRING') THEN
           forall(g.rings, vr_ -> size(vr_.pts) >= 2)
         ELSE size(g.pts) >= 1 END""",
    f"""CREATE OR REPLACE TEMPORARY FUNCTION geometry_invalid_reason(g {_G})
       RETURNS STRING RETURN CASE
         WHEN g IS NULL THEN NULL
         WHEN st_is_valid(g) THEN NULL
         WHEN g.gtype IN ('POLYGON', 'MULTIPOLYGON') THEN
           'polygon ring is not closed or has fewer than 4 points'
         ELSE 'linestring has fewer than 2 points' END""",
    f"""CREATE OR REPLACE TEMPORARY FUNCTION st_dimension(g {_G})
       RETURNS TINYINT RETURN CASE
         WHEN g.gtype IN ('POINT', 'MULTIPOINT') THEN CAST(0 AS TINYINT)
         WHEN g.gtype IN ('LINESTRING', 'MULTILINESTRING') THEN CAST(1 AS TINYINT)
         ELSE CAST(2 AS TINYINT) END""",
    f"""CREATE OR REPLACE TEMPORARY FUNCTION st_coord_dim(g {_G})
       RETURNS TINYINT RETURN CAST(2 AS TINYINT)""",
    # --- ring accessors ---------------------------------------------------
    # size guard: POLYGON EMPTY → NULL (GeoFunctions.java:937 isEmpty).
    f"""CREATE OR REPLACE TEMPORARY FUNCTION st_exterior_ring(g {_G})
       RETURNS {_G} RETURN CASE
         WHEN g.gtype = 'POLYGON' AND size(g.rings) >= 1 THEN {_mk_geo(
           "'LINESTRING'",
           "element_at(g.rings, 1).pts",
           _single_ring("element_at(g.rings, 1).pts"))}
         ELSE NULL END""",
    f"""CREATE OR REPLACE TEMPORARY FUNCTION st_num_interior_ring(g {_G})
       RETURNS INT RETURN CASE WHEN g.gtype = 'POLYGON'
         THEN size(filter(g.rings, hr_ -> hr_.hole)) ELSE NULL END""",
    f"""CREATE OR REPLACE TEMPORARY FUNCTION st_interior_rings(g {_G})
       RETURNS ARRAY<{_G}> RETURN CASE WHEN g.gtype = 'POLYGON' THEN
         transform(filter(g.rings, hr_ -> hr_.hole), ir_ -> {_mk_geo(
             "'LINESTRING'", "ir_.pts",
             "array(" + _mk_ring("0", "false", "ir_.pts") + ")")})
         ELSE NULL END""",
    # try_element_at: Presto returns NULL for an out-of-range index
    # (GeoFunctions.java:753 stInteriorRingN) — ANSI element_at errors.
    f"""CREATE OR REPLACE TEMPORARY FUNCTION st_interior_ring_n(g {_G}, i INT)
       RETURNS {_G} RETURN CASE WHEN i >= 1
         THEN try_element_at(st_interior_rings(g), i) END""",
    # ST_Boundary: polygon (with holes) → MULTILINESTRING of its rings.
    f"""CREATE OR REPLACE TEMPORARY FUNCTION st_boundary(g {_G})
       RETURNS {_G} RETURN CASE
         WHEN g.gtype IN ('POLYGON', 'MULTIPOLYGON') AND size(g.rings) > 1
           THEN {_mk_geo(
               "'MULTILINESTRING'",
               "flatten(transform(g.rings, br_ -> br_.pts))",
               "transform(g.rings, (br_, bi_) ->"
               + _mk_ring("bi_", "false", "br_.pts") + ")")}
         ELSE {_mk_geo("'LINESTRING'", "g.pts", _single_ring("g.pts"))} END""",
    # --- multi-geometry accessors ----------------------------------------
    f"""CREATE OR REPLACE TEMPORARY FUNCTION st_num_geometries(g {_G})
       RETURNS INT RETURN {_numg("g")}""",
    f"""CREATE OR REPLACE TEMPORARY FUNCTION st_geometry_n(g {_G}, n INT)
       RETURNS {_G} RETURN {_geon("g", "n")}""",
    f"""CREATE OR REPLACE TEMPORARY FUNCTION st_geometries(g {_G})
       RETURNS ARRAY<{_G}> RETURN CASE WHEN size(g.rings) = 0 THEN NULL
         ELSE transform(sequence(1, {_numg("g")}),
                        sn_ -> {_geon("g", "sn_")}) END""",
    # --- envelope ---------------------------------------------------------
    f"""CREATE OR REPLACE TEMPORARY FUNCTION st_envelope(g {_G})
       RETURNS {_G} RETURN st_make_envelope(st_xmin(g), st_ymin(g),
                                            st_xmax(g), st_ymax(g))""",
    f"""CREATE OR REPLACE TEMPORARY FUNCTION st_envelope_as_pts(g {_G})
       RETURNS ARRAY<{_PT}> RETURN array(
         named_struct('x', st_xmin(g), 'y', st_ymin(g)),
         named_struct('x', st_xmax(g), 'y', st_ymax(g)))""",
    # --- measures ---------------------------------------------------------
    # ST_Area: shoelace per ring, holes negative (valid input assumed:
    # holes lie inside their exterior).
    f"""CREATE OR REPLACE TEMPORARY FUNCTION st_area(g {_G})
       RETURNS DOUBLE RETURN CASE WHEN g.gtype IN ('POLYGON', 'MULTIPOLYGON')
         THEN aggregate(g.rings, CAST(0.0 AS DOUBLE), (aa_, ar_) ->
           aa_ + (CASE WHEN ar_.hole THEN -1.0 ELSE 1.0 END)
               * abs({_shoelace("ar_.pts")}) / 2.0)
         ELSE 0.0 END""",
    f"""CREATE OR REPLACE TEMPORARY FUNCTION st_length(g {_G})
       RETURNS DOUBLE RETURN CASE
         WHEN g.gtype IN ('LINESTRING', 'MULTILINESTRING', 'POLYGON', 'MULTIPOLYGON')
         THEN aggregate(g.rings, CAST(0.0 AS DOUBLE), (ll_, lr_) ->
           ll_ + {_chain_len("lr_.pts")})
         ELSE NULL END""",
    # Empty-input arms mirror GeoFunctions.java:319 stCentroid: POINT
    # passes through unchanged (even empty); any other empty multi-vertex
    # geometry yields POINT EMPTY (:329-331).
    f"""CREATE OR REPLACE TEMPORARY FUNCTION st_centroid(g {_G})
       RETURNS {_G} RETURN CASE g.gtype
         WHEN 'POINT' THEN g
         WHEN CASE WHEN size(g.pts) = 0 THEN g.gtype END THEN {_mk_geo(
             "'POINT'", _EMPTY_PTS, _EMPTY_RINGS)}
         WHEN 'MULTIPOINT' THEN {_mk_geo(
             "'POINT'",
             "array(named_struct("
             "'x', aggregate(g.pts, CAST(0.0 AS DOUBLE), (ma_, mp_) -> ma_ + mp_.x) / size(g.pts),"
             "'y', aggregate(g.pts, CAST(0.0 AS DOUBLE), (ma_, mp_) -> ma_ + mp_.y) / size(g.pts)))",
             _single_ring(
                 "array(named_struct("
                 "'x', aggregate(g.pts, CAST(0.0 AS DOUBLE), (ma_, mp_) -> ma_ + mp_.x) / size(g.pts),"
                 "'y', aggregate(g.pts, CAST(0.0 AS DOUBLE), (ma_, mp_) -> ma_ + mp_.y) / size(g.pts)))"))}
         WHEN 'LINESTRING' THEN {_mk_geo(
             "'POINT'",
             "array(named_struct("
             "'x', aggregate(g.pts, CAST(0.0 AS DOUBLE), (ca_, cp_) -> ca_ + cp_.x) / size(g.pts),"
             "'y', aggregate(g.pts, CAST(0.0 AS DOUBLE), (ca_, cp_) -> ca_ + cp_.y) / size(g.pts)))",
             _single_ring(
                 "array(named_struct("
                 "'x', aggregate(g.pts, CAST(0.0 AS DOUBLE), (ca_, cp_) -> ca_ + cp_.x) / size(g.pts),"
                 "'y', aggregate(g.pts, CAST(0.0 AS DOUBLE), (ca_, cp_) -> ca_ + cp_.y) / size(g.pts)))"))}
         WHEN 'POLYGON' THEN {_mk_geo(
             "'POINT'",
             "array(named_struct("
             "'x', aggregate(sequence(1, size(g.pts) - 1), CAST(0.0 AS DOUBLE), (xa_, xi_) ->"
             " xa_ + (element_at(g.pts, xi_).x + element_at(g.pts, xi_ + 1).x)"
             " * (element_at(g.pts, xi_).x * element_at(g.pts, xi_ + 1).y"
             "    - element_at(g.pts, xi_ + 1).x * element_at(g.pts, xi_).y))"
             " / (3.0 * " + _shoelace("g.pts") + "),"
             "'y', aggregate(sequence(1, size(g.pts) - 1), CAST(0.0 AS DOUBLE), (ya_, yi_) ->"
             " ya_ + (element_at(g.pts, yi_).y + element_at(g.pts, yi_ + 1).y)"
             " * (element_at(g.pts, yi_).x * element_at(g.pts, yi_ + 1).y"
             "    - element_at(g.pts, yi_ + 1).x * element_at(g.pts, yi_).y))"
             " / (3.0 * " + _shoelace("g.pts") + ")))",
             _single_ring(
                 "array(named_struct("
                 "'x', aggregate(sequence(1, size(g.pts) - 1), CAST(0.0 AS DOUBLE), (xa_, xi_) ->"
                 " xa_ + (element_at(g.pts, xi_).x + element_at(g.pts, xi_ + 1).x)"
                 " * (element_at(g.pts, xi_).x * element_at(g.pts, xi_ + 1).y"
                 "    - element_at(g.pts, xi_ + 1).x * element_at(g.pts, xi_).y))"
                 " / (3.0 * " + _shoelace("g.pts") + "),"
                 "'y', aggregate(sequence(1, size(g.pts) - 1), CAST(0.0 AS DOUBLE), (ya_, yi_) ->"
                 " ya_ + (element_at(g.pts, yi_).y + element_at(g.pts, yi_ + 1).y)"
                 " * (element_at(g.pts, yi_).x * element_at(g.pts, yi_ + 1).y"
                 "    - element_at(g.pts, yi_ + 1).x * element_at(g.pts, yi_).y))"
                 " / (3.0 * " + _shoelace("g.pts") + ")))"))}
       END""",
    # --- predicates -------------------------------------------------------
    f"""CREATE OR REPLACE TEMPORARY FUNCTION st_contains(outer_g {_G}, inner_g {_G})
       RETURNS BOOLEAN RETURN CASE
         WHEN outer_g.gtype IN ('POLYGON', 'MULTIPOLYGON')
              AND inner_g.gtype = 'POINT' THEN
           geo_rings_contain(outer_g.rings,
             element_at(inner_g.pts, 1).x, element_at(inner_g.pts, 1).y)
         WHEN outer_g.gtype IN ('POLYGON', 'MULTIPOLYGON') THEN
           forall(inner_g.pts, wp_ ->
             {_rings_contain("outer_g.rings", "wp_.x", "wp_.y")})
         WHEN outer_g.gtype = 'POINT' THEN
           inner_g.gtype = 'POINT'
           AND element_at(outer_g.pts, 1) = element_at(inner_g.pts, 1)
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
                WHEN a.gtype = 'POINT' AND b.gtype IN ('POLYGON', 'MULTIPOLYGON')
                  THEN geo_rings_contain(b.rings,
                         element_at(a.pts, 1).x, element_at(a.pts, 1).y)
                WHEN b.gtype = 'POINT' AND a.gtype IN ('POLYGON', 'MULTIPOLYGON')
                  THEN geo_rings_contain(a.rings,
                         element_at(b.pts, 1).x, element_at(b.pts, 1).y)
                WHEN a.gtype = 'POINT'
                  THEN geo_pt_rings_dist(element_at(a.pts, 1).x,
                         element_at(a.pts, 1).y, b.rings) = 0.0
                WHEN b.gtype = 'POINT'
                  THEN geo_pt_rings_dist(element_at(b.pts, 1).x,
                         element_at(b.pts, 1).y, a.rings) = 0.0
                ELSE geo_rings_intersect(a.rings, b.rings)
                  OR (a.gtype IN ('POLYGON', 'MULTIPOLYGON')
                      AND geo_rings_contain(a.rings,
                            element_at(b.pts, 1).x, element_at(b.pts, 1).y))
                  OR (b.gtype IN ('POLYGON', 'MULTIPOLYGON')
                      AND geo_rings_contain(b.rings,
                            element_at(a.pts, 1).x, element_at(a.pts, 1).y))
           END)""",
    f"""CREATE OR REPLACE TEMPORARY FUNCTION st_disjoint(a {_G}, b {_G})
       RETURNS BOOLEAN RETURN NOT st_intersects(a, b)""",
    f"""CREATE OR REPLACE TEMPORARY FUNCTION st_equals(a {_G}, b {_G})
       RETURNS BOOLEAN RETURN a.gtype = b.gtype AND a.rings = b.rings""",
    # ST_Crosses/ST_Overlaps: intersect-but-neither-contains approximations
    # (exact DE-9IM interior/boundary split not modeled; documented).
    f"""CREATE OR REPLACE TEMPORARY FUNCTION st_crosses(a {_G}, b {_G})
       RETURNS BOOLEAN RETURN st_dimension(a) <> st_dimension(b)
         AND st_intersects(a, b)
         AND NOT st_contains(a, b) AND NOT st_contains(b, a)""",
    f"""CREATE OR REPLACE TEMPORARY FUNCTION st_overlaps(a {_G}, b {_G})
       RETURNS BOOLEAN RETURN st_dimension(a) = st_dimension(b)
         AND st_intersects(a, b)
         AND NOT st_contains(a, b) AND NOT st_contains(b, a)""",
    # ST_Touches: boundary contact without interior overlap — approximated
    # as edge/vertex contact where no vertex of either lies strictly
    # inside the other (exact for polygon/point and polygon edge-contact).
    f"""CREATE OR REPLACE TEMPORARY FUNCTION st_touches(a {_G}, b {_G})
       RETURNS BOOLEAN RETURN st_intersects(a, b)
         AND NOT (a.gtype IN ('POLYGON', 'MULTIPOLYGON') AND exists(b.pts, tp_ ->
           {_rings_contain("a.rings", "tp_.x", "tp_.y")}
           AND NOT exists(a.rings, te_ -> {_on_any_edge("te_.pts", "tp_.x", "tp_.y")})))
         AND NOT (b.gtype IN ('POLYGON', 'MULTIPOLYGON') AND exists(a.pts, tq_ ->
           {_rings_contain("b.rings", "tq_.x", "tq_.y")}
           AND NOT exists(b.rings, tf_ -> {_on_any_edge("tf_.pts", "tq_.x", "tq_.y")})))
         AND NOT (a.gtype = 'POINT' AND b.gtype = 'POINT')""",
    f"""CREATE OR REPLACE TEMPORARY FUNCTION st_distance(a {_G}, b {_G})
       RETURNS DOUBLE RETURN CASE
         WHEN st_intersects(a, b) THEN 0.0
         WHEN a.gtype = 'POINT'
           THEN geo_pt_rings_dist(element_at(a.pts, 1).x,
                  element_at(a.pts, 1).y, b.rings)
         WHEN b.gtype = 'POINT'
           THEN geo_pt_rings_dist(element_at(b.pts, 1).x,
                  element_at(b.pts, 1).y, a.rings)
         ELSE least(
           array_min(transform(a.pts, dp_ -> {_pt_rings_dist("dp_.x", "dp_.y", "b.rings")})),
           array_min(transform(b.pts, dq_ -> {_pt_rings_dist("dq_.x", "dq_.y", "a.rings")})))
         END""",
    # legacy alias kept from round 1 (envelope-overlap test on two geoms)
    f"""CREATE OR REPLACE TEMPORARY FUNCTION st_intersects_env(a {_G}, b {_G})
       RETURNS BOOLEAN RETURN
         st_xmin(a) <= st_xmax(b) AND st_xmin(b) <= st_xmax(a)
         AND st_ymin(a) <= st_ymax(b) AND st_ymin(b) <= st_ymax(a)""",
    # --- union (collection merge — see module docstring) ------------------
    f"""CREATE OR REPLACE TEMPORARY FUNCTION st_union(a {_G}, b {_G})
       RETURNS {_G} RETURN CASE
         WHEN a IS NULL THEN b WHEN b IS NULL THEN a
         WHEN st_dimension(a) <> st_dimension(b) THEN NULL
         WHEN st_dimension(a) = 0 THEN {_mk_geo(
             "'MULTIPOINT'",
             "array_distinct(concat(a.pts, b.pts))",
             _single_ring("array_distinct(concat(a.pts, b.pts))"))}
         WHEN a.gtype = 'POLYGON' AND b.gtype = 'POLYGON'
              AND st_contains(a, b) THEN a
         WHEN a.gtype = 'POLYGON' AND b.gtype = 'POLYGON'
              AND st_contains(b, a) THEN b
         WHEN a.gtype = 'POLYGON' AND b.gtype = 'POLYGON'
              AND st_intersects(a, b)
              AND geo_diff_convex(b.rings, a.rings) IS NOT NULL THEN
           {_mk_geo(
               "'MULTIPOLYGON'",
               "concat(a.pts, flatten(transform("
               "geo_diff_convex(b.rings, a.rings), upr_ -> upr_.pts)))",
               "concat(a.rings, transform(geo_diff_convex(b.rings, a.rings),"
               " upr_ -> named_struct('pid', upr_.pid + 4096,"
               " 'hole', false, 'pts', upr_.pts)))")}
         ELSE {_mk_geo(
             "CASE WHEN st_dimension(a) = 2 THEN 'MULTIPOLYGON'"
             " ELSE 'MULTILINESTRING' END",
             "concat(geo_pts_of(a.rings, a.gtype), geo_pts_of(b.rings, b.gtype))",
             "concat(a.rings, transform(b.rings, ur_ -> named_struct("
             "'pid', ur_.pid + 4096, 'hole', ur_.hole, 'pts', ur_.pts)))")}
         END""",
    f"""CREATE OR REPLACE TEMPORARY FUNCTION geometry_union(geoms ARRAY<{_G}>)
       RETURNS {_G} RETURN CASE
         WHEN geoms IS NULL OR size(geoms) = 0 THEN NULL
         WHEN forall(geoms, ug_ -> ug_.gtype IN ('POINT', 'MULTIPOINT')) THEN
           {_mk_geo(
               "'MULTIPOINT'",
               "array_distinct(flatten(transform(geoms, uf_ -> uf_.pts)))",
               _single_ring(
                   "array_distinct(flatten(transform(geoms, uf_ -> uf_.pts)))"))}
         ELSE {_mk_geo(
             "CASE WHEN exists(geoms, ud_ ->"
             " ud_.gtype IN ('POLYGON', 'MULTIPOLYGON'))"
             " THEN 'MULTIPOLYGON' ELSE 'MULTILINESTRING' END",
             "flatten(transform(geoms, uf2_ -> uf2_.pts))",
             "flatten(transform(geoms, (ug2_, ui_) -> transform(ug2_.rings,"
             " ur2_ -> named_struct('pid', ur2_.pid + ui_ * 4096,"
             " 'hole', ur2_.hole, 'pts', ur2_.pts))))")}
         END""",
    # ST_Buffer: point → 32-gon disc; other shapes unsupported (NULL).
    f"""CREATE OR REPLACE TEMPORARY FUNCTION st_buffer(g {_G}, d DOUBLE)
       RETURNS {_G} RETURN CASE WHEN g.gtype = 'POINT' AND d > 0 THEN
         {_mk_geo(
             "'POLYGON'",
             "transform(sequence(0, 32), bi_ -> named_struct("
             "'x', element_at(g.pts, 1).x + d * cos(2.0 * pi() * bi_ / 32.0),"
             "'y', element_at(g.pts, 1).y + d * sin(2.0 * pi() * bi_ / 32.0)))",
             _single_ring(
                 "transform(sequence(0, 32), bi_ -> named_struct("
                 "'x', element_at(g.pts, 1).x + d * cos(2.0 * pi() * bi_ / 32.0),"
                 "'y', element_at(g.pts, 1).y + d * sin(2.0 * pi() * bi_ / 32.0)))"))}
         ELSE NULL END""",
    # great_circle_distance(lat1, lon1, lat2, lon2) → km (haversine,
    # GeoFunctions stSphericalDistance family / docs great_circle_distance).
    """CREATE OR REPLACE TEMPORARY FUNCTION great_circle_distance(
         lat1 DOUBLE, lon1 DOUBLE, lat2 DOUBLE, lon2 DOUBLE)
       RETURNS DOUBLE RETURN 2.0 * 6371.01 * asin(sqrt(
         power(sin(radians(lat2 - lat1) / 2.0), 2)
         + cos(radians(lat1)) * cos(radians(lat2))
           * power(sin(radians(lon2 - lon1) / 2.0), 2)))""",
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
    # bing_tile(x, y, zoom) → tile struct; the quadkey arity is dispatched
    # by the rewrite layer to bing_tile_from_quadkey (SQL functions don't
    # overload).
    """CREATE OR REPLACE TEMPORARY FUNCTION bing_tile(tx INT, ty INT, zoom INT)
       RETURNS STRUCT<x: INT, y: INT, zoom: INT>
       RETURN named_struct('x', tx, 'y', ty, 'zoom', zoom)""",
    """CREATE OR REPLACE TEMPORARY FUNCTION bing_tile_from_quadkey(qk STRING)
       RETURNS STRUCT<x: INT, y: INT, zoom: INT> RETURN named_struct(
         'x', aggregate(sequence(1, length(qk)), 0, (qa_, qi_) ->
           qa_ * 2 + CAST(substring(qk, qi_, 1) AS INT) % 2),
         'y', aggregate(sequence(1, length(qk)), 0, (qb_, qj_) ->
           qb_ * 2 + CAST(CAST(substring(qk, qj_, 1) AS INT) >= 2 AS INT)),
         'zoom', CAST(length(qk) AS INT))""",
    """CREATE OR REPLACE TEMPORARY FUNCTION bing_tile_at(
         lat DOUBLE, lon DOUBLE, zoom INT)
       RETURNS STRUCT<x: INT, y: INT, zoom: INT>
       RETURN named_struct('x', bing_tile_x(lon, zoom),
                           'y', bing_tile_y(lat, zoom), 'zoom', zoom)""",
    """CREATE OR REPLACE TEMPORARY FUNCTION bing_tile_coordinates(
         t STRUCT<x: INT, y: INT, zoom: INT>)
       RETURNS STRUCT<x: INT, y: INT> RETURN named_struct('x', t.x, 'y', t.y)""",
    """CREATE OR REPLACE TEMPORARY FUNCTION bing_tile_zoom_level(
         t STRUCT<x: INT, y: INT, zoom: INT>)
       RETURNS TINYINT RETURN CAST(t.zoom AS TINYINT)""",
    # quadkey: base-4 string of interleaved x/y bits, length = zoom.
    """CREATE OR REPLACE TEMPORARY FUNCTION bing_tile_quadkey(
         t STRUCT<x: INT, y: INT, zoom: INT>)
       RETURNS STRING RETURN
         array_join(transform(sequence(t.zoom, 1, -1),
           i -> CAST((CASE WHEN (t.x & shiftleft(1, i - 1)) > 0 THEN 1 ELSE 0 END)
                   + (CASE WHEN (t.y & shiftleft(1, i - 1)) > 0 THEN 2 ELSE 0 END) AS STRING)), '')""",
    # tile → lat/lon envelope (inverse Web-Mercator; a tile IS a lat/lon
    # rect, so the envelope is exact).
    f"""CREATE OR REPLACE TEMPORARY FUNCTION bing_tile_polygon(
         t STRUCT<x: INT, y: INT, zoom: INT>)
       RETURNS {_G} RETURN st_make_envelope(
         CAST(t.x AS DOUBLE) / shiftleft(1, t.zoom) * 360.0 - 180.0,
         degrees(atan(sinh(pi() * (1.0 - 2.0 * CAST(t.y + 1 AS DOUBLE) / shiftleft(1, t.zoom))))),
         CAST(t.x + 1 AS DOUBLE) / shiftleft(1, t.zoom) * 360.0 - 180.0,
         degrees(atan(sinh(pi() * (1.0 - 2.0 * CAST(t.y AS DOUBLE) / shiftleft(1, t.zoom))))))""",
    """CREATE OR REPLACE TEMPORARY FUNCTION bing_tiles_around(
         lat DOUBLE, lon DOUBLE, zoom INT)
       RETURNS ARRAY<STRUCT<x: INT, y: INT, zoom: INT>> RETURN
         filter(flatten(transform(sequence(-1, 1), dx_ ->
           transform(sequence(-1, 1), dy_ -> named_struct(
             'x', bing_tile_x(lon, zoom) + dx_,
             'y', bing_tile_y(lat, zoom) + dy_, 'zoom', zoom)))),
           bt_ -> bt_.x >= 0 AND bt_.y >= 0
             AND bt_.x < shiftleft(1, zoom) AND bt_.y < shiftleft(1, zoom))""",
    # (bing_tile_x/y are scalar helpers — calling them inside these lambdas
    # works because their arguments are the OUTER function's parameters,
    # not lambda variables; covered by tests.)
    # geometry envelope → covering tile set at a zoom (the scale-out
    # spatial-join key generator: explode and equi-join on the tile).
    """CREATE OR REPLACE TEMPORARY FUNCTION geometry_to_bing_tiles(
         g STRUCT<gtype: STRING, pts: ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>,
                  rings: ARRAY<STRUCT<pid: INT, hole: BOOLEAN,
                  pts: ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>>>>, zoom INT)
       RETURNS ARRAY<STRUCT<x: INT, y: INT, zoom: INT>> RETURN
         flatten(transform(
           sequence(bing_tile_x(st_xmin(g), zoom), bing_tile_x(st_xmax(g), zoom)),
           gx_ -> transform(
             sequence(bing_tile_y(st_ymax(g), zoom), bing_tile_y(st_ymin(g), zoom)),
             gy_ -> named_struct('x', gx_, 'y', gy_, 'zoom', zoom))))""",
]


# --- convex hull (Python UDF — see module docstring) ----------------------

GEOSPATIAL_SQL_FUNCTIONS.append(
    f"""CREATE OR REPLACE TEMPORARY FUNCTION st_convex_hull(g {_G})
       RETURNS {_G} RETURN CASE
         WHEN g IS NULL OR size(g.pts) = 0 THEN g
         WHEN size(array_distinct(g.pts)) <= 2 THEN g
         WHEN size(geo_convex_hull(g.pts)) >= 4 THEN {_mk_geo(
             "'POLYGON'", "geo_convex_hull(g.pts)",
             _single_ring("geo_convex_hull(g.pts)"))}
         ELSE {_mk_geo(
             "'LINESTRING'", "geo_convex_hull(g.pts)",
             _single_ring("geo_convex_hull(g.pts)"))}
       END"""
)


def register_geospatial_python(spark) -> None:
    """Register geo_convex_hull (Andrew's monotone chain over the point
    set; closed CCW ring, or a 2-point chain for collinear input).
    Registered BEFORE the SQL functions so st_convex_hull's body
    resolves."""

    def _hull(pts):
        if pts is None:
            return None
        ps = sorted({(float(p[0]), float(p[1])) for p in pts})
        if len(ps) <= 2:
            return [{"x": x, "y": y} for x, y in ps]

        def cross(o, a, b):
            return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

        lower: list = []
        for p in ps:
            while len(lower) >= 2 and cross(lower[-2], lower[-1], p) <= 0:
                lower.pop()
            lower.append(p)
        upper: list = []
        for p in reversed(ps):
            while len(upper) >= 2 and cross(upper[-2], upper[-1], p) <= 0:
                upper.pop()
            upper.append(p)
        hull = lower[:-1] + upper[:-1]
        if len(hull) < 3:  # collinear
            return [{"x": ps[0][0], "y": ps[0][1]}, {"x": ps[-1][0], "y": ps[-1][1]}]
        hull.append(hull[0])  # close the ring
        return [{"x": x, "y": y} for x, y in hull]

    spark.udf.register("geo_convex_hull", _hull, _PTS)

    # Sutherland–Hodgman polygon clipping: exact ST_Intersection for a
    # CONVEX clip polygon against any simple single-ring subject — the
    # per-edge clip loop mutates a variable-length vertex list, which no
    # SQL fold can express (same policy note as the convex hull above:
    # per-pair overlay, never a hot path). Returns the closed clipped
    # ring, [] for an empty intersection, or NULL when the shape is out
    # of scope (holes, multi-ring, non-convex clip) so the SQL CASE can
    # fall through to the documented NULL.
    def _clip_convex(a_rings, b_rings):
        if not a_rings or not b_rings:
            return None
        if len(a_rings) != 1 or len(b_rings) != 1:
            return None
        if a_rings[0]["hole"] or b_rings[0]["hole"]:
            return None
        subj = [(float(p["x"]), float(p["y"])) for p in a_rings[0]["pts"]]
        clip = [(float(p["x"]), float(p["y"])) for p in b_rings[0]["pts"]]
        if len(subj) > 1 and subj[0] == subj[-1]:
            subj = subj[:-1]
        if len(clip) > 1 and clip[0] == clip[-1]:
            clip = clip[:-1]
        if len(subj) < 3 or len(clip) < 3:
            return None

        def cross(o, a, b):
            return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

        n = len(clip)
        signs = set()
        for i in range(n):
            c = cross(clip[i], clip[(i + 1) % n], clip[(i + 2) % n])
            if c:
                signs.add(c > 0)
        if len(signs) != 1:
            return None  # non-convex (or degenerate) clip polygon
        if not signs.pop():
            clip.reverse()  # normalize to CCW so "inside" is left-of-edge

        def inter(s, e, a, b):
            dcx, dcy = a[0] - b[0], a[1] - b[1]
            dpx, dpy = s[0] - e[0], s[1] - e[1]
            n1 = a[0] * b[1] - a[1] * b[0]
            n2 = s[0] * e[1] - s[1] * e[0]
            d = dcx * dpy - dcy * dpx
            return ((n1 * dpx - n2 * dcx) / d, (n1 * dpy - n2 * dcy) / d)

        out = subj
        for i in range(n):
            cp1, cp2 = clip[i], clip[(i + 1) % n]
            if not out:
                break
            inp, out = out, []
            s = inp[-1]
            for e in inp:
                e_in = cross(cp1, cp2, e) >= 0
                s_in = cross(cp1, cp2, s) >= 0
                if e_in:
                    if not s_in:
                        out.append(inter(s, e, cp1, cp2))
                    out.append(e)
                elif s_in:
                    out.append(inter(s, e, cp1, cp2))
                s = e
        dedup = [p for i, p in enumerate(out) if p != out[i - 1] or not i]
        if len(dedup) > 1 and dedup[0] == dedup[-1]:
            dedup.pop()
        if len(dedup) < 3:
            return []
        dedup.append(dedup[0])  # close the ring
        return [{"x": x, "y": y} for x, y in dedup]

    spark.udf.register("geo_clip_convex", _clip_convex, _PTS)

    # Convex difference A \ B by incremental half-plane decomposition:
    # walk B's edges (CCW); at edge i the piece is
    # region ∩ outside(e_i), then region narrows to region ∩ inside(e_i).
    # Pieces are disjoint and union to A \ B. Requires BOTH operands
    # convex (a concave subject clipped by a half-plane can split into
    # parts S-H would bridge); returns a pid-numbered ring array
    # (MULTIPOLYGON parts), [] when A ⊆ B, NULL when out of scope.
    def _diff_convex(a_rings, b_rings):
        def ring_pts(rings):
            if not rings or len(rings) != 1 or rings[0]["hole"]:
                return None
            pts = [(float(p["x"]), float(p["y"])) for p in rings[0]["pts"]]
            if len(pts) > 1 and pts[0] == pts[-1]:
                pts = pts[:-1]
            return pts if len(pts) >= 3 else None

        def cross(o, a, b):
            return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

        def convex_ccw(pts):
            n = len(pts)
            signs = set()
            for i in range(n):
                c = cross(pts[i], pts[(i + 1) % n], pts[(i + 2) % n])
                if c:
                    signs.add(c > 0)
            if len(signs) != 1:
                return None
            return pts if signs.pop() else list(reversed(pts))

        def inter(s, e, a, b):
            dcx, dcy = a[0] - b[0], a[1] - b[1]
            dpx, dpy = s[0] - e[0], s[1] - e[1]
            n1 = a[0] * b[1] - a[1] * b[0]
            n2 = s[0] * e[1] - s[1] * e[0]
            d = dcx * dpy - dcy * dpx
            return ((n1 * dpx - n2 * dcx) / d, (n1 * dpy - n2 * dcy) / d)

        def halfclip(poly, c1, c2):
            """poly ∩ {left of c1→c2} (S-H single-edge clip)."""
            out = []
            if not poly:
                return out
            s = poly[-1]
            for e in poly:
                e_in = cross(c1, c2, e) >= 0
                s_in = cross(c1, c2, s) >= 0
                if e_in:
                    if not s_in:
                        out.append(inter(s, e, c1, c2))
                    out.append(e)
                elif s_in:
                    out.append(inter(s, e, c1, c2))
                s = e
            dedup = [p for i, p in enumerate(out) if p != out[i - 1] or not i]
            if len(dedup) > 1 and dedup[0] == dedup[-1]:
                dedup.pop()
            return dedup

        def area2(poly):
            n = len(poly)
            return abs(
                sum(
                    poly[i][0] * poly[(i + 1) % n][1]
                    - poly[(i + 1) % n][0] * poly[i][1]
                    for i in range(n)
                )
            )

        a_pts, b_pts = ring_pts(a_rings), ring_pts(b_rings)
        if a_pts is None or b_pts is None:
            return None
        a_pts, b_pts = convex_ccw(a_pts), convex_ccw(b_pts)
        if a_pts is None or b_pts is None:
            return None
        pieces, region = [], a_pts
        n = len(b_pts)
        for i in range(n):
            c1, c2 = b_pts[i], b_pts[(i + 1) % n]
            outside = halfclip(region, c2, c1)  # reversed edge = outside
            if len(outside) >= 3 and area2(outside) > 1e-12:
                pieces.append(outside)
            region = halfclip(region, c1, c2)
            if len(region) < 3:
                break
        return [
            {
                "pid": pid,
                "hole": False,
                "pts": [{"x": x, "y": y} for x, y in piece + [piece[0]]],
            }
            for pid, piece in enumerate(pieces)
        ]

    spark.udf.register("geo_diff_convex", _diff_convex, _RINGS)

    # --- Douglas–Peucker ring simplification (simplify_geometry) ----------

    def _dp(chain, tol):
        if len(chain) <= 2:
            return chain
        ax, ay = chain[0]
        bx, by = chain[-1]
        seg2 = (bx - ax) ** 2 + (by - ay) ** 2
        best_d, best_i = -1.0, 0
        for i in range(1, len(chain) - 1):
            px, py = chain[i]
            if seg2 == 0.0:
                d = ((px - ax) ** 2 + (py - ay) ** 2) ** 0.5
            else:
                t = max(0.0, min(1.0, ((px - ax) * (bx - ax)
                                       + (py - ay) * (by - ay)) / seg2))
                d = ((px - (ax + t * (bx - ax))) ** 2
                     + (py - (ay + t * (by - ay))) ** 2) ** 0.5
            if d > best_d:
                best_d, best_i = d, i
        if best_d <= tol:
            return [chain[0], chain[-1]]
        return _dp(chain[: best_i + 1], tol)[:-1] + _dp(chain[best_i:], tol)

    def _simplify_rings(rings, tol):
        if rings is None:
            return None
        out = []
        for r in rings:
            pts = [(float(p[0]), float(p[1])) for p in (r[2] or [])]
            closed = len(pts) >= 4 and pts[0] == pts[-1]
            simp = _dp(pts, float(tol))
            if closed and len(simp) < 4:  # a ring can't drop below a triangle
                simp = pts
            out.append({
                "pid": r[0], "hole": r[1],
                "pts": [{"x": x, "y": y} for x, y in simp],
            })
        return out

    spark.udf.register("geo_simplify_rings", _simplify_rings, _RINGS)

    # --- WKB deserialization (ST_GeomFromBinary) --------------------------
    #     GeoFunctions.java stGeomFromBinary; the decode emits WKT text and
    #     st_geometry_from_text parses it JVM-side. The UDF's argument is a
    #     plain binary value: a Python UDF whose argument expression
    #     contains a nested lambda CAPTURING an outer lambda's variable
    #     cannot be extracted by Spark ("Cannot evaluate expression"), so
    #     the ENCODE direction (st_as_binary) is pure SQL — see the
    #     GEOSPATIAL_SQL_FUNCTIONS entry below.

    import struct as _st

    _WKB_NAME = {1: "POINT", 2: "LINESTRING", 3: "POLYGON",
                 4: "MULTIPOINT", 5: "MULTILINESTRING", 6: "MULTIPOLYGON"}

    def _fmt(v):
        return repr(float(v))

    def _wkb_to_wkt(buf):
        if buf is None:
            return None
        try:
            wkt, _ = _wkb_geom_txt(bytes(buf), 0)
            return wkt
        except Exception:  # malformed WKB → NULL (Presto raises; shimmed)
            return None

    def _wkb_geom_txt(buf, pos):
        e = "<" if buf[pos] == 1 else ">"
        pos += 1
        (code,) = _st.unpack_from(e + "I", buf, pos)
        pos += 4
        gt = _WKB_NAME[code]

        def chain(p):
            (n,) = _st.unpack_from(e + "I", buf, p)
            p += 4
            toks = []
            for _ in range(n):
                x, y = _st.unpack_from(e + "dd", buf, p)
                p += 16
                toks.append(f"{_fmt(x)} {_fmt(y)}")
            return ", ".join(toks), p

        if gt == "POINT":
            x, y = _st.unpack_from(e + "dd", buf, pos)
            pos += 16
            if x != x:
                return "POINT EMPTY", pos
            return f"POINT ({_fmt(x)} {_fmt(y)})", pos
        if gt == "LINESTRING":
            body, pos = chain(pos)
            return (f"LINESTRING ({body})" if body
                    else "LINESTRING EMPTY"), pos
        if gt == "POLYGON":
            (nr,) = _st.unpack_from(e + "I", buf, pos)
            pos += 4
            rings = []
            for _ in range(nr):
                body, pos = chain(pos)
                rings.append(f"({body})")
            return (f"POLYGON ({', '.join(rings)})" if rings
                    else "POLYGON EMPTY"), pos
        # MULTI*: n child geometries with headers
        (n,) = _st.unpack_from(e + "I", buf, pos)
        pos += 4
        parts = []
        for _ in range(n):
            child, pos = _wkb_geom_txt(buf, pos)
            parts.append(child.split(" ", 1)[1])  # strip child type tag
        if not parts:
            return f"{gt} EMPTY", pos
        return f"{gt} ({', '.join(parts)})", pos

    spark.udf.register("geo_wkb_to_wkt", _wkb_to_wkt, "STRING")


# --- boolean overlay (partial), line referencing, simplification ----------
#
# ST_Difference / ST_SymDifference / ST_Intersection
# (GeoFunctions.java stDifference/stSymDifference/stIntersection): the
# reference delegates to Esri's full overlay engine. The rings model
# computes the cases that are EXACT without polygon clipping —
# point-set operands (membership filters), disjoint operands, equal
# operands, containment (including the polygon-in-polygon hole punch),
# and axis-aligned rectangle∩rectangle — and returns NULL for the
# general overlapping-area overlay (documented in SHOW FUNCTIONS and
# the module header). line_locate_point (GeoFunctions.java
# lineLocatePoint) is exact: min-distance projection over the chain's
# segments via a single fold.


def _pt_in_geom(b, px, py) -> str:
    """Boundary-inclusive point-in-geometry, dim-dispatched (the same
    containment rules st_contains uses, inlined for lambda contexts)."""
    return (
        f"(CASE WHEN st_dimension({b}) = 2"
        f" THEN {_rings_contain(b + '.rings', px, py)}"
        f" WHEN st_dimension({b}) = 1"
        f" THEN {_pt_rings_dist(px, py, b + '.rings')} = 0.0"
        f" ELSE exists({b}.pts, bq_ -> bq_.x = {px} AND bq_.y = {py}) END)"
    )


def _pts_as_geo(filtered) -> str:
    """A filtered point array → POINT / MULTIPOINT (EMPTY when none)."""
    return _mk_geo(
        f"CASE WHEN size({filtered}) = 1 THEN 'POINT' ELSE 'MULTIPOINT' END",
        filtered,
        f"CASE WHEN size({filtered}) = 0 THEN {_EMPTY_RINGS}"
        f" ELSE {_single_ring(filtered)} END",
    )


def _is_rect(g) -> str:
    """g is one closed axis-aligned rectangle ring (envelope-shaped)."""
    return (
        f"({g}.gtype = 'POLYGON' AND size({g}.rings) = 1"
        f" AND size({g}.pts) = 5 AND size(array_distinct({g}.pts)) = 4"
        f" AND forall({g}.pts, rp_ ->"
        f" (rp_.x = st_xmin({g}) OR rp_.x = st_xmax({g}))"
        f" AND (rp_.y = st_ymin({g}) OR rp_.y = st_ymax({g}))))"
    )


def _diff_pts(src, other) -> str:
    return f"filter({src}.pts, dp_ -> NOT {_pt_in_geom(other, 'dp_.x', 'dp_.y')})"


def _keep_pts(src, other) -> str:
    return f"filter({src}.pts, dp_ -> {_pt_in_geom(other, 'dp_.x', 'dp_.y')})"


_XOR_PTS = (
    "filter(array_distinct(concat(a.pts, b.pts)), sp_ ->"
    " array_contains(a.pts, sp_) <> array_contains(b.pts, sp_))"
)


def _hole_punch(outer, inner) -> str:
    """POLYGON ``inner`` strictly inside POLYGON ``outer`` (no holes of
    its own): difference = outer with inner's exterior as a hole."""
    return _mk_geo(
        "'POLYGON'",
        f"{outer}.pts",
        f"concat({outer}.rings, transform({inner}.rings, hr_ ->"
        " named_struct('pid', 0, 'hole', true, 'pts', hr_.pts)))",
    )


GEOSPATIAL_SQL_FUNCTIONS.extend([
    f"""CREATE OR REPLACE TEMPORARY FUNCTION st_difference(a {_G}, b {_G})
       RETURNS {_G} RETURN CASE
         WHEN a IS NULL OR b IS NULL THEN NULL
         WHEN size(a.rings) = 0 OR size(b.rings) = 0 THEN a
         WHEN NOT st_intersects(a, b) THEN a
         WHEN st_dimension(a) = 0 THEN {_pts_as_geo(_diff_pts("a", "b"))}
         WHEN st_contains(b, a) THEN {_mk_geo(
             "a.gtype", _EMPTY_PTS, _EMPTY_RINGS)}
         WHEN a.gtype = 'POLYGON' AND b.gtype = 'POLYGON'
              AND NOT exists(b.rings, bh_ -> bh_.hole)
              AND st_contains(a, b) THEN {_hole_punch("a", "b")}
         WHEN a.gtype = 'POLYGON' AND b.gtype = 'POLYGON'
              AND geo_diff_convex(a.rings, b.rings) IS NOT NULL THEN
           CASE WHEN size(geo_diff_convex(a.rings, b.rings)) = 0
             THEN named_struct('gtype', 'POLYGON',
                  'pts', CAST(array() AS ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>),
                  'rings', CAST(array() AS ARRAY<STRUCT<pid: INT, hole: BOOLEAN, pts: ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>>>))
             WHEN size(geo_diff_convex(a.rings, b.rings)) = 1
             THEN named_struct('gtype', 'POLYGON',
                  'pts', element_at(geo_diff_convex(a.rings, b.rings), 1).pts, 'rings', geo_diff_convex(a.rings, b.rings))
             ELSE named_struct('gtype', 'MULTIPOLYGON',
                  'pts', flatten(transform(geo_diff_convex(a.rings, b.rings), dcr_ -> dcr_.pts)),
                  'rings', geo_diff_convex(a.rings, b.rings)) END
         ELSE NULL END""",
    f"""CREATE OR REPLACE TEMPORARY FUNCTION st_sym_difference(a {_G}, b {_G})
       RETURNS {_G} RETURN CASE
         WHEN a IS NULL OR b IS NULL THEN NULL
         WHEN size(a.rings) = 0 THEN b WHEN size(b.rings) = 0 THEN a
         WHEN NOT st_intersects(a, b) THEN st_union(a, b)
         WHEN st_equals(a, b) THEN {_mk_geo(
             "a.gtype", _EMPTY_PTS, _EMPTY_RINGS)}
         WHEN st_dimension(a) = 0 AND st_dimension(b) = 0
           THEN {_pts_as_geo(_XOR_PTS)}
         WHEN a.gtype = 'POLYGON' AND b.gtype = 'POLYGON'
              AND NOT exists(b.rings, bh_ -> bh_.hole)
              AND st_contains(a, b) THEN {_hole_punch("a", "b")}
         WHEN a.gtype = 'POLYGON' AND b.gtype = 'POLYGON'
              AND NOT exists(a.rings, ah_ -> ah_.hole)
              AND st_contains(b, a) THEN {_hole_punch("b", "a")}
         WHEN a.gtype = 'POLYGON' AND b.gtype = 'POLYGON'
              AND geo_diff_convex(a.rings, b.rings) IS NOT NULL
              AND geo_diff_convex(b.rings, a.rings) IS NOT NULL THEN
           CASE WHEN size(concat(geo_diff_convex(a.rings, b.rings), transform(geo_diff_convex(b.rings, a.rings), scr_ -> named_struct('pid', scr_.pid + 1000, 'hole', false, 'pts', scr_.pts)))) = 0
             THEN named_struct('gtype', 'POLYGON',
                  'pts', CAST(array() AS ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>),
                  'rings', CAST(array() AS ARRAY<STRUCT<pid: INT, hole: BOOLEAN, pts: ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>>>))
             WHEN size(concat(geo_diff_convex(a.rings, b.rings), transform(geo_diff_convex(b.rings, a.rings), scr_ -> named_struct('pid', scr_.pid + 1000, 'hole', false, 'pts', scr_.pts)))) = 1
             THEN named_struct('gtype', 'POLYGON',
                  'pts', element_at(concat(geo_diff_convex(a.rings, b.rings), transform(geo_diff_convex(b.rings, a.rings), scr_ -> named_struct('pid', scr_.pid + 1000, 'hole', false, 'pts', scr_.pts))), 1).pts, 'rings', concat(geo_diff_convex(a.rings, b.rings), transform(geo_diff_convex(b.rings, a.rings), scr_ -> named_struct('pid', scr_.pid + 1000, 'hole', false, 'pts', scr_.pts))))
             ELSE named_struct('gtype', 'MULTIPOLYGON',
                  'pts', flatten(transform(concat(geo_diff_convex(a.rings, b.rings), transform(geo_diff_convex(b.rings, a.rings), scr_ -> named_struct('pid', scr_.pid + 1000, 'hole', false, 'pts', scr_.pts))), dcr_ -> dcr_.pts)),
                  'rings', concat(geo_diff_convex(a.rings, b.rings), transform(geo_diff_convex(b.rings, a.rings), scr_ -> named_struct('pid', scr_.pid + 1000, 'hole', false, 'pts', scr_.pts)))) END
         ELSE NULL END""",
    f"""CREATE OR REPLACE TEMPORARY FUNCTION st_intersection(a {_G}, b {_G})
       RETURNS {_G} RETURN CASE
         WHEN a IS NULL OR b IS NULL THEN NULL
         WHEN size(a.rings) = 0 THEN a WHEN size(b.rings) = 0 THEN b
         WHEN NOT st_intersects(a, b) THEN {_mk_geo(
             "a.gtype", _EMPTY_PTS, _EMPTY_RINGS)}
         WHEN st_dimension(a) = 0 THEN {_pts_as_geo(_keep_pts("a", "b"))}
         WHEN st_dimension(b) = 0 THEN {_pts_as_geo(_keep_pts("b", "a"))}
         WHEN st_contains(b, a) THEN a
         WHEN st_contains(a, b) THEN b
         WHEN {_is_rect("a")} AND {_is_rect("b")}
              AND greatest(st_xmin(a), st_xmin(b)) < least(st_xmax(a), st_xmax(b))
              AND greatest(st_ymin(a), st_ymin(b)) < least(st_ymax(a), st_ymax(b))
           THEN st_make_envelope(
             greatest(st_xmin(a), st_xmin(b)), greatest(st_ymin(a), st_ymin(b)),
             least(st_xmax(a), st_xmax(b)), least(st_ymax(a), st_ymax(b)))
         WHEN a.gtype = 'POLYGON' AND b.gtype = 'POLYGON'
              AND geo_clip_convex(a.rings, b.rings) IS NOT NULL THEN
           CASE WHEN size(geo_clip_convex(a.rings, b.rings)) = 0
             THEN {_mk_geo("'POLYGON'", _EMPTY_PTS, _EMPTY_RINGS)}
             ELSE {_mk_geo(
                 "'POLYGON'",
                 "geo_clip_convex(a.rings, b.rings)",
                 _single_ring("geo_clip_convex(a.rings, b.rings)"))} END
         ELSE NULL END""",
])


def _llp_seg(line, p, i) -> str:
    ax, ay = f"element_at({line}.pts, {i}).x", f"element_at({line}.pts, {i}).y"
    bx = f"element_at({line}.pts, {i} + 1).x"
    by = f"element_at({line}.pts, {i} + 1).y"
    px, py = f"element_at({p}.pts, 1).x", f"element_at({p}.pts, 1).y"
    seg2 = f"(power({bx} - {ax}, 2) + power({by} - {ay}, 2))"
    t = (
        f"(CASE WHEN {seg2} = 0.0 THEN 0.0 ELSE greatest(0.0, least(1.0,"
        f" (({px} - {ax}) * ({bx} - {ax}) + ({py} - {ay}) * ({by} - {ay}))"
        f" / {seg2})) END)"
    )
    d = _pt_seg_dist(px, py, ax, ay, bx, by)
    return seg2, t, d


# Segment templates over a ring struct (``llr_.pts``): the fold runs
# per ring so MULTILINESTRING parts accumulate length WITHOUT phantom
# connecting segments between parts — matching JTS LengthIndexedLine
# over a MultiLineString (GeoFunctions.java:494-513 lineLocatePoint
# accepts LINE_STRING and MULTI_LINE_STRING).
_LLP_SEG2, _LLP_T, _LLP_D = _llp_seg("llr_", "p", "lz_")

GEOSPATIAL_SQL_FUNCTIONS.append(
    f"""CREATE OR REPLACE TEMPORARY FUNCTION line_locate_point(
         line {_G}, p {_G})
       RETURNS DOUBLE RETURN CASE
         WHEN line IS NULL OR p IS NULL THEN NULL
         WHEN line.gtype NOT IN ('LINESTRING', 'MULTILINESTRING')
              OR p.gtype <> 'POINT'
              OR size(line.pts) < 2 THEN NULL
         ELSE aggregate(line.rings,
           named_struct('cum', CAST(0.0 AS DOUBLE),
                        'bestd', CAST('Infinity' AS DOUBLE),
                        'bestpos', CAST(0.0 AS DOUBLE)),
           (lacc_, llr_) -> CASE WHEN size(llr_.pts) < 2 THEN lacc_
             ELSE aggregate(sequence(1, size(llr_.pts) - 1), lacc_,
               (lac_, lz_) -> CASE WHEN {_LLP_D} < lac_.bestd
                 THEN named_struct(
                   'cum', lac_.cum + sqrt({_LLP_SEG2}),
                   'bestd', CAST({_LLP_D} AS DOUBLE),
                   'bestpos', lac_.cum + {_LLP_T} * sqrt({_LLP_SEG2}))
                 ELSE named_struct(
                   'cum', lac_.cum + sqrt({_LLP_SEG2}),
                   'bestd', lac_.bestd, 'bestpos', lac_.bestpos) END)
             END,
           lacc_ -> CASE WHEN lacc_.cum = 0.0 THEN 0.0
                         ELSE lacc_.bestpos / lacc_.cum END)
         END"""
)


# simplify_geometry / WKB round-trip wrappers over the Python UDFs
# registered in register_geospatial_python (Douglas–Peucker needs a
# recursive stack; WKB needs byte packing — neither is a hot path,
# matching the convex-hull precedent).
GEOSPATIAL_SQL_FUNCTIONS.append(
    f"""CREATE OR REPLACE TEMPORARY FUNCTION simplify_geometry(
         g {_G}, tol DOUBLE)
       RETURNS {_G} RETURN CASE
         WHEN g IS NULL OR tol IS NULL OR tol <= 0 OR isnan(tol) THEN g
         WHEN g.gtype IN ('POINT', 'MULTIPOINT') THEN g
         ELSE {_mk_geo(
             "g.gtype",
             "geo_pts_of(geo_simplify_rings(g.rings, tol), g.gtype)",
             "geo_simplify_rings(g.rings, tol)")}
         END"""
)


# --- ST_AsBinary: pure-SQL little-endian ISO WKB ---------------------------
#
# GeoFunctions.java stAsBinary. Doubles get their raw bits via reflect()
# (Double.doubleToLongBits — a JVM-side catalyst expression, same trick as
# to_ieee754_64), byte-swapped to little-endian through hex text. Every
# lambda below is capture-free (no inner lambda references an outer
# lambda's variable), so the whole expression stays composable — including
# as the argument of the Python-UDF-backed st_geom_from_binary.


def _wkb_le4(n) -> str:
    """int32 → 4 bytes little-endian."""
    h = f"lpad(hex({n}), 8, '0')"
    return (
        f"unhex(concat(substr({h}, 7, 2), substr({h}, 5, 2),"
        f" substr({h}, 3, 2), substr({h}, 1, 2)))"
    )


def _wkb_d(x) -> str:
    """double → 8 bytes little-endian IEEE-754."""
    h = (
        "lpad(hex(CAST(reflect('java.lang.Double', 'doubleToLongBits',"
        f" CAST({x} AS DOUBLE)) AS BIGINT)), 16, '0')"
    )
    pairs = ", ".join(f"substr({h}, {i}, 2)" for i in (15, 13, 11, 9, 7, 5, 3, 1))
    return f"unhex(concat({pairs}))"


def _wkb_chain(pts, iv="kp_", acc="kb_") -> str:
    """point chain → count + coords."""
    return (
        f"concat({_wkb_le4(f'size({pts})')}, aggregate({pts}, X'',"
        f" ({acc}, {iv}) -> concat({acc},"
        f" {_wkb_d(iv + '.x')}, {_wkb_d(iv + '.y')})))"
    )


# MULTIPOLYGON: rings arrive pid-grouped (parse/union invariant). Two
# capture-free passes: ring counts per polygon from pid transitions, then
# the byte stream, emitting a child-polygon header at each transition.
_WKB_MP_COUNTS = (
    "aggregate(g.rings,"
    " named_struct('last', CAST(-1 AS INT), 'cs', CAST(array() AS ARRAY<INT>)),"
    " (mc_, mr_) -> CASE WHEN mc_.last = mr_.pid THEN named_struct("
    "   'last', mr_.pid,"
    "   'cs', concat(slice(mc_.cs, 1, size(mc_.cs) - 1),"
    "                array(element_at(mc_.cs, -1) + 1)))"
    " ELSE named_struct('last', mr_.pid, 'cs', concat(mc_.cs, array(1)))"
    " END).cs"
)
_WKB_MP_BODY = (
    "aggregate(g.rings,"
    " named_struct('i', CAST(0 AS INT), 'last', CAST(-1 AS INT), 'o', X''),"
    " (mb_, mr_) -> CASE WHEN mb_.last = mr_.pid THEN named_struct("
    "   'i', mb_.i, 'last', mb_.last,"
    f"  'o', concat(mb_.o, {_wkb_chain('mr_.pts', iv='kq_', acc='kc_')}))"
    " ELSE named_struct('i', mb_.i + 1, 'last', mr_.pid,"
    "   'o', concat(mb_.o, X'0103000000',"
    f"  {_wkb_le4(f'element_at({_WKB_MP_COUNTS}, mb_.i + 1)')},"
    f"  {_wkb_chain('mr_.pts', iv='kq_', acc='kc_')}))"
    " END).o"
)

GEOSPATIAL_SQL_FUNCTIONS.extend([
    f"""CREATE OR REPLACE TEMPORARY FUNCTION st_as_binary(g {_G})
       RETURNS BINARY RETURN CASE
         WHEN g IS NULL THEN NULL
         WHEN g.gtype = 'POINT' THEN concat(X'0101000000',
           CASE WHEN size(g.rings) = 0
                THEN X'000000000000F87F000000000000F87F'
                ELSE concat({_wkb_d("element_at(g.pts, 1).x")},
                            {_wkb_d("element_at(g.pts, 1).y")}) END)
         WHEN g.gtype = 'LINESTRING' THEN
           concat(X'0102000000', {_wkb_chain("g.pts")})
         WHEN g.gtype = 'POLYGON' THEN concat(X'0103000000',
           {_wkb_le4("size(g.rings)")},
           aggregate(g.rings, X'', (kr_, kg_) ->
             concat(kr_, {_wkb_chain("kg_.pts")})))
         WHEN g.gtype = 'MULTIPOINT' THEN concat(X'0104000000',
           {_wkb_le4("size(g.pts)")},
           aggregate(g.pts, X'', (kr_, kg_) -> concat(kr_, X'0101000000',
             {_wkb_d("kg_.x")}, {_wkb_d("kg_.y")})))
         WHEN g.gtype = 'MULTILINESTRING' THEN concat(X'0105000000',
           {_wkb_le4("size(g.rings)")},
           aggregate(g.rings, X'', (kr_, kg_) -> concat(kr_, X'0102000000',
             {_wkb_chain("kg_.pts")})))
         WHEN g.gtype = 'MULTIPOLYGON' THEN concat(X'0106000000',
           {_wkb_le4(f"size({_WKB_MP_COUNTS})")}, {_WKB_MP_BODY})
         ELSE NULL END""",
    f"""CREATE OR REPLACE TEMPORARY FUNCTION st_geom_from_binary(b BINARY)
       RETURNS {_G} RETURN CASE WHEN geo_wkb_to_wkt(b) IS NULL THEN NULL
         ELSE st_geometry_from_text(geo_wkb_to_wkt(b)) END""",
])


# --- Presto-spelled aliases (the reference's camelCase names) -------------
#
# Spark resolves function names case-insensitively but NOT
# underscore-insensitively: ``ST_Area`` finds ``st_area``, but Presto's
# multi-word spellings (``@ScalarFunction("ST_GeometryFromText")``,
# ``"ST_IsEmpty"``, ``"ST_AsBinary")`` — GeoFunctions.java) lowercase to
# ``st_geometryfromtext`` etc., which never matched the snake_case
# registrations above.  For every reference spelling whose lowercase form
# differs from the snake_case name we register a thin forwarding alias
# with the identical signature, so BOTH spellings resolve from SQL and
# from DataFrame ``expr()`` alike (no rewrite pass involved).
# tests/test_geospatial_names.py walks the full @ScalarFunction name list
# extracted from the reference and asserts live resolution per name.

import re as _re

# Every @ScalarFunction spelling in GeoFunctions.java (extracted;
# spatial_partitions
# and great_circle_distance/geometry_* / line_locate_point /
# simplify_geometry are already lowercase in the reference).
PRESTO_GEO_SPELLINGS: list[str] = [
    "ST_Area", "ST_AsBinary", "ST_AsText", "ST_Boundary", "ST_Buffer",
    "ST_Centroid", "ST_Contains", "ST_ConvexHull", "ST_CoordDim",
    "ST_Crosses", "ST_Difference", "ST_Dimension", "ST_Disjoint",
    "ST_Distance", "ST_EndPoint", "ST_Envelope", "ST_EnvelopeAsPts",
    "ST_Equals", "ST_ExteriorRing", "ST_GeomFromBinary", "ST_Geometries",
    "ST_GeometryFromText", "ST_GeometryN", "ST_GeometryType",
    "ST_InteriorRingN", "ST_InteriorRings", "ST_Intersection",
    "ST_Intersects", "ST_IsClosed", "ST_IsEmpty", "ST_IsRing",
    "ST_IsSimple", "ST_IsValid", "ST_Length", "ST_LineFromText",
    "ST_LineString", "ST_MultiPoint", "ST_NumGeometries",
    "ST_NumInteriorRing", "ST_NumPoints", "ST_Overlaps", "ST_Point",
    "ST_PointN", "ST_Polygon", "ST_Relate", "ST_StartPoint", "ST_SymDifference",
    "ST_Touches", "ST_Union", "ST_Within", "ST_X", "ST_XMax", "ST_XMin",
    "ST_Y", "ST_YMax", "ST_YMin",
]

_CREATE_HEAD_RE = _re.compile(
    r"CREATE OR REPLACE TEMPORARY FUNCTION\s+(\w+)\s*\(", _re.S
)


def _parse_sig(ddl: str):
    """(name, [param decls], return type) from one CREATE FUNCTION ddl."""
    m = _CREATE_HEAD_RE.search(ddl)
    if m is None:
        return None
    name = m.group(1)
    i = m.end()
    depth, j = 1, i
    while depth:
        c = ddl[j]
        if c in "(<":
            depth += 1
        elif c in ")>":
            depth -= 1
        j += 1
    params_txt = ddl[i : j - 1]
    m2 = _re.match(r"\s*RETURNS\s+", ddl[j:])
    k = j + m2.end()
    # the return type never contains the bare word RETURN; first match ends it
    m3 = _re.compile(r"\sRETURN[\s(]").search(ddl, k)
    rtype = " ".join(ddl[k : m3.start()].split())
    params = []
    depth, cur = 0, []
    for c in params_txt:
        if c in "<(":
            depth += 1
        elif c in ">)":
            depth -= 1
        if c == "," and depth == 0:
            params.append("".join(cur).strip())
            cur = []
        else:
            cur.append(c)
    tail = "".join(cur).strip()
    if tail:
        params.append(tail)
    return name, [" ".join(p.split()) for p in params], rtype


# Spark 4.1 ships built-in GEOMETRY-typed functions under some of these
# lowercased names; CREATE TEMPORARY FUNCTION cannot shadow a builtin with
# a SQL UDF, so those spellings are routed through the SQL rewriter
# instead (rewrite.FUNCTION_RENAMES maps ST_AsBinary → st_as_binary).
SPARK_BUILTIN_COLLISIONS = {"st_asbinary"}


def _presto_alias_ddls() -> list[str]:
    sigs = {}
    for ddl in GEOSPATIAL_SQL_FUNCTIONS:
        parsed = _parse_sig(ddl)
        if parsed:
            sigs[parsed[0]] = parsed
    by_key = {n.replace("_", ""): n for n in sigs}
    out = []
    for spelling in PRESTO_GEO_SPELLINGS:
        low = spelling.lower()
        target = by_key.get(low.replace("_", ""))
        if target is None or target == low or low in SPARK_BUILTIN_COLLISIONS:
            continue  # unimplemented, already resolvable, or builtin clash
        _, params, rtype = sigs[target]
        argnames = ", ".join(p.split(None, 1)[0] for p in params)
        out.append(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {low}({', '.join(params)})"
            f" RETURNS {rtype} RETURN {target}({argnames})"
        )
    return out


# ST_Relate — canonical DE-9IM masks mapped onto the predicate set
# (GeoFunctions.java:1080 stRelate delegates to Esri's general relate
# operator; the rings model has no full intersection-matrix engine, so
# the masks that name the standard predicates evaluate through them and
# any other pattern returns NULL — flagged in SHOW FUNCTIONS notes).
# Registered BEFORE the Presto-spelling alias pass would run, but the
# name is single-word so ST_Relate already resolves case-insensitively.
GEOSPATIAL_SQL_FUNCTIONS.append(
    f"""CREATE OR REPLACE TEMPORARY FUNCTION st_relate(
         a {_G}, b {_G}, p STRING)
       RETURNS BOOLEAN RETURN CASE upper(p)
         WHEN 'T*F**FFF*' THEN st_equals(a, b)
         WHEN 'FF*FF****' THEN NOT st_intersects(a, b)
         WHEN 'T*F**F***' THEN st_within(a, b)
         WHEN 'T*****FF*' THEN st_contains(a, b)
         WHEN 'FT*******' THEN st_touches(a, b)
         WHEN 'F**T*****' THEN st_touches(a, b)
         WHEN 'F***T****' THEN st_touches(a, b)
         WHEN 'T*T******' THEN st_crosses(a, b)
         WHEN '0********' THEN CASE
           WHEN st_dimension(a) = 1 AND st_dimension(b) = 1
             THEN st_intersects(a, b) AND NOT st_contains(a, b)
                  AND NOT st_contains(b, a)
           ELSE st_crosses(a, b) END
         WHEN 'T*T***T**' THEN st_overlaps(a, b)
         WHEN '1*T***T**' THEN st_overlaps(a, b)
         WHEN 'T********' THEN st_intersects(a, b)
         ELSE NULL END"""
)

GEOSPATIAL_SQL_FUNCTIONS.extend(_presto_alias_ddls())
