"""Unit tests for the pure-Python geometry core (no Spark needed)."""

import math

import numpy as np
import pandas as pd
import pytest

from sedona_iceberg_extension_spark.geom import Geometry, from_wkb, from_wkt, to_wkb, to_wkt
from sedona_iceberg_extension_spark.geom import algos as A
from sedona_iceberg_extension_spark.geom import vec


# -- fixtures matching the reference's test.csv kinds ------------------------
WKTS = [
    "POINT (10 20)",
    "POINT (20 30)",
    "LINESTRING (0 0, 10 0, 10 10)",
    "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))",
    "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))",
    "MULTIPOINT ((1 1), (2 2), (3 3))",
    "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))",
    "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((5 5, 6 5, 6 6, 5 6, 5 5)))",
    "GEOMETRYCOLLECTION (POINT (1 1), LINESTRING (0 0, 2 2))",
    "POLYGON EMPTY",
    "POINT EMPTY",
]


@pytest.mark.parametrize("wkt", WKTS)
def test_wkt_wkb_roundtrip(wkt):
    g = from_wkt(wkt)
    assert to_wkt(g) == wkt
    g2 = from_wkb(to_wkb(g))
    assert to_wkt(g2) == wkt


def test_wkt_formatting_matches_jts_style():
    # reference golden strings: TestSedonaIcebergExtension.scala:58-59,92
    assert to_wkt(Geometry.point(10, 20)) == "POINT (10 20)"
    assert to_wkt(Geometry.multipoint([(10, 20), (20, 30)])) == "MULTIPOINT ((10 20), (20 30))"
    assert to_wkt(Geometry.point(10.5, -3.25)) == "POINT (10.5 -3.25)"


def test_envelope_and_box():
    g = from_wkt("LINESTRING (0 5, 10 0, 4 9)")
    assert g.envelope() == (0, 0, 10, 9)
    b = Geometry.box(0, 0, 2, 3)
    assert A.area(b) == 6.0
    assert A.length(b) == 10.0


def test_area_with_hole():
    g = from_wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))")
    assert A.area(g) == 100.0 - 4.0


def test_distance():
    p = from_wkt("POINT (0 0)")
    q = from_wkt("POINT (3 4)")
    assert A.distance(p, q) == 5.0
    box = Geometry.box(10, 0, 20, 10)
    assert A.distance(p, box) == 10.0
    inside = from_wkt("POINT (15 5)")
    assert A.distance(inside, box) == 0.0


def test_point_in_polygon_predicates():
    box = Geometry.box(0, 0, 10, 10)
    inside = Geometry.point(5, 5)
    on_edge = Geometry.point(0, 5)
    outside = Geometry.point(-1, 5)
    assert A.contains(box, inside)
    assert not A.contains(box, on_edge)   # boundary: contains=False
    assert A.covers(box, on_edge)         # covers=True
    assert not A.covers(box, outside)
    assert A.within(inside, box)
    assert A.intersects(on_edge, box)
    assert A.disjoint(outside, box)
    assert A.touches(on_edge, box)
    assert not A.touches(inside, box)


def test_polygon_with_hole_predicates():
    holed = from_wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))")
    in_hole = Geometry.point(5, 5)
    in_body = Geometry.point(1, 1)
    assert not A.contains(holed, in_hole)
    assert A.contains(holed, in_body)
    assert A.disjoint(in_hole, holed)


def test_polygon_polygon_predicates():
    a = Geometry.box(0, 0, 10, 10)
    b = Geometry.box(2, 2, 8, 8)
    c = Geometry.box(5, 5, 15, 15)
    d = Geometry.box(20, 20, 30, 30)
    e = Geometry.box(10, 0, 20, 10)  # shares edge with a
    assert A.contains(a, b) and A.within(b, a)
    assert A.overlaps(a, c) and A.overlaps(c, a)
    assert not A.overlaps(a, b)  # containment is not overlap
    assert A.disjoint(a, d)
    assert A.touches(a, e) and not A.overlaps(a, e)
    assert A.equals(a, Geometry.box(0, 0, 10, 10))


def test_line_predicates():
    l1 = from_wkt("LINESTRING (0 0, 10 10)")
    l2 = from_wkt("LINESTRING (0 10, 10 0)")
    l3 = from_wkt("LINESTRING (0 1, 10 11)")
    box = Geometry.box(0, 0, 10, 10)
    assert A.crosses(l1, l2)
    assert A.intersects(l1, l2)
    assert A.disjoint(l1, l3)
    assert A.covers(box, l1)
    assert A.contains(box, l1)
    lcross = from_wkt("LINESTRING (-5 5, 15 5)")
    assert A.crosses(lcross, box)
    assert not A.crosses(l1, box)  # fully inside → within, not crosses


def test_centroid_matches_reference_semantics():
    # areal priority: polygon centroid
    sq = Geometry.box(0, 0, 10, 10)
    c = A.centroid(sq)
    assert c.coords == (5.0, 5.0)
    # puntal: average of points
    mp = from_wkt("MULTIPOINT ((0 0), (10 0), (10 10), (0 10))")
    assert A.centroid(mp).coords == (5.0, 5.0)
    # lineal
    line = from_wkt("LINESTRING (0 0, 10 0)")
    assert A.centroid(line).coords == (5.0, 0.0)
    # collection: areal wins over points (priority per AggregateFunctions.scala:111-126)
    coll = Geometry.collection([sq, Geometry.point(100, 100)])
    assert A.centroid(coll).coords == (5.0, 5.0)
    # hole-aware
    holed = from_wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (0 0, 4 0, 4 4, 0 4, 0 0))")
    cx, cy = A.centroid(holed).coords
    # mass removed from lower-left corner → centroid moves up-right
    assert cx > 5.0 and cy > 5.0


def test_centroid_monoid_distributes():
    geoms = [from_wkt(w) for w in WKTS if from_wkt(w) is not None]
    whole = A.centroid_buffer_zero()
    for g in geoms:
        A.centroid_buffer_add(whole, g)
    left = A.centroid_buffer_zero()
    right = A.centroid_buffer_zero()
    for g in geoms[:4]:
        A.centroid_buffer_add(left, g)
    for g in geoms[4:]:
        A.centroid_buffer_add(right, g)
    merged = A.centroid_buffer_merge(left, right)
    assert np.allclose(merged, whole)


def test_union_all_points_golden():
    # reference golden: ST_Union_Aggr over two points → MULTIPOINT ((10 20), (20 30))
    # (TestSedonaIcebergExtension.scala:90-92)
    u = A.union_all([Geometry.point(10, 20), Geometry.point(20, 30), Geometry.point(10, 20)])
    assert to_wkt(u) == "MULTIPOINT ((10 20), (20 30))"


def test_union_two_bridging_polygon_dissolves_components():
    """A polygon bridging two disjoint components of a MultiPolygon must
    dissolve into ONE component — the per-polygon merge loop alone used to
    merge with only the first intersecting component, leaving overlapping
    output (area over-counted)."""
    sq1 = from_wkt("POLYGON((0 0, 2 0, 2 2, 0 2, 0 0))")
    sq2 = from_wkt("POLYGON((3 0, 5 0, 5 2, 3 2, 3 0))")
    bridge = from_wkt("POLYGON((1 0.5, 4 0.5, 4 1.5, 1 1.5, 1 0.5))")
    multi = A.union_two(sq1, sq2)          # disjoint → MULTIPOLYGON
    u = A.union_two(multi, bridge)
    assert A.area(u) == pytest.approx(9.0)  # 4 + 4 + 3 − 2×1 overlap
    assert A.area(u) == pytest.approx(A.area(A.union_all([sq1, sq2, bridge])))


def test_line_line_difference_and_symdiff():
    a = from_wkt("LINESTRING (0 0, 10 0)")
    b = from_wkt("LINESTRING (2 0, 4 0)")
    d = A.difference(a, b)
    assert A.length(d) == pytest.approx(8.0)
    assert d.kind in (2, 5)  # LINESTRING or MULTILINESTRING pieces
    s = A.sym_difference(a, b)
    assert A.length(s) == pytest.approx(8.0)  # b ⊂ a: b−a is empty
    # crossing (non-collinear) lines lose no measure
    c = from_wkt("LINESTRING (5 -5, 5 5)")
    assert A.length(A.difference(a, c)) == pytest.approx(10.0)
    assert A.length(A.sym_difference(a, c)) == pytest.approx(20.0)


def test_buffer_geometrycollection_and_empty():
    gc = from_wkt("GEOMETRYCOLLECTION (POINT (0 0), LINESTRING (10 0, 14 0))")
    buf = A.buffer(gc, 1.0)
    assert buf.dimension() == 2
    # covers both parts, area ≈ circle + capsule (dissolved, disjoint parts)
    assert A.area(buf) == pytest.approx(math.pi + (8 + math.pi), rel=0.02)
    assert A.intersects(buf, from_wkt("POINT (0 0)"))
    assert A.intersects(buf, from_wkt("POINT (12 0)"))
    assert A.buffer(from_wkt("POINT EMPTY"), 1.0).is_empty()


def test_convex_hull():
    mp = from_wkt("MULTIPOINT ((0 0), (10 0), (10 10), (0 10), (5 5))")
    h = A.convex_hull(mp)
    assert A.area(h) == 100.0
    assert A.equals(h, Geometry.box(0, 0, 10, 10))


def test_intersection_boxes():
    a = Geometry.box(0, 0, 10, 10)
    b = Geometry.box(5, 5, 15, 15)
    i = A.intersection(a, b)
    assert A.area(i) == 25.0
    assert A.equals(i, Geometry.box(5, 5, 10, 10))


def test_difference_points():
    mp = from_wkt("MULTIPOINT ((1 1), (5 5), (20 20))")
    box = Geometry.box(0, 0, 10, 10)
    d = A.difference(mp, box)
    assert to_wkt(d) == "POINT (20 20)"


def test_simplify():
    line = from_wkt("LINESTRING (0 0, 1 0.01, 2 0, 4 0)")
    s = A.simplify(line, 0.1)
    assert s.coords == [(0, 0), (4, 0)]


def test_buffer_point():
    b = A.buffer(Geometry.point(0, 0), 1.0)
    assert b.kind == 3
    assert abs(A.area(b) - math.pi) < 0.03  # 32-gon approximation
    assert A.contains(b, Geometry.point(0.5, 0.5))


def test_boundary():
    box = Geometry.box(0, 0, 1, 1)
    b = A.boundary(box)
    assert b.kind == 2 and len(b.coords) == 5
    line = from_wkt("LINESTRING (0 0, 5 5)")
    assert to_wkt(A.boundary(line)) == "MULTIPOINT ((0 0), (5 5))"


def test_normalize_idempotent():
    g = from_wkt("POLYGON ((10 0, 10 10, 0 10, 0 0, 10 0))")
    n1 = A.normalize(g)
    n2 = A.normalize(n1)
    assert n1.coords == n2.coords
    # same geometry, different start/orientation → same normal form
    g2 = from_wkt("POLYGON ((0 0, 0 10, 10 10, 10 0, 0 0))")
    assert A.normalize(g2).coords == n1.coords


def test_vectorized_point_wkb():
    x = pd.Series([1.0, 2.5, None])
    y = pd.Series([4.0, -3.5, 1.0])
    w = vec.points_to_wkb(x, y)
    assert w[2] is None
    g0 = from_wkb(w[0])
    assert g0.coords == (1.0, 4.0)
    xs, ys = vec.wkb_to_points(w)
    assert xs[0] == 1.0 and ys[1] == -3.5 and np.isnan(xs[2])
    xmin, ymin, xmax, ymax = vec.envelopes_of_wkb(w)
    assert xmin[0] == 1.0 and ymax[1] == -3.5


def test_ewkb_srid_parse():
    # EWKB with SRID flag (0x20000000): srid=4326 point
    import struct
    buf = b"\x01" + struct.pack("<I", 0x20000001) + struct.pack("<I", 4326) + struct.pack("<dd", 1.0, 2.0)
    g = from_wkb(buf)
    assert g.srid == 4326 and g.coords == (1.0, 2.0)


def test_line_polygon_intersection_general():
    """General (concave, holed) line∩polygon overlay — no tier-2 limits."""
    from sedona_iceberg_extension_spark.geom import from_wkt, to_wkt
    from sedona_iceberg_extension_spark.geom.algos import intersection

    def ix(a, b):
        return to_wkt(intersection(from_wkt(a), from_wkt(b)))

    assert ix("LINESTRING (-5 5, 15 5)",
              "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))") == "LINESTRING (0 5, 10 5)"
    # concave C-shape: interior at y=5 is only x in [8, 10]
    assert ix("LINESTRING (-1 5, 11 5)",
              "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 8, 8 8, 8 2, 0 2, 0 0))") \
        == "LINESTRING (8 5, 10 5)"
    # hole splits the chord in two
    assert ix("LINESTRING (-5 5, 15 5)",
              "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))") \
        == "MULTILINESTRING ((0 5, 4 5), (6 5, 10 5))"


def test_line_line_intersection_general():
    from sedona_iceberg_extension_spark.geom import from_wkt, to_wkt
    from sedona_iceberg_extension_spark.geom.algos import intersection

    def ix(a, b):
        return to_wkt(intersection(from_wkt(a), from_wkt(b)))

    assert ix("LINESTRING (0 0, 10 10)", "LINESTRING (0 10, 10 0)") == "POINT (5 5)"
    assert ix("LINESTRING (0 0, 10 0)", "LINESTRING (5 0, 15 0)") == "LINESTRING (5 0, 10 0)"
    # overlap + transversal crossing already covered by the overlap segment
    assert ix("MULTILINESTRING ((0 0, 10 0), (0 -5, 0 5))",
              "LINESTRING (-5 0, 5 0)") == "LINESTRING (0 0, 5 0)"
    # disjoint-but-bbox-overlapping lines
    assert ix("LINESTRING (0 0, 4 4)", "LINESTRING (5 0, 5 4)") == "LINESTRING EMPTY"


def test_polygon_polygon_intersection_general():
    """Concave/holed areal overlay — boundary-stitching path."""
    from sedona_iceberg_extension_spark.geom import from_wkt, to_wkt
    from sedona_iceberg_extension_spark.geom.algos import area, intersection

    def ar(a, b):
        return round(area(intersection(from_wkt(a), from_wkt(b))), 9)

    L = "POLYGON ((0 0, 10 0, 10 4, 4 4, 4 10, 0 10, 0 0))"
    assert ar(L, "POLYGON ((2 2, 8 2, 8 8, 2 8, 2 2))") == 20.0
    # interlocking concave Ls
    assert ar("POLYGON ((0 0, 6 0, 6 2, 2 2, 2 6, 0 6, 0 0))",
              "POLYGON ((1 1, 5 1, 5 5, 3 5, 3 3, 1 3, 1 1))") == 5.0
    # hole survives when fully inside the clip region
    holed = ("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), "
             "(3 3, 7 3, 7 7, 3 7, 3 3))")
    r = intersection(from_wkt(holed),
                     from_wkt("POLYGON ((2 2, 8 2, 8 8, 2 8, 2 2))"))
    assert round(area(r), 9) == 20.0
    assert to_wkt(r) == ("POLYGON ((2 2, 8 2, 8 8, 2 8, 2 2), "
                         "(3 3, 7 3, 7 7, 3 7, 3 3))")
    # hole partially overlapping the clip window
    assert ar(holed, "POLYGON ((4 4, 8 4, 8 8, 4 8, 4 4))") == 7.0
    # concave ∩ concave C-shapes
    assert ar("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 8, 8 8, 8 2, 0 2, 0 0))",
              "POLYGON ((0 1, 10 1, 10 9, 0 9, 0 7, 9 7, 9 3, 0 3, 0 1))") == 28.0
    # edge-adjacent: empty areal intersection
    assert ar("POLYGON ((0 0, 5 0, 5 5, 0 5, 0 0))",
              "POLYGON ((5 0, 10 0, 10 5, 5 5, 5 0))") == 0.0


def test_general_areal_difference_union_symdiff():
    from sedona_iceberg_extension_spark.geom import from_wkt, to_wkt
    from sedona_iceberg_extension_spark.geom.algos import (
        area, difference, sym_difference, union_two)

    A_ = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"
    B_ = "POLYGON ((5 5, 15 5, 15 15, 5 15, 5 5))"
    C_ = "POLYGON ((3 3, 7 3, 7 7, 3 7, 3 3))"
    L_ = "POLYGON ((0 0, 10 0, 10 4, 4 4, 4 10, 0 10, 0 0))"

    assert round(area(difference(from_wkt(A_), from_wkt(B_))), 9) == 75.0
    # subtrahend strictly inside → punched hole
    d = difference(from_wkt(A_), from_wkt(C_))
    assert round(area(d), 9) == 84.0 and len(d.coords) == 2
    # concave minuend: L ∩ C has area 7 → 64 - 7
    assert round(area(difference(from_wkt(L_), from_wkt(C_))), 9) == 57.0
    assert round(area(sym_difference(from_wkt(A_), from_wkt(B_))), 9) == 150.0
    assert round(area(union_two(from_wkt(A_), from_wkt(B_))), 9) == 175.0
    # edge-adjacent squares dissolve into one region
    u = union_two(from_wkt("POLYGON ((0 0, 5 0, 5 5, 0 5, 0 0))"),
                  from_wkt("POLYGON ((5 0, 10 0, 10 5, 5 5, 5 0))"))
    assert round(area(u), 9) == 50.0 and u.kind == 3
    # line minus polygon
    lm = difference(from_wkt("LINESTRING (-5 5, 15 5)"), from_wkt(A_))
    assert to_wkt(lm) == "MULTILINESTRING ((-5 5, 0 5), (10 5, 15 5))"


def test_buffer_line_and_polygon():
    from sedona_iceberg_extension_spark.geom import from_wkt
    from sedona_iceberg_extension_spark.geom.algos import area, buffer, contains

    b = buffer(from_wkt("LINESTRING (0 0, 10 0)"), 1.0)
    # capsule: 2*d*len + pi*d^2 (32-gon inscribed, slight deficit)
    assert abs(area(b) - (20 + math.pi)) < 0.1
    assert contains(b, from_wkt("POINT (5 0.9)"))
    assert not contains(b, from_wkt("POINT (5 1.1)"))

    p = buffer(from_wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"), 1.0)
    assert abs(area(p) - (100 + 40 + math.pi)) < 0.1
    assert contains(p, from_wkt("POINT (-0.9 5)"))
    assert not contains(p, from_wkt("POINT (-1.1 -1.1)"))


def test_negative_buffer_erosion():
    from sedona_iceberg_extension_spark.geom import from_wkt
    from sedona_iceberg_extension_spark.geom.algos import area, buffer, contains

    sq = from_wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
    eroded = buffer(sq, -1.0)
    assert abs(area(eroded) - 64.0) < 0.05
    assert contains(eroded, from_wkt("POINT (5 5)"))
    assert not contains(eroded, from_wkt("POINT (0.5 0.5)"))
    assert area(buffer(sq, -6.0)) == 0.0          # eroded away
    assert area(buffer(from_wkt("LINESTRING (0 0, 5 5)"), -1.0)) == 0.0


def test_mixed_dimension_symdifference():
    from sedona_iceberg_extension_spark.geom import from_wkt, to_wkt
    from sedona_iceberg_extension_spark.geom.algos import sym_difference

    sq = from_wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
    line = from_wkt("LINESTRING (-5 5, 15 5)")
    s = sym_difference(sq, line)
    kinds = sorted(g.kind for g in s.flatten())
    # polygon stays whole; the line keeps its two outside pieces
    assert kinds == [2, 2, 3]
