"""Extended function surface: GeoJSON/GML/KML IO, PointZ, spheroid distance,
Web Mercator transform, ST_Collect, ST_Split."""

import math

import pytest


def sql1(spark, expr):
    return spark.sql(f"SELECT {expr} AS v").collect()[0]["v"]


def test_geojson_roundtrip(spark):
    gj = '{"type": "Polygon", "coordinates": [[[0,0],[4,0],[4,4],[0,4],[0,0]]]}'
    assert sql1(spark, f"ST_Area(ST_GeomFromGeoJSON('{gj}'))") == 16.0
    out = sql1(spark, "ST_AsGeoJSON(ST_Point(1D, 2D))")
    assert '"type": "Point"' in out and "[1.0, 2.0]" in out


def test_gml_kml(spark):
    gml = "<gml:Point><gml:coordinates>3,4</gml:coordinates></gml:Point>"
    assert sql1(spark, f"ST_AsText(ST_GeomFromGML('{gml}'))") == "POINT (3 4)"
    kml = "<Point><coordinates>5,6</coordinates></Point>"
    assert sql1(spark, f"ST_AsText(ST_GeomFromKML('{kml}'))") == "POINT (5 6)"
    out = sql1(spark, "ST_AsKML(ST_Point(1D,2D))")
    assert "<coordinates>1.0,2.0</coordinates>" in out
    out = sql1(spark, "ST_AsGML(ST_GeomFromText('LINESTRING (0 0, 1 1)'))")
    assert "gml:LineString" in out


def test_pointz(spark):
    assert sql1(spark, "ST_Z(ST_PointZ(1D, 2D, 3D))") == 3.0
    assert sql1(spark, "ST_AsText(ST_PointZ(1D, 2D, 3D))") == "POINT Z (1 2 3)"
    assert sql1(spark, "ST_X(ST_PointZ(1D, 2D, 3D))") == 1.0
    d = sql1(spark, "ST_3DDistance(ST_PointZ(0D,0D,0D), ST_PointZ(2D,3D,6D))")
    assert d == pytest.approx(7.0)
    # Z survives the WKB round trip
    assert sql1(spark, "ST_Z(ST_GeomFromWKB(ST_AsBinary(ST_PointZ(1D,2D,9D))))") == 9.0


def test_distance_spheroid(spark):
    # Paris (2.35, 48.85) → London (-0.13, 51.51): ~344 km (public fact)
    d = sql1(spark, "ST_DistanceSpheroid(ST_Point(2.35D, 48.85D), ST_Point(-0.13D, 51.51D))")
    assert 330_000 < d < 360_000
    # sphere vs spheroid within 0.5%
    ds = sql1(spark, "ST_DistanceSphere(ST_Point(2.35D, 48.85D), ST_Point(-0.13D, 51.51D))")
    assert abs(d - ds) / d < 0.005


def test_transform_web_mercator(spark):
    x = sql1(spark, "ST_X(ST_Transform(ST_Point(0D, 0D), 'EPSG:4326', 'EPSG:3857'))")
    assert x == pytest.approx(0.0)
    # (90, 45) lon/lat → x = R * pi/2
    x = sql1(spark, "ST_X(ST_Transform(ST_Point(90D, 45D), 'EPSG:4326', 'EPSG:3857'))")
    assert x == pytest.approx(6378137.0 * math.pi / 2, rel=1e-9)
    # round trip
    y = sql1(spark, "ST_Y(ST_Transform(ST_Transform(ST_Point(10D, 20D), "
                    "'EPSG:4326', 'EPSG:3857'), 'EPSG:3857', 'EPSG:4326'))")
    assert y == pytest.approx(20.0, abs=1e-9)


def test_transform_utm(spark):
    # CN Tower (public UTM example): 43.642567N 79.387139W = zone 17N
    # E 630084, N 4833438
    e = sql1(spark, "ST_X(ST_Transform(ST_Point(-79.387139D, 43.642567D), "
                    "'EPSG:4326', 'EPSG:32617'))")
    n = sql1(spark, "ST_Y(ST_Transform(ST_Point(-79.387139D, 43.642567D), "
                    "'EPSG:4326', 'EPSG:32617'))")
    assert e == pytest.approx(630084, abs=1.0)
    assert n == pytest.approx(4833438, abs=1.0)
    # central meridian of any zone maps to E=500000 exactly
    e = sql1(spark, "ST_X(ST_Transform(ST_Point(15D, 60D), "
                    "'EPSG:4326', 'EPSG:32633'))")
    assert e == pytest.approx(500000.0, abs=1e-6)
    # southern hemisphere gets the 10,000 km false northing
    n = sql1(spark, "ST_Y(ST_Transform(ST_Point(151.2D, -33.85D), "
                    "'EPSG:4326', 'EPSG:32756'))")
    assert 6_000_000 < n < 6_500_000
    # round trip through a projected-to-projected pipeline (UTM → 3857)
    y = sql1(spark, "ST_Y(ST_Transform(ST_Transform(ST_Transform("
                    "ST_Point(18.4D, -33.9D), 'EPSG:4326', 'EPSG:32734'), "
                    "'EPSG:32734', 'EPSG:3857'), 'EPSG:3857', 'EPSG:4326'))")
    assert y == pytest.approx(-33.9, abs=1e-6)


def test_transform_world_mercator(spark):
    # EPSG:3395 equator matches 3857 (both a*lon), but latitudes differ
    # (ellipsoidal vs spherical)
    x = sql1(spark, "ST_X(ST_Transform(ST_Point(90D, 0D), 'EPSG:4326', 'EPSG:3395'))")
    assert x == pytest.approx(6378137.0 * math.pi / 2, rel=1e-9)
    y3395 = sql1(spark, "ST_Y(ST_Transform(ST_Point(0D, 45D), 'EPSG:4326', 'EPSG:3395'))")
    y3857 = sql1(spark, "ST_Y(ST_Transform(ST_Point(0D, 45D), 'EPSG:4326', 'EPSG:3857'))")
    assert y3395 < y3857          # ellipsoidal Mercator is ~0.3% south
    assert abs(y3395 - y3857) / y3857 < 0.01
    y = sql1(spark, "ST_Y(ST_Transform(ST_Transform(ST_Point(12.34D, 56.78D), "
                    "'EPSG:4326', 'EPSG:3395'), 'EPSG:3395', 'EPSG:4326'))")
    assert y == pytest.approx(56.78, abs=1e-9)


def test_collect_and_split(spark):
    out = sql1(spark, "ST_AsText(ST_Collect(array(ST_Point(1D,1D), ST_Point(2D,2D))))")
    assert out == "MULTIPOINT ((1 1), (2 2))"
    out = sql1(spark, "ST_AsText(ST_Split(ST_GeomFromText('LINESTRING (0 0, 10 0)'), "
                      "ST_Point(4D, 0D)))")
    assert out == "MULTILINESTRING ((0 0, 4 0), (4 0, 10 0))"


def test_transform_conic_and_equal_area(spark):
    # RGF93 / Lambert-93: Paris (2.3522E, 48.8566N) — canonical grid value
    x = sql1(spark, "ST_X(ST_Transform(ST_Point(2.3522D, 48.8566D), "
                    "'EPSG:4326', 'EPSG:2154'))")
    y = sql1(spark, "ST_Y(ST_Transform(ST_Point(2.3522D, 48.8566D), "
                    "'EPSG:4326', 'EPSG:2154'))")
    assert x == pytest.approx(652469.02, abs=1.0)
    assert y == pytest.approx(6862035.26, abs=1.0)
    # natural origins map exactly to the false easting/northing
    x = sql1(spark, "ST_X(ST_Transform(ST_Point(10D, 52D), "
                    "'EPSG:4326', 'EPSG:3035'))")
    assert x == pytest.approx(4321000.0, abs=1e-6)
    y = sql1(spark, "ST_Y(ST_Transform(ST_Point(-96D, 23D), "
                    "'EPSG:4326', 'EPSG:5070'))")
    assert y == pytest.approx(0.0, abs=1e-6)
    # round trips, incl. the negative-n southern-hemisphere Albers
    for code, lon, lat in (("2154", -4.5, 42.5), ("3978", -140.0, 70.0),
                           ("5070", -120.0, 49.0), ("3577", 115.0, -32.0),
                           ("3035", 25.0, 60.0), ("6933", -170.0, 80.0)):
        back = sql1(spark, f"ST_Y(ST_Transform(ST_Transform("
                           f"ST_Point({lon}D, {lat}D), 'EPSG:4326', "
                           f"'EPSG:{code}'), 'EPSG:{code}', 'EPSG:4326'))")
        assert back == pytest.approx(lat, abs=1e-9), code


def test_transform_state_plane_and_osgb(spark):
    """The data-driven EPSG table: state-plane LCC/TM zones, Texas Centric
    Albers, NAD83/ETRS89 UTM aliases, and a non-WGS84 ellipsoid (OSGB,
    Airy 1830) — validated against the published OS worked example and the
    FE/FN-at-origin identity, plus round trips."""
    # OSGB36 worked example (OS Guide Annexe C): Caister water tower
    lat = 52 + 39 / 60 + 27.2531 / 3600
    lon = 1 + 43 / 60 + 4.5177 / 3600
    e = sql1(spark, f"ST_X(ST_Transform(ST_Point({lon!r}D, {lat!r}D), "
                    "'EPSG:4326', 'EPSG:27700'))")
    n = sql1(spark, f"ST_Y(ST_Transform(ST_Point({lon!r}D, {lat!r}D), "
                    "'EPSG:4326', 'EPSG:27700'))")
    assert e == pytest.approx(651409.903, abs=2e-3)
    assert n == pytest.approx(313177.270, abs=2e-3)
    # natural origin -> (FE, FN) for each new family
    for code, lon0, lat0, fe, fn in (
            ("26985", -77.0, 37 + 40 / 60, 400000.0, 0.0),      # MD LCC
            ("32139", -(100 + 20 / 60), 29 + 40 / 60,
             700000.0, 3000000.0),                              # TX LCC
            ("3083", -100.0, 18.0, 1500000.0, 6000000.0),       # TX Albers
            ("26929", -(85 + 50 / 60), 30.5, 200000.0, 0.0),    # AL TM
            ("26948", -(110 + 10 / 60), 31.0, 213360.0, 0.0)):  # AZ TM
        x = sql1(spark, f"ST_X(ST_Transform(ST_Point({lon0!r}D, {lat0!r}D), "
                        f"'EPSG:4326', 'EPSG:{code}'))")
        y = sql1(spark, f"ST_Y(ST_Transform(ST_Point({lon0!r}D, {lat0!r}D), "
                        f"'EPSG:4326', 'EPSG:{code}'))")
        assert x == pytest.approx(fe, abs=1e-6), code
        assert y == pytest.approx(fn, abs=1e-6), code
    # NAD83 / ETRS89 UTM aliases equal the WGS84 UTM grid
    for alias, base, lon, lat in (("26918", "32618", -75.0, 40.0),
                                  ("25832", "32632", 9.0, 48.0)):
        xa = sql1(spark, f"ST_X(ST_Transform(ST_Point({lon}D, {lat}D), "
                         f"'EPSG:4326', 'EPSG:{alias}'))")
        xb = sql1(spark, f"ST_X(ST_Transform(ST_Point({lon}D, {lat}D), "
                         f"'EPSG:4326', 'EPSG:{base}'))")
        assert xa == xb
    # round trips over each new code's domain
    for code, lon, lat in (("26985", -76.2, 39.1), ("26945", -119.5, 34.7),
                           ("32139", -98.0, 30.8), ("32100", -111.0, 46.9),
                           ("3083", -99.0, 31.0), ("26929", -85.5, 32.4),
                           ("26948", -109.8, 34.1), ("27700", -3.2, 55.9),
                           ("26910", -122.3, 47.6), ("25833", 13.4, 52.5)):
        for fn_ in ("ST_X", "ST_Y"):
            back = sql1(spark, f"{fn_}(ST_Transform(ST_Transform("
                               f"ST_Point({lon}D, {lat}D), 'EPSG:4326', "
                               f"'EPSG:{code}'), 'EPSG:{code}', 'EPSG:4326'))")
            want = lon if fn_ == "ST_X" else lat
            assert back == pytest.approx(want, abs=1e-8), code


def test_transform_polar_stereographic(spark):
    """Polar stereographic family: NSIDC sea-ice grids (3413/3976),
    Antarctic PS (3031), UPS (32661/32761).  Pole -> (FE, FN) identity,
    true scale at the standard parallel, and domain round trips."""
    for code, pole, fe, fn in (("3413", 90.0, 0.0, 0.0),
                               ("3976", -90.0, 0.0, 0.0),
                               ("3031", -90.0, 0.0, 0.0),
                               ("32661", 90.0, 2000000.0, 2000000.0),
                               ("32761", -90.0, 2000000.0, 2000000.0)):
        x = sql1(spark, f"ST_X(ST_Transform(ST_Point(12D, {pole}D), "
                        f"'EPSG:4326', 'EPSG:{code}'))")
        y = sql1(spark, f"ST_Y(ST_Transform(ST_Point(12D, {pole}D), "
                        f"'EPSG:4326', 'EPSG:{code}'))")
        assert x == pytest.approx(fe, abs=1e-6), code
        assert y == pytest.approx(fn, abs=1e-6), code
    for code, lon, lat in (("3413", -150.0, 72.5), ("3976", 17.0, -75.0),
                           ("3031", -60.0, -82.0), ("32661", 45.0, 85.0),
                           ("32761", -120.0, -87.5)):
        for fn_, want in (("ST_X", lon), ("ST_Y", lat)):
            back = sql1(spark, f"{fn_}(ST_Transform(ST_Transform("
                               f"ST_Point({lon}D, {lat}D), 'EPSG:4326', "
                               f"'EPSG:{code}'), 'EPSG:{code}', 'EPSG:4326'))")
            assert back == pytest.approx(want, abs=1e-8), code


def test_split_extended_blades(spark):
    # multipoint blade: 3 parts
    out = sql1(spark, "ST_AsText(ST_Split(ST_GeomFromText('LINESTRING (0 0, 10 0)'), "
                      "ST_GeomFromText('MULTIPOINT ((3 0), (7 0))')))")
    assert out == "MULTILINESTRING ((0 0, 3 0), (3 0, 7 0), (7 0, 10 0))"
    # crossing line blade: split at the crossing
    out = sql1(spark, "ST_AsText(ST_Split(ST_GeomFromText('LINESTRING (0 0, 10 0)'), "
                      "ST_GeomFromText('LINESTRING (5 -1, 5 1)')))")
    assert out == "MULTILINESTRING ((0 0, 5 0), (5 0, 10 0))"
    # multilinestring subject, point blade on one part only
    out = sql1(spark, "ST_AsText(ST_Split(ST_GeomFromText("
                      "'MULTILINESTRING ((0 0, 4 0), (0 1, 4 1))'), "
                      "ST_Point(2D, 0D)))")
    assert out == "MULTILINESTRING ((0 0, 2 0), (2 0, 4 0), (0 1, 4 1))"


def test_split_polygon_subjects(spark):
    # PostGIS golden set: square cut by a vertical line
    out = sql1(spark, "ST_AsText(ST_Split(ST_GeomFromText("
                      "'POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))'), "
                      "ST_GeomFromText('LINESTRING (5 -1, 5 11)')))")
    assert out == ("MULTIPOLYGON (((0 0, 5 0, 5 10, 0 10, 0 0)), "
                   "((5 0, 10 0, 10 10, 5 10, 5 0)))")
    # blade missing the polygon → unchanged subject
    out = sql1(spark, "ST_AsText(ST_Split(ST_GeomFromText("
                      "'POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))'), "
                      "ST_GeomFromText('LINESTRING (20 0, 20 10)')))")
    assert out == "MULTIPOLYGON (((0 0, 10 0, 10 10, 0 10, 0 0)))"
    # hole crossed on both sides: each half keeps its notch (areas 48+48)
    out = sql1(spark, "ST_AsText(ST_Split(ST_GeomFromText("
                      "'POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), "
                      "(4 4, 6 4, 6 6, 4 6, 4 4))'), "
                      "ST_GeomFromText('LINESTRING (5 -1, 5 11)')))")
    assert out == ("MULTIPOLYGON (((0 0, 5 0, 5 4, 4 4, 4 6, 5 6, 5 10, "
                   "0 10, 0 0)), ((5 0, 10 0, 10 10, 5 10, 5 6, 6 6, 6 4, "
                   "5 4, 5 0)))")
    # untouched hole stays subtracted from its piece
    out = sql1(spark, "ST_AsText(ST_Split(ST_GeomFromText("
                      "'POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), "
                      "(1 1, 2 1, 2 2, 1 2, 1 1))'), "
                      "ST_GeomFromText('LINESTRING (5 -1, 5 11)')))")
    assert out == ("MULTIPOLYGON (((0 0, 5 0, 5 10, 0 10, 0 0), "
                   "(1 1, 2 1, 2 2, 1 2, 1 1)), "
                   "((5 0, 10 0, 10 10, 5 10, 5 0)))")
    # multipolygon subject: only the crossed part splits
    out = sql1(spark, "ST_AsText(ST_Split(ST_GeomFromText("
                      "'MULTIPOLYGON (((0 0, 2 0, 2 2, 0 2, 0 0)), "
                      "((5 0, 7 0, 7 2, 5 2, 5 0)))'), "
                      "ST_GeomFromText('LINESTRING (1 -1, 1 3)')))")
    assert out == ("MULTIPOLYGON (((0 0, 1 0, 1 2, 0 2, 0 0)), "
                   "((1 0, 2 0, 2 2, 1 2, 1 0)), "
                   "((5 0, 7 0, 7 2, 5 2, 5 0)))")
    # dangling blade (ends inside) splits nothing — PostGIS semantics
    out = sql1(spark, "ST_AsText(ST_Split(ST_GeomFromText("
                      "'POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))'), "
                      "ST_GeomFromText('LINESTRING (5 -1, 5 5)')))")
    from sedona_iceberg_extension_spark.geom.algos import area
    from sedona_iceberg_extension_spark.geom.io import from_wkt
    g = from_wkt(out)
    assert g.num_geometries() == 1 and area(g) == pytest.approx(100.0)


def test_split_polygon_property_fuzz():
    """Conservation fuzz: random convex polygons cut by random full-crossing
    chords — piece areas sum to the subject's area and every piece interior
    stays inside the subject."""
    import random

    from sedona_iceberg_extension_spark.geom.algos import (
        area, convex_hull, locate_in_polygon, split_polygon_by_line,
        _poly_interior_point)
    from sedona_iceberg_extension_spark.geom.model import Geometry

    rnd = random.Random(20260814)
    for trial in range(40):
        pts = [(rnd.uniform(0, 10), rnd.uniform(0, 10)) for _ in range(8)]
        hull = convex_hull(Geometry.multipoint(pts))
        if hull.kind != 3 or area(hull) < 1.0:
            continue
        blade = Geometry.linestring([(rnd.uniform(0, 10), -20.0),
                                     (rnd.uniform(0, 10), 30.0)])
        parts = split_polygon_by_line(hull, blade)
        assert sum(area(p) for p in parts) == pytest.approx(
            area(hull), rel=1e-9), trial
        for p in parts:
            ip = _poly_interior_point(p.coords)
            assert ip is not None and locate_in_polygon(
                ip, hull.coords) == 2, trial


def test_concavehull_and_delaunay(spark):
    import math
    import random

    from sedona_iceberg_extension_spark.geom.algos import (
        area, concave_hull, convex_hull, covered_by, delaunay_triangles)
    from sedona_iceberg_extension_spark.geom.model import Geometry

    # Delaunay over a unit grid tiles it exactly
    g = Geometry.multipoint([(x, y) for x in range(4) for y in range(4)])
    tris = delaunay_triangles(g)
    assert len(tris) == 18
    total = sum(abs((b[0] - a[0]) * (c[1] - a[1])
                    - (c[0] - a[0]) * (b[1] - a[1])) / 2
                for a, b, c in tris)
    assert total == pytest.approx(9.0)

    # concave hull contracts: tighter than convex on a C-shaped cloud,
    # still covers every input point; pct=1 ~ convex hull (mod slivers)
    rnd = random.Random(3)
    pts = []
    for _ in range(200):
        t = rnd.uniform(0.25 * math.pi, 1.75 * math.pi)
        r = rnd.uniform(3, 4)
        pts.append((r * math.cos(t), r * math.sin(t)))
    cloud = Geometry.multipoint(pts)
    cc = concave_hull(cloud, 0.1)
    assert area(cc) < 0.5 * area(convex_hull(cloud))
    assert all(covered_by(Geometry.point(*p), cc) for p in pts)
    assert area(concave_hull(cloud, 1.0)) == pytest.approx(
        area(convex_hull(cloud)), rel=1e-2)

    # SQL surface
    out = sql1(spark, "ST_AsText(ST_ConcaveHull(ST_GeomFromText("
                      "'MULTIPOINT ((0 0),(4 0),(4 4),(0 4),(2 1))'), 1.0))")
    assert out == "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"
    n = sql1(spark, "ST_NumGeometries(ST_DelaunayTriangles(ST_GeomFromText("
                    "'MULTIPOINT ((0 0),(1 0),(0 1),(1 1))')))")
    assert n == 2


def test_transform_proj4_strings(spark):
    """Arbitrary-CRS support via PROJ.4 strings: any CRS of an implemented
    projection family works without a proj database.  Each proj-string
    spelling must land exactly on its EPSG-table twin; +towgs84 datum
    shifts compose a closed-form Helmert transform (round 7)."""
    pairs = [
        ("27700", "+proj=tmerc +lat_0=49 +lon_0=-2 +k=0.9996012717 "
                  "+x_0=400000 +y_0=-100000 +ellps=airy"),
        ("32633", "+proj=utm +zone=33 +ellps=WGS84"),
        ("2154", "+proj=lcc +lat_0=46.5 +lon_0=3 +lat_1=49 +lat_2=44 "
                 "+x_0=700000 +y_0=6600000 +ellps=GRS80"),
        ("3035", "+proj=laea +lat_0=52 +lon_0=10 +x_0=4321000 "
                 "+y_0=3210000 +ellps=GRS80"),
    ]
    for code, pstr in pairs:
        for fn in ("ST_X", "ST_Y"):
            a = sql1(spark, f"{fn}(ST_Transform(ST_Point(7.45D, 46.95D), "
                            f"'EPSG:4326', 'EPSG:{code}'))")
            b = sql1(spark, f"{fn}(ST_Transform(ST_Point(7.45D, 46.95D), "
                            f"'EPSG:4326', '{pstr}'))")
            assert b == pytest.approx(a, abs=1e-6), (code, fn)
    # longlat round trip through a proj-string CRS
    back = sql1(spark, "ST_X(ST_Transform(ST_Transform("
                       "ST_Point(16.37D, 48.2D), "
                       "'+proj=longlat +ellps=WGS84', "
                       "'+proj=utm +zone=33 +ellps=WGS84'), "
                       "'+proj=utm +zone=33 +ellps=WGS84', "
                       "'+proj=longlat +ellps=WGS84'))")
    assert back == pytest.approx(16.37, abs=1e-8)


_OSGB_P4 = ("+proj=tmerc +lat_0=49 +lon_0=-2 +k=0.9996012717 "
            "+x_0=400000 +y_0=-100000 +ellps=airy "
            "+towgs84=446.448,-125.157,542.060,0.1502,0.2470,0.8421,-20.4894")


def test_transform_towgs84_helmert(spark):
    """7-parameter Helmert datum shifts (+towgs84, position-vector) —
    closed-form geocentric arithmetic, validated against the published
    Greenwich separation and analytic pure-translation cases."""
    import math

    from sedona_iceberg_extension_spark.functions.udfs_ext import (
        _AIRY_A, _AIRY_F, _WGS84_A, _WGS84_F, _helmert_fns, _parse_proj4)

    # (1) the famous ~102-112 m Greenwich offset: the OSGB36 zero meridian
    # at Greenwich latitude sits ~5-6 arcsec WEST of WGS84 zero (the
    # published EPSG 7-param transform gives about -5.8")
    to_w, from_w = _helmert_fns(
        [446.448, -125.157, 542.060, 0.1502, 0.2470, 0.8421, -20.4894],
        _AIRY_A, _AIRY_F)
    glon, glat = to_w(0.0, 51.4779)
    assert -0.0017 < glon < -0.0014          # 5.0"-6.1" W
    assert 0.0004 < glat - 51.4779 < 0.0008  # ~50-90 m N
    # (2) round-trip through the full projected CRS closes to ~1e-7 deg
    fwd, inv = _parse_proj4(_OSGB_P4)
    x, y = fwd(-0.1278, 51.5074)
    lon2, lat2 = inv(x, y)
    assert abs(lon2 - (-0.1278)) < 1e-7 and abs(lat2 - 51.5074) < 1e-7
    # (3) pure-translation analytic case: +100 m along ECEF X at
    # (lon=90, lat=0) moves longitude to exactly atan2(a, 100)
    to_t, _ = _helmert_fns([100.0, 0.0, 0.0], _WGS84_A, _WGS84_F)
    lo, la = to_t(90.0, 0.0)
    assert lo == pytest.approx(math.degrees(math.atan2(_WGS84_A, 100.0)),
                               abs=1e-12)
    assert la == pytest.approx(0.0, abs=1e-12)
    # (4) all-zero shift is the identity
    f0, i0 = _parse_proj4("+proj=longlat +ellps=WGS84 +towgs84=0,0,0")
    assert f0(12.5, 41.9) == (12.5, 41.9)
    # (5) +datum=OSGB36 expands to airy + the same 7 params
    fd, _ = _parse_proj4("+proj=tmerc +lat_0=49 +lon_0=-2 "
                         "+k=0.9996012717 +x_0=400000 +y_0=-100000 "
                         "+datum=OSGB36")
    xd, yd = fd(-0.1278, 51.5074)
    assert xd == pytest.approx(x, abs=1e-9) and yd == pytest.approx(y, abs=1e-9)
    # (6) the SQL surface end-to-end (inverse direction: WGS84 -> OSGB36)
    osgb_lon = sql1(spark, "ST_X(ST_Transform(ST_Point(-0.1278D, 51.5074D), "
                           f"'EPSG:4326', '{_OSGB_P4}'))")
    assert 529900 < osgb_lon < 530150  # London easting on the National Grid
    # (7) NAD27 needs NADCON grids -> labeled error, not silent wrongness
    with pytest.raises(Exception, match="datum"):
        sql1(spark, "ST_X(ST_Transform(ST_Point(1D, 2D), 'EPSG:4326', "
                    "'+proj=longlat +datum=NAD27'))")


def test_buildarea_linefrommultipoint_zminmax(spark):
    # BuildArea: closed linework with a hole → polygon with hole
    out = sql1(spark, "ST_AsText(ST_BuildArea(ST_GeomFromText("
                      "'MULTILINESTRING ((0 0, 10 0, 10 10, 0 10, 0 0), "
                      "(2 2, 8 2, 8 8, 2 8, 2 2))')))")
    assert out == ("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), "
                   "(2 2, 8 2, 8 8, 2 8, 2 2))")
    # segments forming a ring assemble; dangling linework bounds nothing
    out = sql1(spark, "ST_AsText(ST_BuildArea(ST_GeomFromText("
                      "'MULTILINESTRING ((0 0, 1 0), (1 0, 1 1), "
                      "(1 1, 0 1), (0 1, 0 0))')))")
    assert out == "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"
    assert sql1(spark, "ST_AsText(ST_BuildArea(ST_GeomFromText("
                       "'LINESTRING (0 0, 5 5)')))") \
        == "GEOMETRYCOLLECTION EMPTY"
    # island nesting: ring inside a hole becomes its own shell
    out = sql1(spark, "ST_AsText(ST_BuildArea(ST_GeomFromText("
                      "'MULTILINESTRING ((0 0, 10 0, 10 10, 0 10, 0 0), "
                      "(2 2, 8 2, 8 8, 2 8, 2 2), "
                      "(4 4, 6 4, 6 6, 4 6, 4 4))')))")
    assert out == ("MULTIPOLYGON (((0 0, 10 0, 10 10, 0 10, 0 0), "
                   "(2 2, 8 2, 8 8, 2 8, 2 2)), "
                   "((4 4, 6 4, 6 6, 4 6, 4 4)))")
    # LineFromMultiPoint: coordinate order preserved; non-multipoint → null
    assert sql1(spark, "ST_AsText(ST_LineFromMultiPoint(ST_GeomFromText("
                       "'MULTIPOINT ((0 0), (1 1), (2 0))')))") \
        == "LINESTRING (0 0, 1 1, 2 0)"
    assert sql1(spark,
                "ST_LineFromMultiPoint(ST_Point(1D, 2D))") is None
    # ZMax/ZMin: Z on points; 2-D inputs → null (Sedona semantics)
    assert sql1(spark, "ST_ZMax(ST_PointZ(1D, 2D, 3D))") == 3.0
    assert sql1(spark, "ST_ZMin(ST_PointZ(1D, 2D, -4.5D))") == -4.5
    assert sql1(spark, "ST_ZMax(ST_GeomFromText("
                       "'LINESTRING (0 0, 1 1)'))") is None


def test_transform_nztm_and_mga(spark):
    # NZTM origin -> (FE, FN); Wellington lands at the known grid value
    x = sql1(spark, "ST_X(ST_Transform(ST_Point(173D, 0D), "
                    "'EPSG:4326', 'EPSG:2193'))")
    y = sql1(spark, "ST_Y(ST_Transform(ST_Point(173D, 0D), "
                    "'EPSG:4326', 'EPSG:2193'))")
    assert x == pytest.approx(1600000.0, abs=1e-6)
    assert y == pytest.approx(10000000.0, abs=1e-6)
    e = sql1(spark, "ST_X(ST_Transform(ST_Point(174.7762D, -41.2865D), "
                    "'EPSG:4326', 'EPSG:2193'))")
    n = sql1(spark, "ST_Y(ST_Transform(ST_Point(174.7762D, -41.2865D), "
                    "'EPSG:4326', 'EPSG:2193'))")
    assert e == pytest.approx(1748735.6, abs=1.0)
    assert n == pytest.approx(5427916.5, abs=1.0)
    # GDA94 MGA zone 55 == UTM 55S grid
    xa = sql1(spark, "ST_X(ST_Transform(ST_Point(147D, -37D), "
                     "'EPSG:4326', 'EPSG:28355'))")
    xb = sql1(spark, "ST_X(ST_Transform(ST_Point(147D, -37D), "
                     "'EPSG:4326', 'EPSG:32755'))")
    assert xa == xb
    for code, lon, lat in (("2193", 172.6, -43.5), ("28350", 116.9, -32.0)):
        for fn_, want in (("ST_X", lon), ("ST_Y", lat)):
            back = sql1(spark, f"{fn_}(ST_Transform(ST_Transform("
                               f"ST_Point({lon}D, {lat}D), 'EPSG:4326', "
                               f"'EPSG:{code}'), 'EPSG:{code}', 'EPSG:4326'))")
            assert back == pytest.approx(want, abs=1e-8), code


def test_transform_swiss_oblique_mercator(spark):
    """CH1903+/LV95 (2056) and CH1903/LV03 (21781): the projection center
    maps exactly to the false origin, and swisstopo's official 'Rigi' test
    point reproduces to the centimeter (coordinates in the CRS's own
    Bessel datum, like every grid-less projection library)."""
    lat = 47 + 3 / 60 + 28.95659233 / 3600
    lon = 8 + 29 / 60 + 11.11127154 / 3600
    e = sql1(spark, f"ST_X(ST_Transform(ST_Point({lon!r}D, {lat!r}D), "
                    "'EPSG:4326', 'EPSG:21781'))")
    n = sql1(spark, f"ST_Y(ST_Transform(ST_Point({lon!r}D, {lat!r}D), "
                    "'EPSG:4326', 'EPSG:21781'))")
    assert e == pytest.approx(679520.05, abs=0.01)
    assert n == pytest.approx(212273.44, abs=0.01)
    e95 = sql1(spark, f"ST_X(ST_Transform(ST_Point({lon!r}D, {lat!r}D), "
                      "'EPSG:4326', 'EPSG:2056'))")
    assert e95 == pytest.approx(2679520.05, abs=0.01)
    for code, lo, la in (("2056", 6.6, 46.5), ("21781", 9.8, 46.5)):
        for fn_, want in (("ST_X", lo), ("ST_Y", la)):
            back = sql1(spark, f"{fn_}(ST_Transform(ST_Transform("
                               f"ST_Point({lo}D, {la}D), 'EPSG:4326', "
                               f"'EPSG:{code}'), 'EPSG:{code}', 'EPSG:4326'))")
            assert back == pytest.approx(want, abs=1e-8), code


def test_transform_rd_new(spark):
    """Amersfoort / RD New (28992, double stereographic on Bessel):
    reproduces the EPSG Guidance Note 7-2 worked example (53N 6E ->
    196105.283, 557057.739) to the millimeter."""
    e = sql1(spark, "ST_X(ST_Transform(ST_Point(6D, 53D), "
                    "'EPSG:4326', 'EPSG:28992'))")
    n = sql1(spark, "ST_Y(ST_Transform(ST_Point(6D, 53D), "
                    "'EPSG:4326', 'EPSG:28992'))")
    assert e == pytest.approx(196105.283, abs=1e-3)
    assert n == pytest.approx(557057.739, abs=1e-3)
    for fn_, want in (("ST_X", 4.9), ("ST_Y", 52.37)):
        back = sql1(spark, f"{fn_}(ST_Transform(ST_Transform("
                           f"ST_Point(4.9D, 52.37D), 'EPSG:4326', "
                           f"'EPSG:28992'), 'EPSG:28992', 'EPSG:4326'))")
        assert back == pytest.approx(want, abs=1e-8)


# ---------------------------------------------------------------------------
# round-5 tier-2: affine transforms, dumps, proximity, bounding circle
# ---------------------------------------------------------------------------

def test_affine_transforms(spark):
    assert sql1(spark, "ST_AsText(ST_Translate(ST_Point(1, 2), 10, 20))") \
        == "POINT (11 22)"
    assert sql1(spark, "ST_AsText(ST_Scale("
                       "ST_GeomFromText('LINESTRING(1 1, 2 2)'), 2, 3))") \
        == "LINESTRING (2 3, 4 6)"
    x = sql1(spark, "ST_X(ST_Rotate(ST_Point(1, 0), pi()))")
    y = sql1(spark, "ST_Y(ST_Rotate(ST_Point(0, 1), pi() / 2))")
    assert x == pytest.approx(-1.0) and y == pytest.approx(0.0, abs=1e-12)
    # polygon ring survives the mapping
    t = sql1(spark, "ST_AsText(ST_Translate("
                    "ST_GeomFromText('POLYGON((0 0,1 0,1 1,0 1,0 0))'), 5, 5))")
    assert t == "POLYGON ((5 5, 6 5, 6 6, 5 6, 5 5))"


def test_closest_point_and_shortest_line(spark):
    poly = "ST_GeomFromText('POLYGON((0 0,2 0,2 2,0 2,0 0))')"
    assert sql1(spark, f"ST_AsText(ST_ClosestPoint({poly}, ST_Point(5, 1)))") \
        == "POINT (2 1)"
    assert sql1(spark, f"ST_AsText(ST_ShortestLine(ST_Point(5, 1), {poly}))") \
        == "LINESTRING (5 1, 2 1)"
    # length of the shortest line equals ST_Distance
    d = sql1(spark, f"ST_Length(ST_ShortestLine(ST_Point(5, 1), {poly}))"
                    f" - ST_Distance(ST_Point(5, 1), {poly})")
    assert d == pytest.approx(0.0, abs=1e-12)
    # intersecting inputs -> coincident pair, distance 0
    L = sql1(spark, f"ST_Length(ST_ShortestLine({poly}, "
                    "ST_GeomFromText('POLYGON((1 1,3 1,3 3,1 3,1 1))')))")
    assert L == pytest.approx(0.0, abs=1e-12)


def test_minimum_bounding_circle_and_radius(spark):
    r = sql1(spark, "ST_MinimumBoundingRadius("
                    "ST_GeomFromText('LINESTRING(0 0, 10 0)')).radius")
    assert r == pytest.approx(5.0)
    cx = sql1(spark, "ST_X(ST_MinimumBoundingRadius("
                     "ST_GeomFromText('POLYGON((0 0,2 0,2 2,0 2,0 0))')).center)")
    assert cx == pytest.approx(1.0)
    # the circle polygon contains interior points (support vertices sit ON
    # the circle, so the inscribed 48-gon rightly excludes them by epsilon)
    inside = sql1(spark, "ST_Contains(ST_MinimumBoundingCircle("
                         "ST_GeomFromText('MULTIPOINT((0 0),(4 0),(2 3))')), "
                         "ST_Point(2, 1))")
    assert inside is True or inside == 1
    # 3-point MEC of an obtuse triangle = diameter circle of the long side
    r3 = sql1(spark, "ST_MinimumBoundingRadius("
                     "ST_GeomFromText('MULTIPOINT((0 0),(10 0),(5 1))')).radius")
    assert r3 == pytest.approx(5.0)


def test_dump_and_multi_and_force2d(spark):
    n = sql1(spark, "size(ST_Dump(ST_GeomFromText("
                    "'GEOMETRYCOLLECTION(POINT(1 1), MULTIPOINT((2 2),(3 3)))')))")
    assert n == 3
    first = sql1(spark, "ST_AsText(ST_Dump(ST_GeomFromText("
                        "'MULTIPOLYGON(((0 0,1 0,1 1,0 0)),((5 5,6 5,6 6,5 5)))'))[0])")
    assert first == "POLYGON ((0 0, 1 0, 1 1, 0 0))"
    np_ = sql1(spark, "size(ST_DumpPoints(ST_GeomFromText("
                      "'LINESTRING(0 0,1 1,2 2)')))")
    assert np_ == 3
    assert sql1(spark, "ST_AsText(ST_Multi(ST_GeomFromText("
                       "'LINESTRING(0 0,1 1)')))") \
        == "MULTILINESTRING ((0 0, 1 1))"
    # already-multi passes through
    assert sql1(spark, "ST_AsText(ST_Multi(ST_GeomFromText("
                       "'MULTIPOINT((1 1))')))") == "MULTIPOINT ((1 1))"
    assert sql1(spark, "ST_Z(ST_Force_2D(ST_PointZ(1, 2, 3)))") is None


def test_angle_three_points(spark):
    a = sql1(spark, "ST_Angle(ST_Point(1, 0), ST_Point(0, 0), ST_Point(0, 1))")
    assert a == pytest.approx(3.14159265 / 2, abs=1e-6)
    # collinear opposite rays -> pi
    b = sql1(spark, "ST_Angle(ST_Point(-1, 0), ST_Point(0, 0), ST_Point(1, 0))")
    assert b == pytest.approx(3.14159265, abs=1e-6)


def test_mec_property_random_points(spark):
    """Property: every vertex is inside the MEC, and the radius is minimal
    against the pairwise-diameter lower bound."""
    import itertools
    import math as m
    import random
    rng = random.Random(11)
    for _ in range(10):
        pts = [(rng.uniform(-50, 50), rng.uniform(-50, 50))
               for _ in range(rng.randint(2, 12))]
        from sedona_iceberg_extension_spark.geom import algos as A
        from sedona_iceberg_extension_spark.geom.model import Geometry
        g = Geometry(4, pts)  # MULTIPOINT
        (cx, cy), r = A.min_bounding_radius(g)
        assert all(m.hypot(x - cx, y - cy) <= r + 1e-9 for x, y in pts)
        lower = max(m.hypot(a[0] - b[0], a[1] - b[1])
                    for a, b in itertools.combinations(pts, 2)) / 2
        assert r >= lower - 1e-9
        # upper: MEC radius never exceeds the circumradius bound of the
        # farthest pair by more than the triangle geometry allows
        assert r <= lower * 2 / m.sqrt(3) + 1e-9


def test_longest_line_and_max_distance(spark):
    poly = "ST_GeomFromText('POLYGON((0 0,2 0,2 2,0 2,0 0))')"
    assert sql1(spark, f"ST_AsText(ST_LongestLine({poly}, ST_Point(5, 1)))") \
        == "LINESTRING (0 0, 5 1)"
    md = sql1(spark, "ST_MaxDistance(ST_GeomFromText('LINESTRING(0 0,10 0)'),"
                     " ST_Point(0, 5))")
    assert md == pytest.approx((10**2 + 5**2) ** 0.5)
    # max >= min distance always
    d = sql1(spark, f"ST_MaxDistance({poly}, ST_Point(5, 1))"
                    f" - ST_Distance({poly}, ST_Point(5, 1))")
    assert d > 0


def test_line_locate_project_affine(spark):
    assert sql1(spark, "ST_LineLocatePoint(ST_GeomFromText("
                       "'LINESTRING(0 0,10 0)'), ST_Point(2.5, 3))") \
        == pytest.approx(0.25)
    assert sql1(spark, "ST_AsText(ST_Affine(ST_Point(1, 2), 2,0,0,2, 10,20))") \
        == "POINT (12 24)"
    x = sql1(spark, "ST_X(ST_Project(ST_Point(0, 0), 10, pi() / 2))")
    y = sql1(spark, "ST_Y(ST_Project(ST_Point(0, 0), 10, 0))")
    assert x == pytest.approx(10.0) and y == pytest.approx(10.0)
    # locate+interpolate round-trip
    loc = sql1(spark, "ST_AsText(ST_LineInterpolatePoint(ST_GeomFromText("
                      "'LINESTRING(0 0,10 0)'), ST_LineLocatePoint("
                      "ST_GeomFromText('LINESTRING(0 0,10 0)'), "
                      "ST_Point(7, 4))))")
    assert loc == "POINT (7 0)"


def test_collection_extract_and_perimeter(spark):
    gc = ("ST_GeomFromText('GEOMETRYCOLLECTION(POINT(1 1), "
          "LINESTRING(0 0,1 1), POLYGON((0 0,1 0,1 1,0 0)))')")
    assert sql1(spark, f"ST_AsText(ST_CollectionExtract({gc}, 1))") \
        == "MULTIPOINT ((1 1))"
    assert sql1(spark, f"ST_AsText(ST_CollectionExtract({gc}, 3))") \
        == "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)))"
    assert sql1(spark, "ST_Perimeter(ST_GeomFromText("
                       "'POLYGON((0 0,3 0,3 4,0 0))'))") == pytest.approx(12.0)
    assert sql1(spark, "ST_Perimeter(ST_Point(1, 1))") == 0.0


def test_segmentize(spark):
    assert sql1(spark, "ST_AsText(ST_Segmentize(ST_GeomFromText("
                       "'LINESTRING(0 0, 4 0)'), 2))") \
        == "LINESTRING (0 0, 2 0, 4 0)"
    # no segment exceeds max_len; length preserved
    n = sql1(spark, "ST_NPoints(ST_Segmentize(ST_GeomFromText("
                    "'LINESTRING(0 0, 10 0)'), 3))")
    assert n == 5
    L = sql1(spark, "ST_Length(ST_Segmentize(ST_GeomFromText("
                    "'POLYGON((0 0,9 0,9 9,0 9,0 0))'), 2.5))"
                    " - ST_Length(ST_GeomFromText("
                    "'POLYGON((0 0,9 0,9 9,0 9,0 0))'))")
    assert abs(L) < 1e-9
    # points pass through
    assert sql1(spark, "ST_AsText(ST_Segmentize(ST_Point(1, 2), 1))") \
        == "POINT (1 2)"


def test_point_on_surface_and_is_collection(spark):
    # centroid of a donut falls in the hole; result must still be ON it
    donut = ("ST_GeomFromText('POLYGON((0 0,10 0,10 10,0 10,0 0),"
             "(2 2,8 2,8 8,2 8,2 2))')")
    inside = sql1(spark, f"ST_Contains({donut}, ST_PointOnSurface({donut}))")
    assert inside is True or inside == 1
    assert sql1(spark, "ST_AsText(ST_PointOnSurface(ST_GeomFromText("
                       "'POLYGON((0 0,4 0,4 4,0 4,0 0))')))") == "POINT (2 2)"
    assert sql1(spark, "ST_AsText(ST_PointOnSurface("
                       "ST_GeomFromText('LINESTRING(0 0, 2 0)')))") \
        == "POINT (1 0)"
    assert sql1(spark, "ST_IsCollection(ST_GeomFromText("
                       "'GEOMETRYCOLLECTION(POINT(1 1))'))") in (True, 1)
    assert sql1(spark, "ST_IsCollection(ST_Point(1, 1))") in (False, 0)


def test_ndims_removerepeated_setpoint(spark):
    assert sql1(spark, "ST_NDims(ST_PointZ(1, 2, 3))") == 3
    assert sql1(spark, "ST_NDims(ST_Point(1, 2))") == 2
    assert sql1(spark, "ST_AsText(ST_RemoveRepeatedPoints(ST_GeomFromText("
                       "'LINESTRING(0 0,0 0,1 1,1 1,2 2)')))") \
        == "LINESTRING (0 0, 1 1, 2 2)"
    assert sql1(spark, "ST_AsText(ST_SetPoint(ST_GeomFromText("
                       "'LINESTRING(0 0,1 1,2 2)'), 1, ST_Point(9, 9)))") \
        == "LINESTRING (0 0, 9 9, 2 2)"
    assert sql1(spark, "ST_AsText(ST_SetPoint(ST_GeomFromText("
                       "'LINESTRING(0 0,1 1,2 2)'), -1, ST_Point(5, 5)))") \
        == "LINESTRING (0 0, 1 1, 5 5)"
    # out-of-range index -> NULL
    assert sql1(spark, "ST_SetPoint(ST_GeomFromText("
                       "'LINESTRING(0 0,1 1)'), 7, ST_Point(5, 5))") is None


def test_oblique_stereographic(spark):
    """Oblique/equatorial +proj=stere (Snyder single stereographic via
    conformal latitude) — center lands on the false origin, round trips
    close to machine precision, and the local scale at the center is k0."""
    import math

    from sedona_iceberg_extension_spark.functions.udfs_ext import _parse_proj4

    fwd, inv = _parse_proj4("+proj=stere +lat_0=52 +lon_0=5 +k=0.9999 "
                            "+x_0=155000 +y_0=463000 +ellps=WGS84")
    x0, y0 = fwd(5.0, 52.0)
    assert x0 == pytest.approx(155000.0, abs=1e-6)
    assert y0 == pytest.approx(463000.0, abs=1e-6)
    x, y = fwd(6.2, 53.1)
    lon, lat = inv(x, y)
    assert lon == pytest.approx(6.2, abs=1e-10)
    assert lat == pytest.approx(53.1, abs=1e-10)
    # meridional scale at the center equals k0
    e2 = 0.00669437999014
    a_m = 6378137.0 * (1 - e2) / (1 - e2 * math.sin(math.radians(52)) ** 2) ** 1.5
    x1, y1 = fwd(5.0, 52.0001)
    k = math.hypot(x1 - x0, y1 - y0) / (a_m * math.radians(0.0001))
    assert k == pytest.approx(0.9999, abs=1e-6)
    # equatorial aspect
    f2, i2 = _parse_proj4("+proj=stere +lat_0=0 +lon_0=-30 +k=1 +ellps=GRS80")
    lon, lat = i2(*f2(-25.0, 10.0))
    assert lon == pytest.approx(-25.0, abs=1e-10)
    assert lat == pytest.approx(10.0, abs=1e-10)
    # SQL surface: transform + back through the oblique CRS
    back = sql1(spark, "ST_Y(ST_Transform(ST_Transform("
                       "ST_Point(6.2D, 53.1D), 'EPSG:4326', "
                       "'+proj=stere +lat_0=52 +lon_0=5 +k=0.9999 "
                       "+x_0=155000 +y_0=463000 +ellps=WGS84'), "
                       "'+proj=stere +lat_0=52 +lon_0=5 +k=0.9999 "
                       "+x_0=155000 +y_0=463000 +ellps=WGS84', "
                       "'EPSG:4326'))")
    assert back == pytest.approx(53.1, abs=1e-9)


def test_spherical_projection_families(spark):
    """eqc / sinu (+R sphere — the MODIS land grid) / moll / mill:
    closed-form spherical identities and machine-precision round trips."""
    import math

    from sedona_iceberg_extension_spark.functions.udfs_ext import _parse_proj4

    # MODIS sinusoidal: x = R lam cos(phi), y = R phi, exactly
    f, i = _parse_proj4("+proj=sinu +R=6371007.181")
    x, y = f(100.0, 40.0)
    assert x == 6371007.181 * math.radians(100) * math.cos(math.radians(40))
    assert y == 6371007.181 * math.radians(40)
    lon, lat = i(x, y)
    assert lon == pytest.approx(100.0, abs=1e-12)
    assert lat == pytest.approx(40.0, abs=1e-12)
    # plate carree: x = a lam
    f2, i2 = _parse_proj4("+proj=eqc +ellps=WGS84")
    assert f2(90.0, 45.0)[0] == 6378137.0 * math.pi / 2
    l, p = i2(*f2(13.0, -22.0))
    assert l == pytest.approx(13.0, abs=1e-12)
    assert p == pytest.approx(-22.0, abs=1e-12)
    # mollweide: equator/pole identities + round trip (incl. near-pole)
    f3, i3 = _parse_proj4("+proj=moll +ellps=WGS84")
    assert f3(0.0, 0.0) == (0.0, 0.0)
    assert f3(0.0, 90.0)[1] == pytest.approx(math.sqrt(2) * 6378137.0,
                                             rel=1e-12)
    for lon0, lat0 in ((-70.0, 33.3), (120.0, -80.0), (10.0, 89.5)):
        l, p = i3(*f3(lon0, lat0))
        assert l == pytest.approx(lon0, abs=1e-8)
        assert p == pytest.approx(lat0, abs=1e-8)
    # miller round trip at high latitude
    f4, i4 = _parse_proj4("+proj=mill +ellps=WGS84")
    l, p = i4(*f4(12.0, 75.0))
    assert l == pytest.approx(12.0, abs=1e-12)
    assert p == pytest.approx(75.0, abs=1e-9)
    # SQL surface through the sinusoidal grid
    back = sql1(spark, "ST_Y(ST_Transform(ST_Transform("
                       "ST_Point(100D, 40D), 'EPSG:4326', "
                       "'+proj=sinu +R=6371007.181'), "
                       "'+proj=sinu +R=6371007.181', 'EPSG:4326'))")
    assert back == pytest.approx(40.0, abs=1e-10)


def test_round7_tier2_batch(spark):
    """ST_GeometricMedian / BoundingDiagonal / ShiftLongitude /
    Hausdorff / Frechet / SimplifyVW / UnaryUnion / Polygonize /
    LengthSpheroid / BestSRID — hand-verified values."""
    # Fermat point of the isoceles triangle (0,0),(10,0),(5,100) is
    # (5, 5/sqrt(3)) — all three 120-degree angles meet there
    out = sql1(spark, "ST_AsText(ST_GeometricMedian(ST_GeomFromText("
                      "'MULTIPOINT((0 0),(10 0),(5 100))')))")
    x, y = map(float, out[len("POINT ("):-1].split())
    assert x == pytest.approx(5.0, abs=1e-9)
    assert y == pytest.approx(5.0 / math.sqrt(3.0), abs=1e-6)
    assert sql1(spark, "ST_AsText(ST_BoundingDiagonal(ST_GeomFromText("
                       "'POLYGON((1 2,5 2,5 8,1 8,1 2))')))") \
        == "LINESTRING (1 2, 5 8)"
    assert sql1(spark, "ST_AsText(ST_ShiftLongitude("
                       "ST_Point(-170.0D, 10.0D)))") == "POINT (190 10)"
    assert sql1(spark, "ST_HausdorffDistance("
                       "ST_GeomFromText('LINESTRING(0 0,10 0)'), "
                       "ST_GeomFromText('LINESTRING(0 3,10 3)'))") == 3.0
    # Frechet is ORDER-sensitive: same line reversed jumps to hypot(10,1)
    fwd = sql1(spark, "ST_FrechetDistance("
                      "ST_GeomFromText('LINESTRING(0 0,10 0)'), "
                      "ST_GeomFromText('LINESTRING(0 1,10 1)'))")
    rev = sql1(spark, "ST_FrechetDistance("
                      "ST_GeomFromText('LINESTRING(0 0,10 0)'), "
                      "ST_GeomFromText('LINESTRING(10 1,0 1)'))")
    assert fwd == 1.0 and rev == pytest.approx(math.hypot(10, 1))
    # VW drops the small-area bump but keeps the big bend
    assert sql1(spark, "ST_AsText(ST_SimplifyVW(ST_GeomFromText("
                       "'LINESTRING(0 0,5 0.1,10 0,15 20)'), 5.0))") \
        == "LINESTRING (0 0, 10 0, 15 20)"
    # overlapping members dissolve into one polygon
    uu = sql1(spark, "ST_AsText(ST_UnaryUnion(ST_GeomFromText("
                     "'MULTIPOLYGON(((0 0,4 0,4 4,0 4,0 0)),"
                     "((2 2,6 2,6 6,2 6,2 2)))')))")
    assert uu.startswith("POLYGON")
    area = sql1(spark, "ST_Area(ST_UnaryUnion(ST_GeomFromText("
                       "'MULTIPOLYGON(((0 0,4 0,4 4,0 4,0 0)),"
                       "((2 2,6 2,6 6,2 6,2 2)))')))")
    assert area == pytest.approx(28.0)      # 16 + 16 - 4 overlap
    assert sql1(spark, "ST_AsText(ST_Polygonize(ST_GeomFromText("
                       "'MULTILINESTRING((0 0,1 0),(1 0,1 1),"
                       "(1 1,0 1),(0 1,0 0))')))") \
        == "GEOMETRYCOLLECTION (POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0)))"
    # one degree of longitude on the equator: the canonical 111.32 km
    d = sql1(spark, "ST_LengthSpheroid(ST_GeomFromText("
                    "'LINESTRING(0 0,1 0)'))")
    assert d == pytest.approx(111319.49, abs=1.0)
    # UTM zone picks, incl. southern hemisphere and UPS North
    assert sql1(spark, "ST_BestSRID(ST_Point(15.0D, 60.0D))") == 32633
    assert sql1(spark, "ST_BestSRID(ST_Point(151.2D, -33.8D))") == 32756
    assert sql1(spark, "ST_BestSRID(ST_Point(0.0D, 89.0D))") == 32661
