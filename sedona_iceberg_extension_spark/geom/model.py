"""Geometry object model for the PySpark-native spatial engine.

The reference engine represents geometries as JTS objects on the JVM with a
WKB at-rest form (see reference ``GeometrySerializer.scala:24-47`` — "SerDe
using the WKB reader and writer objects").  This module is the Python-side
equivalent: a tiny immutable geometry model whose canonical serialized form
is ISO WKB.  No third-party geometry library is used (the build environment
has neither Shapely nor GEOS); everything is implemented from public
computational-geometry knowledge.

Supported kinds (the set the reference exercises, cf.
``UDAF/AggregateFunctions.scala:20-33`` and ``test.csv:2-11``):
POINT, LINESTRING, POLYGON (with holes), MULTIPOINT, MULTILINESTRING,
MULTIPOLYGON, GEOMETRYCOLLECTION — plus EMPTY variants of each.
"""

from __future__ import annotations

import math
from typing import Iterator, List, Optional, Sequence, Tuple

Coord = Tuple[float, float]
Ring = List[Coord]

# WKB geometry type codes (ISO/OGC)
WKB_POINT = 1
WKB_LINESTRING = 2
WKB_POLYGON = 3
WKB_MULTIPOINT = 4
WKB_MULTILINESTRING = 5
WKB_MULTIPOLYGON = 6
WKB_GEOMETRYCOLLECTION = 7

TYPE_NAMES = {
    WKB_POINT: "Point",
    WKB_LINESTRING: "LineString",
    WKB_POLYGON: "Polygon",
    WKB_MULTIPOINT: "MultiPoint",
    WKB_MULTILINESTRING: "MultiLineString",
    WKB_MULTIPOLYGON: "MultiPolygon",
    WKB_GEOMETRYCOLLECTION: "GeometryCollection",
}

WKT_NAMES = {
    WKB_POINT: "POINT",
    WKB_LINESTRING: "LINESTRING",
    WKB_POLYGON: "POLYGON",
    WKB_MULTIPOINT: "MULTIPOINT",
    WKB_MULTILINESTRING: "MULTILINESTRING",
    WKB_MULTIPOLYGON: "MULTIPOLYGON",
    WKB_GEOMETRYCOLLECTION: "GEOMETRYCOLLECTION",
}


class Geometry:
    """Immutable geometry.

    ``kind``  — one of the WKB_* codes.
    ``coords`` — kind-dependent payload:
        POINT              -> Optional[Coord] (None == EMPTY)
        LINESTRING         -> Ring (list of coords; [] == EMPTY)
        POLYGON            -> List[Ring] (first exterior, rest holes; [] == EMPTY)
        MULTIPOINT         -> List[Optional[Coord]]
        MULTILINESTRING    -> List[Ring]
        MULTIPOLYGON       -> List[List[Ring]]
        GEOMETRYCOLLECTION -> List[Geometry]
    ``srid`` — spatial reference id (0 == unset), carried but not interpreted.
    """

    __slots__ = ("kind", "coords", "srid", "z")

    def __init__(self, kind: int, coords, srid: int = 0, z: Optional[float] = None):
        self.kind = kind
        self.coords = coords
        self.srid = srid
        # minimal 3-D support: a single Z ordinate carried for POINT kind only
        # (covers Sedona's ST_PointZ / ST_Z / ST_3DDistance surface; all 2-D
        # algorithms ignore it)
        self.z = z

    # ---- constructors -------------------------------------------------
    @staticmethod
    def point(x: float, y: float, srid: int = 0) -> "Geometry":
        return Geometry(WKB_POINT, (float(x), float(y)), srid)

    @staticmethod
    def empty(kind: int = WKB_GEOMETRYCOLLECTION, srid: int = 0) -> "Geometry":
        if kind == WKB_POINT:
            return Geometry(WKB_POINT, None, srid)
        return Geometry(kind, [], srid)

    @staticmethod
    def linestring(coords: Sequence[Coord], srid: int = 0) -> "Geometry":
        return Geometry(WKB_LINESTRING, [(float(x), float(y)) for x, y in coords], srid)

    @staticmethod
    def polygon(rings: Sequence[Sequence[Coord]], srid: int = 0) -> "Geometry":
        return Geometry(
            WKB_POLYGON,
            [[(float(x), float(y)) for x, y in ring] for ring in rings],
            srid,
        )

    @staticmethod
    def box(xmin: float, ymin: float, xmax: float, ymax: float, srid: int = 0) -> "Geometry":
        """Axis-aligned rectangle, CCW shell, closed ring.

        Matches Sedona's ``ST_PolygonFromEnvelope`` vertex order
        (minx miny, minx maxy, maxx maxy, maxx miny, minx miny).
        """
        return Geometry(
            WKB_POLYGON,
            [[(xmin, ymin), (xmin, ymax), (xmax, ymax), (xmax, ymin), (xmin, ymin)]],
            srid,
        )

    @staticmethod
    def multipoint(coords: Sequence[Coord], srid: int = 0) -> "Geometry":
        return Geometry(WKB_MULTIPOINT, [(float(x), float(y)) for x, y in coords], srid)

    @staticmethod
    def collection(geoms: Sequence["Geometry"], srid: int = 0) -> "Geometry":
        return Geometry(WKB_GEOMETRYCOLLECTION, list(geoms), srid)

    # ---- basic properties --------------------------------------------
    @property
    def type_name(self) -> str:
        return TYPE_NAMES[self.kind]

    def is_empty(self) -> bool:
        if self.kind == WKB_POINT:
            return self.coords is None
        if self.kind == WKB_GEOMETRYCOLLECTION:
            return all(g.is_empty() for g in self.coords) if self.coords else True
        return len(self.coords) == 0

    def dimension(self) -> int:
        """Topological dimension: 0 points, 1 lines, 2 polygons; collection = max."""
        if self.kind in (WKB_POINT, WKB_MULTIPOINT):
            return 0
        if self.kind in (WKB_LINESTRING, WKB_MULTILINESTRING):
            return 1
        if self.kind in (WKB_POLYGON, WKB_MULTIPOLYGON):
            return 2
        dims = [g.dimension() for g in self.coords if not g.is_empty()]
        return max(dims) if dims else 0

    def num_geometries(self) -> int:
        if self.kind in (WKB_MULTIPOINT, WKB_MULTILINESTRING, WKB_MULTIPOLYGON,
                         WKB_GEOMETRYCOLLECTION):
            return len(self.coords)
        return 0 if self.is_empty() else 1

    def geometry_n(self, n: int) -> "Geometry":
        """0-based n-th component (Sedona's ST_GeometryN is 0-based)."""
        if self.kind == WKB_MULTIPOINT:
            return Geometry(WKB_POINT, self.coords[n], self.srid)
        if self.kind == WKB_MULTILINESTRING:
            return Geometry(WKB_LINESTRING, self.coords[n], self.srid)
        if self.kind == WKB_MULTIPOLYGON:
            return Geometry(WKB_POLYGON, self.coords[n], self.srid)
        if self.kind == WKB_GEOMETRYCOLLECTION:
            return self.coords[n]
        if n == 0:
            return self
        raise IndexError(n)

    def flatten(self) -> Iterator["Geometry"]:
        """Yield non-empty atomic (point/line/polygon) components."""
        if self.is_empty():
            return
        if self.kind in (WKB_POINT, WKB_LINESTRING, WKB_POLYGON):
            yield self
        elif self.kind in (WKB_MULTIPOINT, WKB_MULTILINESTRING, WKB_MULTIPOLYGON):
            atom = {WKB_MULTIPOINT: WKB_POINT, WKB_MULTILINESTRING: WKB_LINESTRING,
                    WKB_MULTIPOLYGON: WKB_POLYGON}[self.kind]
            for c in self.coords:
                g = Geometry(atom, c, self.srid)
                if not g.is_empty():
                    yield g
        else:
            for g in self.coords:
                yield from g.flatten()

    def all_coords(self) -> Iterator[Coord]:
        for g in self.flatten():
            if g.kind == WKB_POINT:
                yield g.coords
            elif g.kind == WKB_LINESTRING:
                yield from g.coords
            else:
                for ring in g.coords:
                    yield from ring

    def num_points(self) -> int:
        return sum(1 for _ in self.all_coords())

    # ---- envelope -----------------------------------------------------
    def envelope(self) -> Optional[Tuple[float, float, float, float]]:
        """(xmin, ymin, xmax, ymax), or None for EMPTY."""
        xmin = ymin = math.inf
        xmax = ymax = -math.inf
        found = False
        for x, y in self.all_coords():
            found = True
            if x < xmin: xmin = x
            if x > xmax: xmax = x
            if y < ymin: ymin = y
            if y > ymax: ymax = y
        return (xmin, ymin, xmax, ymax) if found else None

    # ---- equality (coordinate-exact, used for tests/dedup) -----------
    def __eq__(self, other) -> bool:
        if not isinstance(other, Geometry):
            return NotImplemented
        return self.kind == other.kind and self.coords == other.coords

    def __hash__(self):
        def freeze(c):
            if isinstance(c, list):
                return tuple(freeze(x) for x in c)
            if isinstance(c, Geometry):
                return (c.kind, freeze(c.coords))
            return c
        return hash((self.kind, freeze(self.coords)))

    def __repr__(self):
        from .io import to_wkt
        return f"<Geometry {to_wkt(self, max_coords=8)}>"
