"""WKT and WKB serialization.

WKB is the engine's at-rest / in-flight form (``BinaryType`` columns),
mirroring the reference's WKB serde contract (``GeometrySerializer.scala:24-47``).
Little-endian ISO WKB, 2-D only.  WKT formatting follows JTS ``WKTWriter``
conventions (``POINT (10 20)`` — space after tag, integral ordinates without
a trailing ``.0``) to match the reference's golden strings
(``TestSedonaIcebergExtension.scala:58-59,92``).
"""

from __future__ import annotations

import struct
from typing import List, Optional, Tuple

from .model import (
    Geometry,
    WKB_GEOMETRYCOLLECTION,
    WKB_LINESTRING,
    WKB_MULTILINESTRING,
    WKB_MULTIPOINT,
    WKB_MULTIPOLYGON,
    WKB_POINT,
    WKB_POLYGON,
    WKT_NAMES,
)

_NAN = float("nan")

# ---------------------------------------------------------------------------
# WKB
# ---------------------------------------------------------------------------

def to_wkb(geom: Optional[Geometry]) -> Optional[bytes]:
    if geom is None:
        return None
    out = bytearray()
    _write_wkb(geom, out)
    return bytes(out)


def _write_wkb(geom: Geometry, out: bytearray) -> None:
    out += b"\x01"  # little-endian
    k = geom.kind
    if k == WKB_POINT and geom.z is not None:
        out += struct.pack("<I", 1001)  # ISO WKB Point Z
        x, y = geom.coords if geom.coords is not None else (_NAN, _NAN)
        out += struct.pack("<ddd", x, y, geom.z)
        return
    out += struct.pack("<I", geom.kind)
    if k == WKB_POINT:
        if geom.coords is None:
            out += struct.pack("<dd", _NAN, _NAN)  # ISO convention for POINT EMPTY
        else:
            out += struct.pack("<dd", *geom.coords)
    elif k == WKB_LINESTRING:
        _write_ring(geom.coords, out)
    elif k == WKB_POLYGON:
        out += struct.pack("<I", len(geom.coords))
        for ring in geom.coords:
            _write_ring(ring, out)
    elif k == WKB_MULTIPOINT:
        out += struct.pack("<I", len(geom.coords))
        for c in geom.coords:
            _write_wkb(Geometry(WKB_POINT, c), out)
    elif k == WKB_MULTILINESTRING:
        out += struct.pack("<I", len(geom.coords))
        for line in geom.coords:
            _write_wkb(Geometry(WKB_LINESTRING, line), out)
    elif k == WKB_MULTIPOLYGON:
        out += struct.pack("<I", len(geom.coords))
        for poly in geom.coords:
            _write_wkb(Geometry(WKB_POLYGON, poly), out)
    elif k == WKB_GEOMETRYCOLLECTION:
        out += struct.pack("<I", len(geom.coords))
        for g in geom.coords:
            _write_wkb(g, out)
    else:
        raise ValueError(f"unsupported geometry kind {k}")


def _write_ring(ring, out: bytearray) -> None:
    out += struct.pack("<I", len(ring))
    for x, y in ring:
        out += struct.pack("<dd", x, y)


def from_wkb(buf: Optional[bytes]) -> Optional[Geometry]:
    if buf is None:
        return None
    geom, _ = _read_wkb(memoryview(buf), 0)
    return geom


def _read_wkb(buf: memoryview, pos: int) -> Tuple[Geometry, int]:
    byte_order = buf[pos]
    pos += 1
    fmt = "<" if byte_order == 1 else ">"
    (type_code,) = struct.unpack_from(fmt + "I", buf, pos)
    pos += 4
    srid = 0
    has_z = has_m = False
    base = type_code
    if type_code & 0x20000000:  # EWKB SRID flag
        base &= ~0x20000000
        (srid,) = struct.unpack_from(fmt + "I", buf, pos)
        pos += 4
    if type_code & 0x80000000:  # EWKB Z
        base &= 0x7FFFFFFF & ~0x80000000
        has_z = True
    if type_code & 0x40000000:  # EWKB M
        base &= ~0x40000000
        has_m = True
    # ISO 1000/2000/3000 offsets for Z/M/ZM
    iso_dim, base = divmod(base, 1000)
    if iso_dim in (1, 3):
        has_z = True
    if iso_dim in (2, 3):
        has_m = True
    extra = (1 if has_z else 0) + (1 if has_m else 0)

    def read_coord(p):
        x, y = struct.unpack_from(fmt + "dd", buf, p)
        return (x, y), p + 16 + 8 * extra

    k = base
    if k == WKB_POINT:
        z = None
        if has_z:
            (z,) = struct.unpack_from(fmt + "d", buf, pos + 16)
        (x, y), pos = read_coord(pos)
        coords = None if (x != x and y != y) else (x, y)  # NaN NaN == EMPTY
        return Geometry(WKB_POINT, coords, srid, z=z), pos
    if k == WKB_LINESTRING:
        (n,) = struct.unpack_from(fmt + "I", buf, pos)
        pos += 4
        line = []
        for _ in range(n):
            c, pos = read_coord(pos)
            line.append(c)
        return Geometry(WKB_LINESTRING, line, srid), pos
    if k == WKB_POLYGON:
        (nr,) = struct.unpack_from(fmt + "I", buf, pos)
        pos += 4
        rings = []
        for _ in range(nr):
            (n,) = struct.unpack_from(fmt + "I", buf, pos)
            pos += 4
            ring = []
            for _ in range(n):
                c, pos = read_coord(pos)
                ring.append(c)
            rings.append(ring)
        return Geometry(WKB_POLYGON, rings, srid), pos
    if k in (WKB_MULTIPOINT, WKB_MULTILINESTRING, WKB_MULTIPOLYGON, WKB_GEOMETRYCOLLECTION):
        (n,) = struct.unpack_from(fmt + "I", buf, pos)
        pos += 4
        parts = []
        for _ in range(n):
            g, pos = _read_wkb(buf, pos)
            parts.append(g)
        if k == WKB_MULTIPOINT:
            return Geometry(WKB_MULTIPOINT, [g.coords for g in parts], srid), pos
        if k == WKB_MULTILINESTRING:
            return Geometry(WKB_MULTILINESTRING, [g.coords for g in parts], srid), pos
        if k == WKB_MULTIPOLYGON:
            return Geometry(WKB_MULTIPOLYGON, [g.coords for g in parts], srid), pos
        return Geometry(WKB_GEOMETRYCOLLECTION, parts, srid), pos
    raise ValueError(f"unsupported WKB type code {type_code}")


# ---------------------------------------------------------------------------
# WKT
# ---------------------------------------------------------------------------

def _fmt_num(v: float) -> str:
    if v != v or v in (float("inf"), float("-inf")):
        return repr(v)
    if v == int(v) and abs(v) < 1e16:
        return str(int(v))
    return repr(v)


def _fmt_coord(c) -> str:
    return f"{_fmt_num(c[0])} {_fmt_num(c[1])}"


def to_wkt(geom: Optional[Geometry], max_coords: Optional[int] = None) -> Optional[str]:
    if geom is None:
        return None
    return _wkt_body(geom, max_coords)


def _wkt_body(geom: Geometry, max_coords=None) -> str:
    name = WKT_NAMES[geom.kind]
    if geom.is_empty():
        return f"{name} EMPTY"
    k = geom.kind
    if k == WKB_POINT:
        if geom.z is not None:
            return f"{name} Z ({_fmt_coord(geom.coords)} {_fmt_num(geom.z)})"
        return f"{name} ({_fmt_coord(geom.coords)})"
    if k == WKB_LINESTRING:
        return f"{name} ({_seq(geom.coords, max_coords)})"
    if k == WKB_POLYGON:
        rings = ", ".join(f"({_seq(r, max_coords)})" for r in geom.coords)
        return f"{name} ({rings})"
    if k == WKB_MULTIPOINT:
        # JTS style: MULTIPOINT ((10 40), (40 30))
        pts = ", ".join("EMPTY" if c is None else f"({_fmt_coord(c)})" for c in geom.coords)
        return f"{name} ({pts})"
    if k == WKB_MULTILINESTRING:
        lines = ", ".join(f"({_seq(l, max_coords)})" for l in geom.coords)
        return f"{name} ({lines})"
    if k == WKB_MULTIPOLYGON:
        polys = ", ".join(
            "(" + ", ".join(f"({_seq(r, max_coords)})" for r in poly) + ")"
            for poly in geom.coords
        )
        return f"{name} ({polys})"
    parts = ", ".join(_wkt_body(g, max_coords) for g in geom.coords)
    return f"{name} ({parts})"


def _seq(coords, max_coords=None) -> str:
    if max_coords is not None and len(coords) > max_coords:
        coords = coords[:max_coords]
        return ", ".join(_fmt_coord(c) for c in coords) + ", ..."
    return ", ".join(_fmt_coord(c) for c in coords)


# -- WKT parsing ------------------------------------------------------------

class _Tok:
    def __init__(self, text: str):
        self.text = text
        self.pos = 0

    def skip_ws(self):
        while self.pos < len(self.text) and self.text[self.pos] in " \t\n\r,":
            self.pos += 1

    def peek(self) -> str:
        self.skip_ws()
        return self.text[self.pos] if self.pos < len(self.text) else ""

    def expect(self, ch: str):
        self.skip_ws()
        if self.pos >= len(self.text) or self.text[self.pos] != ch:
            raise ValueError(f"WKT parse error at {self.pos}: expected {ch!r} in {self.text[:80]!r}")
        self.pos += 1

    def word(self) -> str:
        self.skip_ws()
        start = self.pos
        while self.pos < len(self.text) and (self.text[self.pos].isalnum() or self.text[self.pos] == "_"):
            self.pos += 1
        return self.text[start:self.pos].upper()

    def number(self) -> float:
        self.skip_ws()
        start = self.pos
        while self.pos < len(self.text) and self.text[self.pos] in "+-0123456789.eE":
            self.pos += 1
        if start == self.pos:
            raise ValueError(f"WKT parse error at {self.pos}: expected number")
        return float(self.text[start:self.pos])


_WKT_KINDS = {v: k for k, v in WKT_NAMES.items()}


def from_wkt(text: Optional[str]) -> Optional[Geometry]:
    if text is None:
        return None
    srid = 0
    s = text.strip()
    if s.upper().startswith("SRID="):  # EWKT prefix
        head, s = s.split(";", 1)
        srid = int(head[5:])
    tok = _Tok(s)
    geom = _parse_geom(tok)
    geom.srid = srid
    return geom


def _parse_geom(tok: _Tok) -> Geometry:
    name = tok.word()
    if name not in _WKT_KINDS:
        raise ValueError(f"unknown WKT geometry type {name!r}")
    kind = _WKT_KINDS[name]
    # optional Z/M/ZM marker
    save = tok.pos
    marker = tok.word()
    dims = 2
    has_z_marker = False
    if marker in ("Z", "M"):
        dims = 3
        has_z_marker = marker == "Z"
    elif marker == "ZM":
        dims = 4
        has_z_marker = True
    elif marker == "EMPTY":
        return Geometry.empty(kind)
    else:
        tok.pos = save
    save = tok.pos
    if tok.word() == "EMPTY":
        return Geometry.empty(kind)
    tok.pos = save

    def coord():
        x = tok.number()
        y = tok.number()
        for _ in range(dims - 2):
            # swallow Z/M ordinates if present (stored 2-D)
            if tok.peek() not in "),":
                tok.number()
        return (x, y)

    def coord_seq():
        tok.expect("(")
        seq = [coord()]
        while tok.peek() not in ")":
            seq.append(coord())
        tok.expect(")")
        return seq

    def ring_seq():
        tok.expect("(")
        rings = [coord_seq()]
        while tok.peek() == "(":
            rings.append(coord_seq())
        tok.expect(")")
        return rings

    if kind == WKB_POINT:
        tok.expect("(")
        x = tok.number()
        y = tok.number()
        z = None
        if dims >= 3 and tok.peek() != ")":
            extra_val = tok.number()
            if has_z_marker:
                z = extra_val
            if dims == 4 and tok.peek() != ")":
                tok.number()  # M ordinate, dropped
        tok.expect(")")
        return Geometry(WKB_POINT, (x, y), z=z)
    if kind == WKB_LINESTRING:
        return Geometry(WKB_LINESTRING, coord_seq())
    if kind == WKB_POLYGON:
        return Geometry(WKB_POLYGON, ring_seq())
    if kind == WKB_MULTIPOINT:
        tok.expect("(")
        pts: List = []
        while tok.peek() != ")":
            if tok.peek() == "(":
                tok.expect("(")
                pts.append(coord())
                tok.expect(")")
            else:
                save2 = tok.pos
                if tok.word() == "EMPTY":
                    pts.append(None)
                else:
                    tok.pos = save2
                    pts.append(coord())
        tok.expect(")")
        return Geometry(WKB_MULTIPOINT, pts)
    if kind == WKB_MULTILINESTRING:
        tok.expect("(")
        lines = [coord_seq()]
        while tok.peek() == "(":
            lines.append(coord_seq())
        tok.expect(")")
        return Geometry(WKB_MULTILINESTRING, lines)
    if kind == WKB_MULTIPOLYGON:
        tok.expect("(")
        polys = [ring_seq()]
        while tok.peek() == "(":
            polys.append(ring_seq())
        tok.expect(")")
        return Geometry(WKB_MULTIPOLYGON, polys)
    # GEOMETRYCOLLECTION
    tok.expect("(")
    geoms = [_parse_geom(tok)]
    while tok.peek() != ")":
        geoms.append(_parse_geom(tok))
    tok.expect(")")
    return Geometry(WKB_GEOMETRYCOLLECTION, geoms)
