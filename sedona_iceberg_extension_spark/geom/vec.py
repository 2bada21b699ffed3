"""NumPy-vectorized fast paths for POINT columns.

Point WKB has a fixed 21-byte little-endian layout
(``01 01000000 <x f64> <y f64>``), so whole Arrow batches of point columns
can be encoded/decoded with numpy byte-views instead of per-row Python —
the engine's answer to the reference's "Kryo mandatory for geometry shuffle"
performance note (``README.md:29-32``): geometries stay WKB bytes end-to-end
and the hot point paths never touch per-row Python objects.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import pandas as pd

_POINT_HEADER = b"\x01\x01\x00\x00\x00"


def points_to_wkb(x: pd.Series, y: pd.Series) -> pd.Series:
    """Vectorized ST_Point: two float64 Series → Series of 21-byte WKB."""
    xv = np.asarray(x, dtype="<f8")
    yv = np.asarray(y, dtype="<f8")
    n = len(xv)
    buf = np.empty((n, 21), dtype=np.uint8)
    buf[:, 0:5] = np.frombuffer(_POINT_HEADER, dtype=np.uint8)
    buf[:, 5:13] = xv.view(np.uint8).reshape(n, 8)
    buf[:, 13:21] = yv.view(np.uint8).reshape(n, 8)
    raw = buf.tobytes()
    out = [raw[i * 21:(i + 1) * 21] for i in range(n)]
    mask = pd.isna(x) | pd.isna(y)
    if mask.any():
        out = [None if m else b for m, b in zip(mask.tolist(), out)]
    return pd.Series(out, dtype=object)


def wkb_to_points(wkb: pd.Series) -> Tuple[np.ndarray, np.ndarray]:
    """Decode a Series of WKB values into (x, y) float64 arrays.

    Fast path: all values are 21-byte point WKB → single byte-view decode.
    Fallback: per-row generic parse (non-point rows yield NaN).
    """
    vals = wkb.tolist()
    n = len(vals)
    xs = np.full(n, np.nan)
    ys = np.full(n, np.nan)
    fast_idx = []
    fast_bytes = bytearray()
    slow_idx = []
    for i, b in enumerate(vals):
        if b is None:
            continue
        if len(b) == 21 and b[:5] == _POINT_HEADER:
            fast_idx.append(i)
            fast_bytes += b
        else:
            slow_idx.append(i)
    if fast_idx:
        arr = np.frombuffer(bytes(fast_bytes), dtype=np.uint8).reshape(-1, 21)
        xs[fast_idx] = arr[:, 5:13].copy().view("<f8").ravel()
        ys[fast_idx] = arr[:, 13:21].copy().view("<f8").ravel()
    if slow_idx:
        from .io import from_wkb
        from .model import WKB_POINT
        for i in slow_idx:
            g = from_wkb(vals[i])
            if g is not None and g.kind == WKB_POINT and g.coords is not None:
                xs[i], ys[i] = g.coords
    return xs, ys


def envelopes_of_wkb(wkb: pd.Series) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(xmin, ymin, xmax, ymax) arrays for a WKB Series (points fast-pathed)."""
    vals = wkb.tolist()
    n = len(vals)
    xmin = np.full(n, np.nan)
    ymin = np.full(n, np.nan)
    xmax = np.full(n, np.nan)
    ymax = np.full(n, np.nan)
    from .io import from_wkb
    for i, b in enumerate(vals):
        if b is None:
            continue
        if len(b) == 21 and b[:5] == _POINT_HEADER:
            x = np.frombuffer(b, dtype="<f8", count=1, offset=5)[0]
            y = np.frombuffer(b, dtype="<f8", count=1, offset=13)[0]
            xmin[i] = xmax[i] = x
            ymin[i] = ymax[i] = y
            continue
        g = from_wkb(b)
        env = g.envelope() if g is not None else None
        if env is not None:
            xmin[i], ymin[i], xmax[i], ymax[i] = env
    return xmin, ymin, xmax, ymax
