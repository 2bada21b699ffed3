"""Pure-Python/NumPy geometry core (no Shapely/GEOS in this environment)."""

from .model import Geometry  # noqa: F401
from .io import from_wkb, from_wkt, to_wkb, to_wkt  # noqa: F401
