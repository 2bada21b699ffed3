from .spatial_join import spatial_join  # noqa: F401
from .sql_join import spatial_sql  # noqa: F401
from .knn import knn_join  # noqa: F401
from . import dml  # noqa: F401
from .asof import asof_join  # noqa: F401
