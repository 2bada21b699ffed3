"""PySpark-native analytics engine with the query surface of
spatialx-project/sedona-iceberg-extension (spatial SQL over lakehouse tables
with data skipping, spatial joins, spatial aggregation) plus LLM-data-pipeline
operators — built Spark-first on DataFrame/SQL/Catalyst.

Reference (read-only, public): /root/reference — see SURVEY.md for the
file:line capability inventory this engine re-creates.
"""

__version__ = "0.1.0"

from .session import get_session, register_all  # noqa: F401
