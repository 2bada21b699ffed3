from .tables import (load_table, load_tables, normalize_nanos,  # noqa: F401
                     register_views, stream_table)
