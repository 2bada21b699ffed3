from .ops import (dedup_within_watermark, event_type_rollup,  # noqa: F401
                  running_user_totals_stateful, sessionize,
                  stream_static_enrich, stream_stream_join,
                  windowed_event_counts)
from .sink import write_stream_to_snapshot  # noqa: F401
