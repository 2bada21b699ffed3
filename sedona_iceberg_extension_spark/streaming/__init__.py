from .ops import (dedup_within_watermark, drain,  # noqa: F401
                  event_type_rollup, running_user_totals_stateful,
                  sessionize, stream_static_enrich, stream_stream_join,
                  windowed_event_counts)
from .sink import write_stream_to_snapshot  # noqa: F401
