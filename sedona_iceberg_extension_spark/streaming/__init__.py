from .ops import (event_type_rollup, running_user_totals_stateful,  # noqa: F401
                  sessionize, windowed_event_counts)
