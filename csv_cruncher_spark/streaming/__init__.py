from .dedup import dedup_change_stream
from .rollup import streaming_hourly_rollup
from .stateful import lww_state_changes
from .tailer import ChangeLogTailer

__all__ = [
    "ChangeLogTailer",
    "streaming_hourly_rollup",
    "lww_state_changes",
    "dedup_change_stream",
]
