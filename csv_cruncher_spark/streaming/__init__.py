from .tailer import ChangeLogTailer
from .rollup import streaming_hourly_rollup

__all__ = ["ChangeLogTailer", "streaming_hourly_rollup"]
