from .events import (
    sessionize_batch,
    streaming_dedup_count,
    streaming_windowed_agg,
)

__all__ = [
    "sessionize_batch",
    "streaming_dedup_count",
    "streaming_windowed_agg",
]
