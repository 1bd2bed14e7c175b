from .joins import streaming_purchase_attribution
from .stateful import (
    stateful_dedup_stream,
    stateful_sessionize_stream,
    watermarked_dedup_stream,
    watermarked_hourly_counts,
)
from .windows import streaming_tumbling_hourly

__all__ = [
    "stateful_dedup_stream",
    "stateful_sessionize_stream",
    "streaming_purchase_attribution",
    "streaming_tumbling_hourly",
    "watermarked_dedup_stream",
    "watermarked_hourly_counts",
]
