from .windows import streaming_tumbling_hourly

__all__ = ["streaming_tumbling_hourly"]
