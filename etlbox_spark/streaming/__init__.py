from .tail import (
    stream_changes,
    stream_maintenance_changes,
    tail_available_now,
    tail_processing_time,
)

__all__ = [
    "stream_changes",
    "stream_maintenance_changes",
    "tail_available_now",
    "tail_processing_time",
]
