from .tail import tail_available_now

__all__ = ["tail_available_now"]
