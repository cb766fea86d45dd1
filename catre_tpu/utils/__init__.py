from . import checkpoint, events, profiler

__all__ = ["checkpoint", "events", "profiler"]
