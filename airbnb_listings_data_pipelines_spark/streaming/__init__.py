from .events import event_stream, stream_to_memory, tumbling_aggregate

__all__ = ["event_stream", "stream_to_memory", "tumbling_aggregate"]
