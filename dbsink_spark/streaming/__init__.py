from .pipeline import run_stream
from .stateful import session_aggregate, streaming_dedup, tumbling_aggregate

__all__ = ["run_stream", "streaming_dedup", "tumbling_aggregate", "session_aggregate"]
