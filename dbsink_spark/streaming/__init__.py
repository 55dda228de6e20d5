from .pipeline import listen_transform, run_stream
from .rollup import RollupMaintainer
from .stateful import session_aggregate, streaming_dedup, tumbling_aggregate

__all__ = [
    "run_stream",
    "listen_transform",
    "streaming_dedup",
    "tumbling_aggregate",
    "session_aggregate",
    "RollupMaintainer",
]
