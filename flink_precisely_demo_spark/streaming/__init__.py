from .stateful_join import enrich_stream
from .pipeline import streaming_flagship, run_to_memory

__all__ = ["enrich_stream", "streaming_flagship", "run_to_memory"]
