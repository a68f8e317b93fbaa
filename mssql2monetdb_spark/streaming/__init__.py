from .pipelines import (  # noqa: F401
    events_stream,
    sessionized_stream,
    stateful_dedup_stream,
    windowed_counts_stream,
)
