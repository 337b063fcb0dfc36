from peregrine_spark.streaming.windows import (
    session_agg_batch,
    session_agg_stream,
    sliding_agg,
    stream_from_parquet,
    tumbling_agg,
)

__all__ = [
    "tumbling_agg", "sliding_agg", "session_agg_batch",
    "session_agg_stream", "stream_from_parquet",
]
