from protosc_spark.streaming.stream import (
    read_transcript_stream,
    run_to_memory_sink,
    run_to_parquet_sink,
    stream_conversation_state,
    stream_session_counts,
    stream_turn_features,
)

__all__ = [
    "read_transcript_stream",
    "run_to_memory_sink",
    "run_to_parquet_sink",
    "stream_conversation_state",
    "stream_session_counts",
    "stream_turn_features",
]
