from protosc_spark.streaming.stream import (
    read_transcript_stream,
    run_to_memory_sink,
    run_to_parquet_sink,
    stream_asof_join,
    stream_decay_features,
    stream_conversation_state,
    stream_exact_dedup,
    stream_session_counts,
    stream_turn_features,
    write_time_sliced_source,
)

__all__ = [
    "read_transcript_stream",
    "run_to_memory_sink",
    "run_to_parquet_sink",
    "stream_asof_join",
    "stream_decay_features",
    "stream_conversation_state",
    "stream_exact_dedup",
    "stream_session_counts",
    "stream_turn_features",
    "write_time_sliced_source",
]
