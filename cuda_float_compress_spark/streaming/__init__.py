from cuda_float_compress_spark.streaming.jobs import (  # noqa: F401
    encode_stream,
    merge_stream,
    run_session_windows,
    run_stateful_counts,
    run_streaming_dedup,
    run_streaming_minhash_dedup,
    run_streaming_minhash_dedup_verified,
    run_windowed_counts,
    sessionize_batch,
)
