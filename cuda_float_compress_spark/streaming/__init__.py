from cuda_float_compress_spark.streaming.jobs import (  # noqa: F401
    run_stateful_counts,
    run_windowed_counts,
    sessionize_batch,
)
