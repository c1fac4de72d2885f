from cuda_float_compress_spark.streaming.jobs import (  # noqa: F401
    run_windowed_counts,
    sessionize_batch,
)
