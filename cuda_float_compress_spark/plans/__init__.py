from cuda_float_compress_spark.plans.partitioning import (  # noqa: F401
    host_expr,
    plan_partitions,
    skewed_hosts,
)
