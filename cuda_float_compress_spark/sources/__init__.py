"""Sources & sinks: parquet-first table registry + an Iceberg gateway stub.

The testdata corpus (TESTDATA.md) is parquet; production targets an
Iceberg-style catalog — the Iceberg jars aren't in this container, so the
catalog path is gated behind an import/config try (same engine code either
way: Spark's DataSourceV2 makes `spark.read.table(...)` vs
`spark.read.parquet(...)` interchangeable downstream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TPCH_TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders", "lineitem",
    "events", "documents", "embeddings",
)


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str, tables=TPCH_TABLES) -> None:
    for t in tables:
        read_table(spark, sf_dir, t).createOrReplaceTempView(t)


def read_iceberg(spark: SparkSession, table: str) -> DataFrame:
    """Iceberg catalog read; falls back with a clear error when the runtime
    lacks the Iceberg Spark extensions (not bundled in this container)."""
    try:
        return spark.read.table(table)
    except Exception as e:  # pragma: no cover - container has no Iceberg jars
        raise NotImplementedError(
            "Iceberg catalog not configured in this runtime; add "
            "iceberg-spark-runtime to spark.jars.packages and a catalog conf. "
            f"Underlying error: {e}"
        ) from e


def write_blocks_sink(df: DataFrame, out_dir: str, fmt: str = "parquet") -> None:
    """Partitioned sink for encoded blocks; parquet locally, Iceberg in prod."""
    if fmt == "parquet":
        df.write.mode("append").parquet(f"{out_dir}/blocks")
    else:  # pragma: no cover
        df.writeTo(out_dir).append()
