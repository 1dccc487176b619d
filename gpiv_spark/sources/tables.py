"""Table source adapter: catalog tables (Iceberg) or parquet dirs.

The north rule's input is "Iceberg tables of interleaved text + media
documents"; this sandbox has no Iceberg runtime jar, so the engine
reads the driver-provided parquet test tables by default and goes
through ``spark.read.table`` whenever the source looks like a catalog
identifier. On a real cluster, enable Iceberg per the standard runtime
config — everything downstream is plain DataFrames either way, and
Catalyst pushes filters/pruning into either scan (DSv2):

    spark-submit \
      --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<v> \
      --conf spark.sql.extensions=org.apache.iceberg.spark.extensions\
.IcebergSparkSessionExtensions \
      --conf spark.sql.catalog.lake=org.apache.iceberg.spark.SparkCatalog \
      --conf spark.sql.catalog.lake.type=hive \
      ... jobs/run_pipeline.py --sf-dir lake.db   # tables lake.db.<name>
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def is_catalog_source(source: str) -> bool:
    """Catalog identifiers have dots and no path separators."""
    return "/" not in source and "\\" not in source and "." in source


def read_table(spark: SparkSession, source: str, name: str) -> DataFrame:
    """``source`` is either a directory of parquet files (driver test
    data: {source}/{name}.parquet) or a catalog namespace (Iceberg:
    {source}.{name} via spark.read.table)."""
    if is_catalog_source(source):
        return spark.read.table(f"{source}.{name}")
    return spark.read.parquet(f"{source}/{name}.parquet")
