"""Bucketed-table writer: co-located joins with zero shuffle.

The 100-TB join discipline (SURVEY §4.2): any join repeated across
runs — documents↔components, documents↔embeddings, points↔cells —
should be paid for ONCE at write time. Spark's bucketed tables hash
rows into a fixed number of per-bucket files and record the layout in
the catalog; a join of two tables bucketed by the join key into the
same bucket count is planned as a SortMergeJoin with NO Exchange on
either side (and, with ``sortBy`` at write, no Sort either): every
task reads bucket i of both tables. At 10^12 docs that deletes the
dominant cost — the all-to-all shuffle — from every downstream run.

``bucketBy`` requires a catalog table (``saveAsTable``); parquet-path
writes can't carry bucket metadata. The helper creates the namespace
at an explicit LOCATION so nothing lands in the repo working dir.
tests/test_bucketed.py pins the plan property: bucketed-bucketed join
contains zero Exchange nodes, the same join on plain parquet shuffles
both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def ensure_database(spark: SparkSession, name: str, location: str) -> None:
    spark.sql(
        f"CREATE DATABASE IF NOT EXISTS {name} LOCATION '{location}'"
    )


def write_bucketed(df: DataFrame, table: str, bucket_col: str,
                   n_buckets: int) -> None:
    """Persist ``df`` hash-bucketed AND sorted by ``bucket_col`` —
    sorted buckets let the co-located SortMergeJoin skip its Sort.

    The frame is repartitioned on the bucket column first (Spark's
    repartition and bucket assignment share Murmur3-pmod hashing), so
    every write task holds exactly one bucket and each bucket is ONE
    file. Without this, every upstream task emits a file per bucket —
    tasks x buckets small files — and a multi-file bucket forfeits the
    sorted-read property, putting the Sort back into every join."""
    (
        df.repartition(n_buckets, bucket_col)
        .write.mode("overwrite")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .saveAsTable(table)
    )


def n_exchanges(df: DataFrame) -> int:
    """Count Exchange operators in the final (AQE) physical plan."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange")
