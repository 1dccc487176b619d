"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship pipeline smoke check on sf0.001.
``queries()`` / ``oracle_sql()`` — per-operator Spark pipelines and
their DuckDB ANSI-SQL twins; definitions live in gpiv_spark.queries
(both sides rendered from one dialect-neutral template so they cannot
drift — see gpiv_spark/dialect.py).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001.

    documents -> deterministic geocode -> Z-order cell encode -> GPIV
    tile assignment (G2) -> per-cell doc counts + tile histogram.
    Exercises scan, generated-expression projection (JVM-side), agg.
    """
    from gpiv_spark.queries import REGISTRY

    return REGISTRY["cells_zorder"].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from gpiv_spark.queries import REGISTRY

    return {name: q.spark for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    from gpiv_spark.queries import REGISTRY

    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}
