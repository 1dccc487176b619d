"""Bucketed co-located join: zero Exchange; plain parquet shuffles.

Also checks correctness: the bucketed join returns exactly the same
rows as the shuffled one.
"""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from gpiv_spark.sources.bucketed import (
    ensure_database,
    n_exchanges,
    write_bucketed,
)


@pytest.fixture()
def bucket_db(spark):
    loc = tempfile.mkdtemp(prefix="bucketdb_")
    ensure_database(spark, "bdb", loc)
    yield "bdb"
    spark.sql("DROP DATABASE IF EXISTS bdb CASCADE")
    shutil.rmtree(loc, ignore_errors=True)


def _frames(spark):
    docs = spark.range(10_000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 500).alias("score")
    )
    comps = spark.range(0, 10_000, 3).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7).alias("component")
    )
    return docs, comps


def test_bucketed_join_has_no_exchange_and_matches(spark, bucket_db):
    docs, comps = _frames(spark)
    write_bucketed(docs, "bdb.docs", "doc_id", 8)
    write_bucketed(comps, "bdb.comps", "doc_id", 8)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the merge path: broadcast would hide the co-location
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("bdb.docs").join(
            spark.table("bdb.comps"), "doc_id"
        )
        assert n_exchanges(joined) == 0, "bucketed join must not shuffle"
        got = joined.count()

        plain = docs.join(comps, "doc_id")
        assert n_exchanges(plain) >= 2, "unbucketed baseline should shuffle"
        assert got == plain.count() == comps.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_groupby_has_no_exchange(spark, bucket_db):
    docs, _ = _frames(spark)
    write_bucketed(docs, "bdb.docs_g", "doc_id", 8)
    agg = spark.table("bdb.docs_g").groupBy("doc_id").agg(
        F.sum("score").alias("s")
    )
    assert n_exchanges(agg) == 0, "groupBy on the bucket key must not shuffle"
    assert agg.count() == 10_000
