"""Checkpoint / lineage / resume semantics (north-rule resumability)."""

import tempfile

import pyspark.sql.functions as F

from gpiv_spark.plans import lineage


def test_checkpoint_resume_and_verify(spark):
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.range(10_000).select(
            F.col("id"), (F.col("id") * 2.5).alias("v")
        )

    with tempfile.TemporaryDirectory() as root:
        df1, resumed1 = lineage.resume_or_run(spark, root, "s1", build, "fp-a")
        assert not resumed1 and calls["n"] == 1
        assert df1.count() == 10_000

        # same fingerprint -> resume, no rebuild
        df2, resumed2 = lineage.resume_or_run(spark, root, "s1", build, "fp-a")
        assert resumed2 and calls["n"] == 1
        assert df2.count() == 10_000

        # lineage integrity holds on the checkpointed data
        assert lineage.verify_lineage(spark, root, "s1")

        # changed input fingerprint -> stale checkpoint is rebuilt
        df3, resumed3 = lineage.resume_or_run(spark, root, "s1", build, "fp-b")
        assert not resumed3 and calls["n"] == 2

        # lineage rows exist per partition with counts + checksums
        lin = spark.read.parquet(f"{root}/s1/lineage").toPandas()
        assert lin["rows"].sum() == 10_000
        assert (lin["rows"] > 0).all()


def test_verify_detects_corruption(spark):
    with tempfile.TemporaryDirectory() as root:
        df = spark.range(1000).select(F.col("id"), (F.col("id") % 7).alias("k"))
        lineage.checkpoint(df, root, "s2", "fp")
        assert lineage.verify_lineage(spark, root, "s2")
        # corrupt: overwrite data with different rows, keep old lineage
        import pathlib
        import shutil

        tmp = pathlib.Path(root) / "tmpdata"
        spark.range(999).select(
            F.col("id"), (F.col("id") % 7).alias("k")
        ).write.parquet(str(tmp))
        shutil.rmtree(pathlib.Path(root) / "s2" / "data")
        shutil.move(str(tmp), str(pathlib.Path(root) / "s2" / "data"))
        assert not lineage.verify_lineage(spark, root, "s2")
