"""Hot-cell salting: equal results, bounded group sizes."""

import pandas as pd
import pyspark.sql.functions as F

from gpiv_spark.operators.salting import merge_partials, with_salt

N_SALT = 8


def _skewed(spark):
    """300k rows, 30% in one hot cell (FIXTURES.md §3 skew variant)."""
    return spark.range(300_000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 10 < 3, F.lit(7)).otherwise(
            F.pmod(F.xxhash64("id"), F.lit(1000))
        ).alias("cell"),
        (F.col("id") % 97).cast("double").alias("v"),
    )


def _make_kernel():
    import pandas as _pd

    def kernel(pdf):
        return _pd.DataFrame(
            [{
                "cell": pdf["cell"].iloc[0],
                "n": len(pdf),
                "v_sum": float(pdf["v"].sum()),
                "v_max": float(pdf["v"].max()),
                "group_rows": len(pdf),
            }]
        )

    return kernel


SCHEMA = "cell long, n long, v_sum double, v_max double, group_rows long"


def test_salted_kernel_matches_unsalted(spark):
    df = _skewed(spark)
    plain = (
        df.groupBy("cell").applyInPandas(_make_kernel(), SCHEMA)
        .select("cell", "n", "v_sum", "v_max")
        .toPandas().sort_values("cell").reset_index(drop=True)
    )
    salted = with_salt(df, ["doc_id"], N_SALT)
    partials = salted.groupBy("cell", "_salt").applyInPandas(_make_kernel(), SCHEMA)
    merged = (
        merge_partials(partials, ["cell"],
                       {"n": "sum", "v_sum": "sum", "v_max": "max"})
        .toPandas().sort_values("cell").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        plain, merged[["cell", "n", "v_sum", "v_max"]], check_dtype=False,
        rtol=1e-12,
    )


def test_salted_cell_stats_operator(spark):
    """The packaged salted-kernel operator: exact vs a plain groupBy agg
    on a 50%-hot-cell fixture, and the physical plan shows the salted
    stage (groupBy cell,_salt kernel) feeding the merge groupBy(cell)."""
    from gpiv_spark.operators.salting import salted_cell_stats

    docs = spark.range(100_000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, F.lit(7)).otherwise(
            F.pmod(F.xxhash64("id"), F.lit(500))
        ).alias("cell"),
        (F.col("id") % 89).cast("double").alias("dx"),
        (F.col("id") % 83).cast("double").alias("dy"),
    )
    got = (
        salted_cell_stats(docs, n_salt=16)
        .toPandas().sort_values("cell").reset_index(drop=True)
    )
    want = (
        docs.groupBy("cell").agg(
            F.count("*").alias("n_docs"),
            F.sum("dx").alias("sum_dx"), F.sum("dy").alias("sum_dy"),
        ).toPandas().sort_values("cell").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False, rtol=1e-12)
    assert got.loc[got.cell == 7, "n_docs"].iloc[0] >= 50_000

    plan = salted_cell_stats(docs, n_salt=16)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "_salt" in plan  # the kernel stage is keyed on (cell, _salt)
    assert "FlatMapGroupsInPandas" in plan


def test_salt_bounds_hot_group(spark):
    df = _skewed(spark)
    salted = with_salt(df, ["doc_id"], N_SALT)
    sizes = (
        salted.groupBy("cell", "_salt").applyInPandas(_make_kernel(), SCHEMA)
        .filter("cell = 7").select("group_rows").toPandas()["group_rows"]
    )
    hot_total = sizes.sum()
    # 30% of 300k plus ~210k/1000 hash-branch collisions on cell 7
    assert 90_000 <= hot_total < 91_000
    assert len(sizes) == N_SALT
    # each salted sub-group well under the unsalted hot-group size
    assert sizes.max() < hot_total / N_SALT * 1.25
