"""spark-submit entry point for the north-rule doc pipeline.

Ships via:
    tools/package.sh           # builds dist/gpiv_spark.zip
    spark-submit --master local[32] \
        --py-files dist/gpiv_spark.zip jobs/run_pipeline.py \
        --docs 2000000 --points 120000 --checkpoint /tmp/gpiv_ckpt

Stages checkpoint through gpiv_spark.plans.lineage, so a re-run with
the same arguments resumes from the last completed stage (per-partition
lineage + metrics written alongside each checkpoint).
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--points", type=int, default=100_000)
    ap.add_argument("--checkpoint", default="/tmp/gpiv_ckpt")
    ap.add_argument("--sf-dir", default=None,
                    help="read doc_ids from this dir's documents.parquet "
                         "instead of synthesizing")
    ap.add_argument("--broadcast-budget-mb", type=int, default=1024,
                    help="max broadcast TIN index size; larger TINs take "
                         "the shuffle equi-join path")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = SparkSession.builder.appName("gpiv-doc-pipeline").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from gpiv_spark.dialect import SPARK as d
    from gpiv_spark.functions import geocode
    from gpiv_spark.operators.tin import (
        build_triangles,
        propagate_at,
        propagate_at_broadcast,
    )
    from gpiv_spark.plans import lineage

    fp = f"points={args.points}-v1"

    def build_points():
        pts = spark.range(args.points).select(F.col("id").alias("pid"))
        px = geocode.xq_expr(d, "pid")
        py = geocode.yq_expr(d, "pid")
        return pts.select(
            F.expr(px).alias("x"),
            F.expr(py).alias("y"),
            F.expr(
                f"5.0 + 0.01 * ({px} - {geocode.X0!r})"
                f" + 0.004 * ({py} - {geocode.Y0!r})"
            ).alias("z"),
            F.expr("(1 + pid % 7) * 0.0001").alias("var_x"),
            F.expr("(1 + pid % 5) * 0.0001").alias("var_y"),
            F.expr("(1 + pid % 3) * 0.0001").alias("var_z"),
            F.lit(0.0).alias("cov_xy"),
            F.lit(0.0).alias("cov_xz"),
            F.lit(0.0).alias("cov_yz"),
        )

    t0 = time.time()
    tris, resumed_t = lineage.resume_or_run(
        spark, args.checkpoint, "triangles",
        lambda: build_triangles(spark, build_points(), cell_res=4, halo_m=6.0),
        fp,
    )

    if args.sf_dir:
        # parquet dir (testdata) or Iceberg catalog namespace — see
        # gpiv_spark.sources.tables for the cluster-side Iceberg config
        from gpiv_spark.sources.tables import read_table

        docs = read_table(spark, args.sf_dir, "documents").select(
            "doc_id",
            F.expr(geocode.x_expr(d, "doc_id")).alias("x"),
            F.expr(geocode.y_expr(d, "doc_id")).alias("y"),
        )
    else:
        docs = spark.range(args.docs).select(
            F.col("id").alias("doc_id"),
            F.expr(geocode.x_expr(d, "id")).alias("x"),
            F.expr(geocode.y_expr(d, "id")).alias("y"),
        )

    # docs source identity in the fingerprint: switching --sf-dir (or
    # synthetic<->sf-dir mode) must invalidate the checkpoint. The
    # propagation construction lives inside the lambda so a resume
    # skips the triangle collect entirely.
    docs_fp = args.sf_dir if args.sf_dir else f"docs={args.docs}"
    cen = (geocode.X0 + 239.0, geocode.Y0 + 239.0, 7.0)

    def build_propagated():
        # size-based physical-plan switch: the triangle count is cheap
        # (parquet metadata); a TIN too big to broadcast takes the
        # shuffle equi-join path so no single node holds the whole index
        n_tris = tris.count()
        if n_tris * 110 <= args.broadcast_budget_mb * (1 << 20):
            return propagate_at_broadcast(spark, docs, tris, index_res=9,
                                          centroid=cen)
        return propagate_at(docs, tris, index_res=9, centroid=cen,
                            broadcast_triangles=False)

    out, resumed_p = lineage.resume_or_run(
        spark, args.checkpoint, "propagated",
        build_propagated,
        f"{fp}-{docs_fp}",
    )
    row = out.agg(
        F.count("*").alias("n"), F.avg("var_zp").alias("mean_var")
    ).collect()[0]
    wall = time.time() - t0
    print(json.dumps({
        "n_docs_out": row["n"],
        "mean_var": row["mean_var"],
        "resumed": {"triangles": resumed_t, "propagated": resumed_p},
        "wall_sec": round(wall, 2),
        "docs_per_sec": round(row["n"] / wall) if wall > 0 else None,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
