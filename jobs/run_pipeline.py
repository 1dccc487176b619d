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
    ap.add_argument("--las", default=None,
                    help="read the point cloud from this LAS path/glob "
                         "(uncompressed 1.2-1.4, TPU extra-byte dims) "
                         "instead of synthesizing --points")
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
        PACK_BYTES_PER_POINT,
        build_pack_blobs,
        build_triangles,
        merge_pack_blobs,
        probe_docs,
        propagate_at,
    )
    from gpiv_spark.plans import lineage

    fp = (f"las={args.las}-v1" if args.las else f"points={args.points}-v1")

    def build_points():
        if args.las:
            # S1 on the reference's real format (run_test_v1.py:43-58):
            # distributed binaryFile scan + worker-side parse
            from gpiv_spark.sources.las import las_table

            return las_table(spark, args.las).withColumnRenamed(
                "point_id", "pid"
            )
        pts = spark.range(args.points).select(F.col("id").alias("pid"))
        px = geocode.xq_expr(d, "pid")
        py = geocode.yq_expr(d, "pid")
        return pts.select(
            F.col("pid"),
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

    # size-based physical-plan switch, shared with propagate_auto
    # (operators/tin.py): point count is known from the arguments, so
    # the branch is decided before any job runs. Small TIN -> the
    # DISTRIBUTED per-cell pack build (workers do Delaunay + pack their
    # shard; the driver only concatenates — never a toArrow() of the
    # triangle table). Large TIN -> the triangle table stays distributed
    # and docs equi-join it on the fine cell.
    if args.las:
        # estimate the point count from file metadata only (no scan):
        # format-0 record + 6 double extra dims = 68 bytes/point
        est_bytes = (
            spark.read.format("binaryFile").load(args.las)
            .agg(F.sum("length")).collect()[0][0] or 0
        )
        n_pts_est = est_bytes // 68
    else:
        n_pts_est = args.points
    use_broadcast = (
        n_pts_est * PACK_BYTES_PER_POINT
        <= args.broadcast_budget_mb * (1 << 20)
    )

    t0 = time.time()
    if use_broadcast:
        # checkpoint the expensive stage (per-cell Delaunay + pack
        # shards) as the tiny blob table — resumable like any stage
        blobs, resumed_t = lineage.resume_or_run(
            spark, args.checkpoint, "pack_blobs",
            lambda: build_pack_blobs(spark, build_points(), cell_res=4,
                                     index_res=9, halo_m=6.0, id_col="pid"),
            fp,
        )
    else:
        tris, resumed_t = lineage.resume_or_run(
            spark, args.checkpoint, "triangles",
            lambda: build_triangles(spark, build_points(), cell_res=4,
                                    halo_m=6.0),
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

    # docs source identity + physical path in the fingerprint: switching
    # --sf-dir (or synthetic<->sf-dir mode, or the broadcast/shuffle
    # branch via --broadcast-budget-mb) must invalidate the checkpoint.
    # The propagation construction lives inside the lambda so a resume
    # skips the pack merge / triangle scan entirely.
    mode = "bcast" if use_broadcast else "shuffle"
    docs_fp = (args.sf_dir if args.sf_dir else f"docs={args.docs}") + f"-{mode}"
    cen = (geocode.X0 + 239.0, geocode.Y0 + 239.0, 7.0)

    def build_propagated():
        if use_broadcast:
            # driver work = shard concatenation only (merge_pack_blobs);
            # the blob table is ~64 rows, one per coarse cell
            pack = merge_pack_blobs(blobs.toArrow(), index_res=9)
            bc = spark.sparkContext.broadcast(pack)
            return probe_docs(docs, bc, cen)
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
        "mode": mode,
        "resumed": {("pack_blobs" if use_broadcast else "triangles"): resumed_t,
                    "propagated": resumed_p},
        "wall_sec": round(wall, 2),
        "docs_per_sec": round(row["n"] / wall) if wall > 0 else None,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
