"""Phase-level profiler for the headline pipeline (round-2 scaling work).

Breaks build_tin_pack into: delaunay job / points collect / numpy pack /
broadcast; and doc_stream into plan-build vs execute. Run at two
parallelism levels to locate the serial remainder.

Usage: python tools/profile_headline.py [cpus ...]
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402


def profile_build(spark, n_points):
    from pyspark.sql import functions as F

    from gpiv_spark.dialect import SPARK as d
    from gpiv_spark.functions import geocode
    from gpiv_spark.operators.tin import (
        build_triangle_ids,
        pack_triangle_index_normalized,
    )

    pts = spark.range(n_points).select(F.col("id").alias("pid"))
    px = geocode.xq_expr(d, "pid")
    py = geocode.yq_expr(d, "pid")
    points = pts.select(
        F.col("pid"),
        F.expr(px).alias("x"),
        F.expr(py).alias("y"),
        F.expr(
            f"5.0 + 0.01 * ({px} - {geocode.X0!r}) + 0.004 * ({py} - {geocode.Y0!r})"
            f" + 0.00005 * (({px} - {geocode.X0!r}) * ({py} - {geocode.Y0!r}))"
        ).alias("z"),
        F.expr("(1 + pid % 7) * 0.0001").alias("var_x"),
        F.expr("(1 + pid % 5) * 0.0001").alias("var_y"),
        F.expr("(1 + pid % 3) * 0.0001").alias("var_z"),
        F.lit(0.0).alias("cov_xy"),
        F.lit(0.0).alias("cov_xz"),
        F.lit(0.0).alias("cov_yz"),
    )
    t0 = time.time()
    tris = build_triangle_ids(spark, points, cell_res=4, halo_m=6.0,
                              id_col="pid")
    t_plan = time.time() - t0

    t0 = time.time()
    tris_tbl = tris.toArrow()
    t_delaunay = time.time() - t0

    t0 = time.time()
    pts_tbl = points.toArrow()
    t_points = time.time() - t0

    t0 = time.time()
    pack = pack_triangle_index_normalized(tris_tbl, pts_tbl, index_res=9,
                                          id_col="pid")
    t_pack = time.time() - t0

    t0 = time.time()
    bc = spark.sparkContext.broadcast(pack)
    t_bc = time.time() - t0
    nbytes = sum(v.nbytes for v in pack.values() if hasattr(v, "nbytes"))
    print(f"  build: plan={t_plan:.2f} delaunay_job={t_delaunay:.2f} "
          f"points_collect={t_points:.2f} numpy_pack={t_pack:.2f} "
          f"broadcast={t_bc:.2f}  pack_mb={nbytes / 1e6:.1f} "
          f"ntri={len(pack['tv'])}")
    return bc


def main():
    from pyspark.sql import SparkSession

    from gpiv_spark.session import get_spark

    for cpus in [int(a) for a in (sys.argv[1:] or ["8", "2"])]:
        spark = get_spark(f"prof-{cpus}", cpus=cpus,
                          shuffle_partitions=2 * cpus)
        try:
            print(f"== local[{cpus}] ==")
            # warm
            bc_w = profile_build(spark, bench.N_POINTS // 8)
            t0 = time.time()
            bench.doc_stream(spark, bench.N_DOCS // 8, bc_w)
            print(f"  warm stream(1/8): {time.time() - t0:.2f}")
            bc_w.destroy()

            t0 = time.time()
            bc = profile_build(spark, bench.N_POINTS)
            print(f"  build total: {time.time() - t0:.2f}")
            for i in range(3):
                t0 = time.time()
                bench.doc_stream(spark, bench.N_DOCS, bc)
                print(f"  stream[{i}]: {time.time() - t0:.2f}")
        finally:
            spark.stop()
            SparkSession._instantiatedSession = None


if __name__ == "__main__":
    main()
