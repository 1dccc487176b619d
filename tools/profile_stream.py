"""Decompose the headline stream's 32-core floor (VERDICT r3 #2).

Runs the bench doc-stream at a pinned core count in three forms:
- jvm:   the JVM half only (geocode + broadcast PIP join + aggregate,
         no Python stage) — measures source+join scaling;
- noop:  same plan but through a pass-through mapInPandas — adds the
         Arrow serialize/deserialize channel and task handshakes;
- full:  the real TIN probe kernel (bench headline).

Usage: python tools/profile_stream.py CPUS [N_DOCS N_POINTS]
Prints one JSON line; run at 8 and 32 cores, compare ratios.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    cpus = int(sys.argv[1])
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 120_000_000
    n_points = int(sys.argv[3]) if len(sys.argv) > 3 else 800_000

    import bench
    from gpiv_spark.session import get_spark

    bench.pin_high_cores(cpus)
    spark = get_spark(f"profile-{cpus}", cpus=cpus,
                      shuffle_partitions=2 * cpus)

    from pyspark.sql import functions as F

    bc = bench.build_tin_pack(spark, n_points)

    def full_df():
        return bench.doc_stream_df(spark, n_docs, bc)

    def base_joined():
        # reproduce doc_stream_df's JVM half exactly
        import pandas as pd  # noqa: F401

        from gpiv_spark.dialect import SPARK as d
        from gpiv_spark.functions import cells, geocode
        from gpiv_spark.operators import pip as pip_op
        from gpiv_spark.operators import tiling

        docs = spark.range(0, n_docs, 1, 64).select(
            F.col("id").alias("doc_id"))
        x = geocode.x_expr(d, "doc_id")
        y = geocode.y_expr(d, "doc_id")
        geo = docs.select(
            "doc_id",
            F.expr(x).alias("x"),
            F.expr(y).alias("y"),
            F.expr(cells.zcell_expr(d, x, y, 6)).alias("cell_id"),
            F.expr(geocode.px_row_expr(d, y)).alias("px_row"),
            F.expr(geocode.px_col_expr(d, x)).alias("px_col"),
        )
        geo = tiling.assign_tiles(geo, tiling.PivConfig())
        roi = spark.createDataFrame(
            pip_op.roi_triangles(),
            "roi_id int, x1 double, y1 double, x2 double, y2 double, "
            "x3 double, y3 double",
        ).alias("r")
        pred = pip_op.inside_triangle_pred(
            "g.x", "g.y",
            {k: f"r.{k}" for k in ("x1", "y1", "x2", "y2", "x3", "y3")},
        )
        return geo.alias("g").join(
            F.broadcast(roi), F.expr(pred), "left"
        ).select("g.doc_id", "g.x", "g.y", "g.tile_r", "r.roi_id")

    def jvm_df():
        return base_joined().agg(
            F.count("*").alias("n"), F.avg("x").alias("mx"))

    def noop_df():
        import pandas as pd

        def passthru(batches):
            for pdf in batches:
                yield pd.DataFrame({"doc_id": pdf["doc_id"],
                                    "x": pdf["x"]})

        return base_joined().mapInPandas(
            passthru, "doc_id long, x double"
        ).agg(F.count("*").alias("n"), F.avg("x").alias("mx"))

    out = {"cpus": cpus, "n_docs": n_docs}
    for name, mk in (("jvm", jvm_df), ("noop", noop_df), ("full", full_df)):
        mk().collect()  # warm
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            mk().collect()
            best = min(best, time.time() - t0)
        out[name] = round(best, 2)
    out["loadavg"] = os.getloadavg()[0]
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
