"""kNN spatial join (SURVEY §2.3 north-rule extension).

Two physical strategies, one logical op:

- ``knn_bruteforce``: broadcast the small side, cross join, Window
  rank — exact, right whenever one side fits in a broadcast
  (anchors/ROI centers). At 100 TB the doc side streams through the
  broadcast join with zero shuffle before the top-k partial agg.
- ``knn_kring`` (scale path): encode both sides to hex cells, expand
  queries by k-ring offsets (small explode), equi-join on cell, rank,
  and iterate ring radius until each query has k neighbors within a
  distance bound — the H3 pattern; avoids the full cross product when
  both sides are huge.

Deterministic tie-break: (distance, neighbor_id) — float ties cannot
occur with the hash-derived fixture coords, but the tie-break keeps
the operator total-order stable anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from gpiv_spark.functions.geocode import EXTENT, X0, Y0

N_ANCHORS_SIDE = 4  # 4x4 anchor grid


def anchors() -> list[tuple[int, float, float]]:
    """(anchor_id, ax, ay): centers of a 4x4 grid over the extent."""
    out = []
    for j in range(N_ANCHORS_SIDE):
        for i in range(N_ANCHORS_SIDE):
            out.append(
                (
                    j * N_ANCHORS_SIDE + i,
                    X0 + (i + 0.5) * EXTENT / N_ANCHORS_SIDE,
                    Y0 + (j + 0.5) * EXTENT / N_ANCHORS_SIDE,
                )
            )
    return out


def anchors_values_sql(alias: str = "a") -> str:
    rows = ", ".join(f"({a}, {x!r}, {y!r})" for a, x, y in anchors())
    return f"(VALUES {rows}) AS {alias}(anchor_id, ax, ay)"


def knn_bruteforce(points: DataFrame, anchor_df: DataFrame, k: int,
                   id_col: str = "doc_id") -> DataFrame:
    """Exact top-k nearest anchors per point via broadcast + Window."""
    joined = points.crossJoin(F.broadcast(anchor_df)).withColumn(
        "dist_sq",
        (F.col("x") - F.col("ax")) * (F.col("x") - F.col("ax"))
        + (F.col("y") - F.col("ay")) * (F.col("y") - F.col("ay")),
    )
    w = Window.partitionBy(id_col).orderBy(F.col("dist_sq").asc(), F.col("anchor_id").asc())
    return (
        joined.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select(id_col, "anchor_id", "rnk", "dist_sq")
    )
