"""kNN spatial join (SURVEY §2.3 north-rule extension).

Two physical strategies, one logical op:

- ``knn_bruteforce``: MAP-SIDE top-k against a small anchor set. The
  anchors become an array-of-structs literal in the plan; per point,
  ``array_sort`` + ``slice`` + ``posexplode`` rank the k nearest with
  ZERO shuffle (the round-1 broadcast-join + Window form shuffled
  n_anchors x n_points rows just to rank per point — at 10^12 docs
  that is 10^13 shuffled rows for nothing). A Window fallback remains
  for anchor sets too large to inline.
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

# above this, the inlined anchor array stops being a sane plan literal
# and the Window fallback (one shuffle) takes over
MAX_INLINE_ANCHORS = 1024


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
    """Exact top-k nearest anchors per point, shuffle-free.

    anchor_df (anchor_id int, ax double, ay double) is collected (it is
    small by contract) and inlined; each point computes, sorts, and
    slices its own distance array inside whole-stage codegen.
    """
    rows = anchor_df.collect()
    if len(rows) > MAX_INLINE_ANCHORS:
        return _knn_window(points, anchor_df, k, id_col)
    structs = ", ".join(
        f"named_struct('dist_sq', (x - {r['ax']!r}) * (x - {r['ax']!r})"
        f" + (y - {r['ay']!r}) * (y - {r['ay']!r}),"
        f" 'anchor_id', CAST({int(r['anchor_id'])} AS INT))"
        for r in rows
    )
    topk = f"slice(array_sort(array({structs})), 1, {k})"
    return (
        points.select(id_col, F.expr(topk).alias("_top"))
        .select(id_col, F.posexplode("_top").alias("_pos", "_s"))
        .select(
            id_col,
            F.col("_s.anchor_id").alias("anchor_id"),
            (F.col("_pos") + 1).cast("long").alias("rnk"),
            F.col("_s.dist_sq").alias("dist_sq"),
        )
    )


def knn_kring_adaptive(points: DataFrame, k: int, res: int,
                       id_col: str = "doc_id",
                       max_ring: int = 32,
                       stats: dict | None = None) -> DataFrame:
    """Exact doc-to-doc kNN via ADAPTIVE k-ring expansion (the H3
    pattern, full semantics): start with the 1-ring cell neighborhood,
    and for queries whose k-th candidate is not yet GUARANTEED (fewer
    than k found, or k-th distance >= ring * cell_size — a closer point
    could still hide in the unexplored shell), double the ring and
    retry. Most queries settle at ring 1; the driver loop runs
    O(log max_ring) distributed rounds over the shrinking pending set.

    Guarantee: cells at Chebyshev distance > r hold points at Euclidean
    distance >= r * csize, so kth_dist < r * csize proves completeness.

    Each round's ranking AND the shrinking pending set are eagerly
    localCheckpoint-ed: the per-round shuffle is materialized exactly
    once (three readers), later rounds and the final union never
    re-derive earlier candidate generation, and the blocks are released
    by the ContextCleaner once the result is garbage-collected —
    ``cache()`` would pin them in the CacheManager for the session
    lifetime (the driver gate runs dozens of queries in one session).

    Queries still unsettled at ``max_ring`` are emitted best-effort and
    counted in ``stats['unsettled']`` plus a ``warnings.warn`` — the
    exactness contract holds only for settled queries there.

    points: (id_col, x, y). Returns (id_col, nbr, rnk, dist_sq), exact
    top-k (ties broken by (dist_sq, nbr)) for every query reachable
    within max_ring. ``stats`` (optional dict) is filled with
    {'rounds', 'unsettled'}.
    """
    spark = points.sparkSession
    n = 1 << res
    csize = EXTENT / n

    def cellix(c: str, o: float) -> F.Column:
        return F.expr(
            f"greatest(0, least({n - 1}, "
            f"CAST(floor(({c} - {o!r}) / {csize!r}) AS BIGINT)))"
        )

    enc = points.select(
        F.col(id_col), "x", "y",
        cellix("x", X0).alias("ix"), cellix("y", Y0).alias("iy"),
    )
    base = enc.select(
        F.col(id_col).alias("nbr"), F.col("x").alias("bx"),
        F.col("y").alias("by"), F.col("ix").alias("bix"),
        F.col("iy").alias("biy"),
    )
    pending = enc
    emitted: list[DataFrame] = []
    rounds = 0
    ring = 1
    while True:
        rounds += 1
        offs = spark.createDataFrame(
            [(dr, dc) for dr in range(-ring, ring + 1)
             for dc in range(-ring, ring + 1)],
            "dr int, dc int",
        )
        cand = (
            pending.crossJoin(F.broadcast(offs))
            .withColumn("jx", F.col("ix") + F.col("dc"))
            .withColumn("jy", F.col("iy") + F.col("dr"))
            .filter((F.col("jx") >= 0) & (F.col("jx") < n)
                    & (F.col("jy") >= 0) & (F.col("jy") < n))
            .join(base, (F.col("jx") == F.col("bix"))
                  & (F.col("jy") == F.col("biy")))
            .filter(F.col(id_col) != F.col("nbr"))
            .withColumn(
                "dist_sq",
                (F.col("x") - F.col("bx")) * (F.col("x") - F.col("bx"))
                + (F.col("y") - F.col("by")) * (F.col("y") - F.col("by")),
            )
        )
        w = Window.partitionBy(id_col).orderBy("dist_sq", "nbr")
        # materialize this round's shuffle exactly once (settled agg,
        # emit semi-join, pending anti-join all read it); lineage
        # truncation keeps the final union's plan O(rounds) deep
        ranked = (
            cand.withColumn("rnk", F.row_number().over(w).cast("long"))
            .filter(F.col("rnk") <= k)
            .select(id_col, "nbr", "rnk", "dist_sq")
            .localCheckpoint(eager=True)
        )
        bound = (ring * csize) ** 2
        settled_ids = (
            ranked.groupBy(id_col)
            .agg(F.count("*").alias("cnt"), F.max("dist_sq").alias("kth"))
            .filter((F.col("cnt") == k) & (F.col("kth") < bound))
            .select(id_col)
        )
        if ring >= max_ring:
            emitted.append(ranked)
            n_unsettled = pending.join(settled_ids, id_col, "anti").count()
            if n_unsettled:
                import warnings

                warnings.warn(
                    f"knn_kring_adaptive: {n_unsettled} queries hit "
                    f"max_ring={max_ring} unsettled; their top-k is "
                    "best-effort, not guaranteed exact", stacklevel=2,
                )
            if stats is not None:
                stats.update(rounds=rounds, unsettled=n_unsettled)
            break
        emitted.append(ranked.join(settled_ids, id_col, "semi"))
        pending = pending.join(settled_ids, id_col, "anti").localCheckpoint(
            eager=True
        )
        if pending.isEmpty():
            if stats is not None:
                stats.update(rounds=rounds, unsettled=0)
            break
        ring *= 2
    done = emitted[0]
    for part in emitted[1:]:
        done = done.unionByName(part)
    return done


def _knn_window(points: DataFrame, anchor_df: DataFrame, k: int,
                id_col: str) -> DataFrame:
    """Fallback for large anchor sets: broadcast join + Window rank."""
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
