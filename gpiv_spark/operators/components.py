"""Connected components over a pair/edge table (dedup clustering).

Near-dup dedup at 10^12-doc scale ends with CLUSTERS, not pairs: LSH
emits candidate edges, and every document needs a canonical id = the
minimum doc id reachable through those edges. This is iterative
min-label propagation, the standard distributed CC algorithm:

1. every node starts labeled with itself;
2. each round, a node's label becomes min(own, neighbors' labels) —
   one equi-join on the symmetrized edge table + one groupBy min;
3. stop when a round changes nothing (one tiny agg per round).

Rounds needed = graph diameter (near-dup clusters are shallow — dense
blobs of mutually-similar docs, diameter 2-4); the loop caps at
``max_rounds`` and raises if not converged. Each round's labels are
eagerly ``localCheckpoint``-ed: one materialization feeds the next
join AND the change-count, lineage never re-derives earlier rounds,
and blocks free on GC (same discipline as knn_kring_adaptive).

At 100 TB the per-round shuffle carries (node, label) int64 pairs
only; edges shuffle once per round on the join key. Skewed hub nodes
are bounded by construction here (LSH bands cap bucket fan-out); a
general-graph deployment would add the large-star/small-star split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class NotConverged(RuntimeError):
    """Label propagation hit max_rounds with labels still changing."""


def connected_components(edges: DataFrame, a: str = "a", b: str = "b",
                         max_rounds: int = 20,
                         stats: dict | None = None) -> DataFrame:
    """(a, b) undirected edge table -> (node, component) with
    component = min node id reachable. Nodes appear iff they touch an
    edge; callers union isolated nodes afterwards if needed.
    """
    sym = (
        edges.select(F.col(a).alias("src"), F.col(b).alias("dst"))
        .unionByName(edges.select(F.col(b).alias("src"), F.col(a).alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)  # reused every round
    )
    labels = (
        sym.select(F.col("src").alias("node")).distinct()
        .select("node", F.col("node").alias("comp"))
        .localCheckpoint(eager=True)
    )
    rounds = 0
    while rounds < max_rounds:
        rounds += 1
        nbr_min = (
            sym.join(labels, sym["dst"] == labels["node"])
            .groupBy("src").agg(F.min("comp").alias("nbr_comp"))
        )
        new_labels = (
            labels.join(nbr_min, labels["node"] == nbr_min["src"], "left")
            .select(
                "node",
                F.least(
                    F.col("comp"), F.coalesce("nbr_comp", F.col("comp"))
                ).alias("comp"),
                (F.col("nbr_comp") < F.col("comp")).alias("_chg"),
            )
            .localCheckpoint(eager=True)
        )
        changed = new_labels.filter("_chg").limit(1).count()
        labels = new_labels.drop("_chg")
        if changed == 0:
            if stats is not None:
                stats.update(rounds=rounds, converged=True)
            return labels
    raise NotConverged(f"labels still changing after {max_rounds} rounds")
