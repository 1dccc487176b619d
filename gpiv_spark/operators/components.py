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

from pyspark.sql import DataFrame, Observation
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
        # the change count rides the checkpoint materialization as an
        # observed metric — ONE job per round, not checkpoint + count
        obs = Observation()
        new_labels = (
            labels.join(nbr_min, labels["node"] == nbr_min["src"], "left")
            .select(
                "node",
                F.least(
                    F.col("comp"), F.coalesce("nbr_comp", F.col("comp"))
                ).alias("comp"),
                (F.col("nbr_comp") < F.col("comp")).alias("_chg"),
            )
            .observe(obs, F.sum(F.col("_chg").cast("long")).alias("changed"))
            .localCheckpoint(eager=True)
        )
        changed = obs.get["changed"] or 0
        labels = new_labels.drop("_chg")
        if changed == 0:
            if stats is not None:
                stats.update(rounds=rounds, converged=True)
            return labels
    raise NotConverged(f"labels still changing after {max_rounds} rounds")


def _sym(df: DataFrame) -> DataFrame:
    """Both directions, no self loops, distinct."""
    return (
        df.filter("u <> v")
        .select("u", "v")
        .unionByName(df.filter("u <> v").select(
            F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
    )


def _star_round(sym: DataFrame, small: bool) -> DataFrame:
    """One large-star (small=False) or small-star (small=True) step.

    Per node u with neighborhood G(u): m = min(G(u) + {u}).
    large-star rewires every LARGER neighbor to m:  {(v, m): v>u};
    small-star rewires every smaller-or-equal neighbor AND u itself:
    {(v, m): v<=u} + {(u, m)}. Emitted edges are new (u, v) rows.
    """
    mins = sym.groupBy("u").agg(
        F.least(F.min("v"), F.first("u")).alias("m")
    )
    j = sym.join(mins, "u")
    if small:
        moved = j.filter("v <= u").select(F.col("v").alias("u"),
                                          F.col("m").alias("v"))
        self_e = mins.select(F.col("u"), F.col("m").alias("v"))
        out = moved.unionByName(self_e)
    else:
        out = j.filter("v > u").select(F.col("v").alias("u"),
                                       F.col("m").alias("v"))
    return out


def connected_components_star(edges: DataFrame, a: str = "a", b: str = "b",
                              max_rounds: int = 40,
                              stats: dict | None = None) -> DataFrame:
    """Alternating large-star/small-star connected components
    (Kiveris et al., "Connected Components in MapReduce and Beyond") —
    the HUB-SKEW-ROBUST alternative to min-label propagation above.

    Label propagation re-shuffles a hub node's full neighbor list every
    round and needs diameter rounds; the star operations monotonically
    rewire edges toward each component's minimum and converge in
    O(log n) rounds on any topology, with every intermediate edge set
    no larger than ~2x the input. Right shape for 10^12-doc near-dup
    graphs where boilerplate text creates million-degree hubs.

    Returns (node, comp), comp = min reachable node id — identical
    contract (and, by the tests, identical output) to
    ``connected_components``. Convergence is detected by an edge-set
    fingerprint (count + bit_xor of xxhash64) — one cheap aggregate per
    round instead of a set-difference join.
    """
    raw = edges.select(F.col(a).alias("u"), F.col(b).alias("v"))

    def ckpt_fp(df: DataFrame):
        """Eager checkpoint with the edge-set fingerprint (count +
        bit_xor of xxhash64) observed on the SAME materialization —
        one job per round instead of checkpoint + collect."""
        obs = Observation()
        out = df.observe(
            obs,
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(F.xxhash64("u", "v")).alias("h"),
        ).localCheckpoint(eager=True)
        m = obs.get
        return out, (m["n"], m["h"])

    cur, prev_fp = ckpt_fp(_sym(raw))
    # node universe from the RAW edges: a node whose only edge is a
    # self-loop still "touches an edge" (same contract as label
    # propagation above), even though _sym drops the loop itself
    nodes = (
        raw.select("u").unionByName(raw.select(F.col("v").alias("u")))
        .distinct().localCheckpoint(eager=True)
    )

    rounds = 0
    while rounds < max_rounds:
        rounds += 1
        stepped = _star_round(_sym(_star_round(cur, small=False)),
                              small=True)
        cur, fp = ckpt_fp(_sym(stepped))
        if fp == prev_fp:
            if stats is not None:
                stats.update(rounds=rounds, converged=True)
            # fixpoint: a forest of stars — every non-min node has its
            # component min as a neighbor
            labels = cur.groupBy("u").agg(F.min("v").alias("mv")).select(
                F.col("u").alias("node"),
                F.least("u", "mv").alias("comp"),
            )
            return (
                nodes.select(F.col("u").alias("node"))
                .join(labels, "node", "left")
                .select("node", F.coalesce("comp", "node").alias("comp"))
            )
        prev_fp = fp
    raise NotConverged(f"star CC still changing after {max_rounds} rounds")
