"""Connected components: exact labels, round count, convergence guard."""

import pandas as pd
import pytest

from gpiv_spark.operators.components import NotConverged, connected_components


def _edges(spark, pairs):
    return spark.createDataFrame(pd.DataFrame(pairs, columns=["a", "b"]))


def test_two_components_and_chain(spark):
    # component 1: a 6-node chain 10-11-12-13-14-15 (diameter forces
    # multiple propagation rounds); component 2: a triangle 20-21-22
    pairs = [(10, 11), (11, 12), (12, 13), (13, 14), (14, 15),
             (20, 21), (21, 22), (20, 22)]
    stats = {}
    got = (
        connected_components(_edges(spark, pairs), stats=stats)
        .toPandas().sort_values("node").reset_index(drop=True)
    )
    want = {n: 10 for n in range(10, 16)} | {n: 20 for n in (20, 21, 22)}
    assert dict(zip(got["node"], got["comp"])) == want
    assert stats["converged"] and stats["rounds"] >= 3  # chain needs depth


def test_not_converged_raises(spark):
    pairs = [(i, i + 1) for i in range(30, 40)]  # long chain
    with pytest.raises(NotConverged):
        connected_components(_edges(spark, pairs), max_rounds=1)


def test_duplicate_and_reversed_edges_ok(spark):
    pairs = [(1, 2), (2, 1), (1, 2), (2, 3)]
    got = connected_components(_edges(spark, pairs)).toPandas()
    assert dict(zip(got["node"], got["comp"])) == {1: 1, 2: 1, 3: 1}


# --- large-star/small-star variant -------------------------------------------

def _uf_truth(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


@pytest.mark.parametrize("name,pairs", [
    ("hub", [(0, i) for i in range(1, 400)] + [(1000, 1001), (1001, 1002)]),
    ("chain", [(i, i + 1) for i in range(100, 115)]),
    ("blobs", [(10 * g + i, 10 * g + j)
               for g in range(5) for i in range(4) for j in range(i + 1, 4)]),
    ("random", [((i * 7919) % 97, (i * 104729) % 97) for i in range(160)
                if (i * 7919) % 97 != (i * 104729) % 97]),
])
def test_star_cc_matches_union_find_and_label_prop(spark, name, pairs):
    from gpiv_spark.operators.components import connected_components_star

    want = _uf_truth(pairs)
    stats = {}
    got = connected_components_star(_edges(spark, pairs), stats=stats).toPandas()
    assert dict(zip(got["node"], got["comp"])) == want, name
    assert stats["converged"]
    # the 'random' modular graph is secretly one long permutation cycle
    # (edges (c1*i, c2*i) mod 97) — label propagation needs ~diameter
    # rounds there, which is exactly the case star CC exists for
    lp = connected_components(_edges(spark, pairs), max_rounds=60).toPandas()
    assert dict(zip(lp["node"], lp["comp"])) == want, name


def test_star_cc_converges_fast_on_long_chain(spark):
    from gpiv_spark.operators.components import connected_components_star

    pairs = [(i, i + 1) for i in range(200, 264)]  # diameter 64
    stats = {}
    got = connected_components_star(_edges(spark, pairs), stats=stats).toPandas()
    assert set(got["comp"]) == {200}
    # label propagation would need ~64 rounds; star CC is O(log n)
    assert stats["rounds"] <= 10, stats


# --- property-based: both algorithms == union-find on arbitrary graphs -------

from hypothesis import given, settings
from hypothesis import strategies as st


@st.composite
def _edge_lists(draw):
    n_edges = draw(st.integers(1, 30))
    pairs = []
    for _ in range(n_edges):
        a = draw(st.integers(0, 24))
        b = draw(st.integers(0, 24).filter(lambda x, a=a: x != a))
        pairs.append((min(a, b), max(a, b)))
    return pairs


@settings(max_examples=8, deadline=None)
@given(pairs=_edge_lists())
def test_cc_property_matches_union_find(spark, pairs):
    """Any undirected graph: label propagation and star CC both produce
    the union-find fixpoint. Spark jobs per example are expensive, so
    examples are few but the shapes hypothesis shrinks to (parallel
    edges, triangles, chains, near-cliques) are exactly the CC edge
    cases."""
    want = _uf_truth(pairs)
    from gpiv_spark.operators.components import connected_components_star

    lp = connected_components(_edges(spark, pairs), max_rounds=64).toPandas()
    assert dict(zip(lp["node"], lp["comp"])) == want
    star = connected_components_star(_edges(spark, pairs)).toPandas()
    assert dict(zip(star["node"], star["comp"])) == want


def test_self_loop_only_node_kept_by_both(spark):
    from gpiv_spark.operators.components import connected_components_star

    pairs = [(5, 5), (1, 2)]
    want = {1: 1, 2: 1, 5: 5}
    lp = connected_components(_edges(spark, pairs)).toPandas()
    assert dict(zip(lp["node"], lp["comp"])) == want
    star = connected_components_star(_edges(spark, pairs)).toPandas()
    assert dict(zip(star["node"], star["comp"])) == want
