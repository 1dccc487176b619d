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
