"""The pytest tier of the correctness gate.

Round 4 trimmed the driver-facing registry to the 50-query gate cap;
the queries moved to gpiv_spark.queries.RETIRED stay verified HERE with
the exact same three checks the driver runs (row count, sorted column
names, value match) against their DuckDB oracles at sf0.001.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype(np.float64).round(9)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype(np.int64)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(
        drop=True
    )


@pytest.fixture(scope="module")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _retired_names():
    from gpiv_spark.queries import RETIRED

    return sorted(RETIRED)


@pytest.mark.parametrize("name", _retired_names())
def test_retired_query_matches_oracle(spark, duck, name):
    from gpiv_spark.queries import RETIRED

    q = RETIRED[name]
    sdf = q.spark(spark, SF_DIR).toPandas()
    assert len(sdf) > 0, f"{name}: 0 rows"
    if q.oracle is None:
        return
    odf = duck.execute(q.oracle).df()
    a, b = _canon(sdf), _canon(odf)
    assert list(a.columns) == list(b.columns), name
    assert len(a) == len(b), (name, len(a), len(b))
    pd.testing.assert_frame_equal(
        a, b, check_dtype=False, check_exact=False, rtol=1e-7, atol=1e-9
    )


def test_gate_registry_within_cap():
    from gpiv_spark.queries import GATE_CAP, REGISTRY, RETIRED

    assert len(REGISTRY) <= GATE_CAP
    # the round-3 flagship queries must hold driver-verified slots
    for must in (
        "dedup_components", "dedup_components_star", "dedup_canonical",
        "stream_dedup", "span_stats", "manifest_prune", "stream_cell_counts",
    ):
        assert must in REGISTRY, must
    assert not set(REGISTRY) & set(RETIRED)
