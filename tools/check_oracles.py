"""Local mimic of the driver's correctness gate.

Runs every __spark_entry__.queries() entry on Spark and its
oracle_sql() twin on DuckDB at the given sf dir, then compares
row count, column names, and an order-insensitive value hash
(values rounded to 9 significant-ish decimals to absorb float noise).

Usage: python tools/check_oracles.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb
import numpy as np
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype(np.float64).round(9)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype(np.int64)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from gpiv_spark.session import get_spark

    spark = get_spark("oracle-check", cpus=8, shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    # driver-facing gate queries PLUS the retired (pytest-tier) ones —
    # local verification covers everything, the driver slot cap doesn't
    # apply here
    from gpiv_spark.queries import RETIRED

    qs = dict(entrymod.queries())
    oracles = dict(entrymod.oracle_sql())
    for rname, rq in RETIRED.items():
        qs[rname] = rq.spark
        if rq.oracle is not None:
            oracles[rname] = rq.oracle
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = fn(spark, sf_dir).toPandas()
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"  {name:28s} rows-only: {len(sdf)} rows  [{t_spark:.1f}s]")
            if len(sdf) == 0:
                failures.append((name, "0 rows (rows-only check)"))
            continue
        odf = con.execute(oracles[name]).df()
        a, b = canon(sdf), canon(odf)
        msg = []
        if list(a.columns) != list(b.columns):
            msg.append(f"cols {list(a.columns)} vs {list(b.columns)}")
        if len(a) != len(b):
            msg.append(f"rows {len(a)} vs {len(b)}")
        if not msg:
            try:
                pd.testing.assert_frame_equal(
                    a, b, check_dtype=False, check_exact=False, rtol=1e-7, atol=1e-9
                )
            except AssertionError as e:
                msg.append(str(e).split("\n")[0] + " …")
        status = "OK " if not msg else "FAIL"
        print(f"  {name:28s} {status} {len(a)} rows  [{t_spark:.1f}s] {'; '.join(msg)}")
        if msg:
            failures.append((name, "; ".join(msg)))
            # show a small diff sample
            merged = a.merge(b, how="outer", indicator=True,
                             on=None, suffixes=("_spark", "_duck"))
            print(merged[merged._merge != "both"].head(6).to_string())

    spark.stop()
    if failures:
        print(f"\n{len(failures)} FAILURES: {[f[0] for f in failures]}")
        return 1
    print("\nall queries match")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
