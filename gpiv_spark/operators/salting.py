"""Hot-key salting for pandas-UDF group kernels (SURVEY §4.2).

AQE's skew handling splits oversized SHUFFLE JOIN partitions, but an
``applyInPandas`` group is indivisible: one hot spatial cell (an urban
cluster at 10^12-doc scale) becomes one giant Python call. Salting
splits such groups deterministically:

1. ``with_salt`` adds ``_salt = pmod(xxhash64(id_cols), n_salt)``;
2. the kernel runs per (key, _salt) — bounded group size;
3. algebraic aggregates re-merge with a cheap second-stage groupBy.

Use for count/sum/min/max-style kernels, or kernels whose outputs are
mergeable (partial top-k, sketches). Non-mergeable kernels (Delaunay)
instead bound group size by choosing a finer cell_res — both knobs are
explicit in the engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, id_cols: list[str], n_salt: int,
              salt_col: str = "_salt") -> DataFrame:
    return df.withColumn(
        salt_col, F.pmod(F.xxhash64(*[F.col(c) for c in id_cols]), F.lit(n_salt))
    )


def merge_partials(partials: DataFrame, key_cols: list[str],
                   merges: dict[str, str]) -> DataFrame:
    """Second stage: merge per-salt partial rows back to one row per key.

    ``merges``: output column -> merge fn ('sum' | 'min' | 'max').
    Weighted means must be carried as (sum, count) partials.
    """
    aggs = [getattr(F, fn)(col).alias(col) for col, fn in merges.items()]
    return partials.groupBy(*key_cols).agg(*aggs)


def salted_cell_stats(docs_geo: DataFrame, n_salt: int = 16) -> DataFrame:
    """Per-cell doc statistics through the full salted kernel path:
    stage 1 is an ``applyInPandas`` kernel per (cell, _salt) — a hot
    cell (urban cluster at 10^12-doc scale) splits into ``n_salt``
    bounded Python calls instead of one giant one — stage 2 re-merges
    the algebraic partials with a cheap groupBy.

    docs_geo: (doc_id, cell, dx, dy) where dx/dy are extent-relative
    offsets (well-conditioned sums). Returns (cell, n_docs, sum_dx,
    sum_dy) — exact regardless of how the salt split the groups.
    """
    import pandas as pd

    salted = with_salt(docs_geo, ["doc_id"], n_salt)

    def _partial(key, pdf):
        return pd.DataFrame(
            [
                {
                    "cell": int(key[0]),
                    "n_docs": len(pdf),
                    "sum_dx": float(pdf["dx"].to_numpy().sum()),
                    "sum_dy": float(pdf["dy"].to_numpy().sum()),
                }
            ]
        )

    partials = salted.groupBy("cell", "_salt").applyInPandas(
        _partial, "cell long, n_docs long, sum_dx double, sum_dy double"
    )
    return merge_partials(
        partials, ["cell"],
        {"n_docs": "sum", "sum_dx": "sum", "sum_dy": "sum"},
    )
