"""Vectorized hyperplane-LSH signatures + cosine refine for embeddings.

The embedding near-dup scale path (cf. queries_misc.q_cosine_neardup_lsh)
is banded sign-LSH: per band, the sign bits of `bits` hyperplane dot
products; two vectors are candidates iff some band matches exactly, and
candidates are verified with the exact cosine. The round-2 engine
computed every dot product with Spark higher-order-function lambdas
(`aggregate(zip_with(...))`) — interpreted per element, ~12 array folds
per row — and with only 2 bits/band the bands admitted ~80% of ALL
pairs, so the "refine" was a near-quadratic pass of interpreted lambdas
(8.3 s at bench SF). Here both halves are NumPy matrix ops inside
mapInPandas (one X @ H per Arrow batch, one fused dot/norm per candidate
batch) and the default geometry is 8 bands x 16 bits: background pairs
(cos ~ N(0, 1/sqrt(dim))) collide in a band with prob ~(1/2)^16 while
planted near-dups (cos >= 0.99, per-plane agreement p ~ 0.986) still
match some band with prob 1 - (1 - p^16)^8 ~ 1 - 3e-6 — verified
empirically against the quadratic oracle, not just assumed.

Hyperplane components use the SAME deterministic formula as the SQL
`_hyper` twin (h_j[i] = ((j*311 + i*127) % 1009)/1009 - 0.5) so the
kernel is a drop-in for any dialect-template consumer.

At 10^12 docs: signatures are one map-side pass (no shuffle); only the
(band, bv) equi-join shuffles, carrying 3 int64s per (vec, band); the
refine join gathers embeddings for the ~per-mille surviving candidates.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hyperplane_matrix(dim: int, n_planes: int) -> np.ndarray:
    """(dim, n_planes) matrix; H[i, j] == the SQL _hyper component for
    1-based element i+1 of plane j."""
    i = np.arange(dim, dtype=np.int64)[:, None]
    j = np.arange(n_planes, dtype=np.int64)[None, :]
    return ((j * 311 + i * 127) % 1009).astype(np.float64) / 1009.0 - 0.5


def band_signatures(vecs: DataFrame, id_col: str = "vec_id",
                    vec_col: str = "embedding", n_bands: int = 8,
                    bits: int = 16) -> DataFrame:
    """(id, band, bv): per input row, `n_bands` rows of packed sign bits.

    One X @ H (batch x dim x n_bands*bits) per Arrow batch; bit t of
    band b is plane b*bits + t, MSB-first — a pure function of the
    embedding, so signatures computed on different executors agree.
    """
    n_planes = n_bands * bits
    weights = (1 << np.arange(bits - 1, -1, -1, dtype=np.int64))
    # cache blocking, same finding as operators/tin.py PROBE_CHUNK: at
    # full 65536-row Arrow batches the X @ H product and its sign/pack
    # temporaries are tens of MB each — past L2, so concurrent workers
    # contend on DRAM bandwidth. 4096-row chunks keep them ~4 MB.
    chunk = 4096

    def sig(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        h = None
        for pdf in batches:
            for s in range(0, len(pdf), chunk):
                part = pdf.iloc[s:s + chunk]
                if len(part) == 0:
                    continue
                x = np.stack(
                    [np.asarray(v, dtype=np.float64) for v in part[vec_col]]
                )
                if h is None:
                    h = hyperplane_matrix(x.shape[1], n_planes)
                bits_mat = (x @ h > 0).reshape(len(part), n_bands, bits)
                bv = (bits_mat * weights).sum(axis=2)  # (n, n_bands) int64
                ids = part[id_col].to_numpy()
                yield pd.DataFrame({
                    id_col: np.repeat(ids, n_bands),
                    "band": np.tile(
                        np.arange(n_bands, dtype=np.int64), len(part)),
                    "bv": bv.reshape(-1),
                })

    return vecs.mapInPandas(sig, f"{id_col} long, band long, bv long")


def lsh_candidate_pairs(vecs: DataFrame, id_col: str = "vec_id",
                        vec_col: str = "embedding", n_bands: int = 8,
                        bits: int = 16,
                        bucket_cap: int = 1000) -> DataFrame:
    """Distinct (id_a < id_b) pairs sharing at least one exact band.

    Hot-bucket guard: a degenerate corpus (zero or byte-identical
    embeddings -> identical 16-bit band values) turns one (band, bv)
    bucket quadratic at 10^12 docs. Buckets holding more than
    ``bucket_cap`` members are therefore STAR-LINKED — every member
    pairs with the bucket's minimum id only, O(m) pairs instead of
    O(m^2) — bounding candidate count at O(bucket_cap * n).

    APPROXIMATION CONTRACT above the cap: star pairs preserve CC
    connectivity only when the representative itself refines as a
    near-dup of the members (true for the degenerate byte-identical
    buckets the cap exists for). In a mixed over-cap bucket whose rep
    is NOT within threshold of two members, the (rep, member) pairs
    die in the refine and a true (member, member) pair is missed —
    pair-level completeness above the cap is fundamentally
    sub-quadratic-impossible, and this trade is the standard one.
    Sub-cap buckets keep exact all-pairs semantics; real data never
    hits the cap (background band collision ~2^-16), which is why the
    gated query can still demand equality with the quadratic oracle.

    Signatures are computed ONCE: the windowed size/representative
    frame below is localCheckpoint-ed before fanning out to its three
    consumers, so the mapInPandas signature kernel (upstream of the
    window) runs exactly one pass — no second checkpoint needed.
    """
    from pyspark.sql import Window

    sig = band_signatures(vecs, id_col, vec_col, n_bands, bits)
    # one shuffle on (band, bv) computes size + representative; the
    # self-join below reuses the same key, so no extra exchange class
    w = Window.partitionBy("band", "bv")
    tagged = sig.select(
        id_col, "band", "bv",
        F.count("*").over(w).alias("_bn"),
        F.min(id_col).over(w).alias("_rep"),
    ).localCheckpoint(eager=True)  # window result feeds 3 branches
    small = tagged.filter(F.col("_bn") <= bucket_cap)
    exact = (
        small.alias("a")
        .join(
            small.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
    )
    starred = (
        tagged.filter(
            (F.col("_bn") > bucket_cap) & (F.col(id_col) != F.col("_rep"))
        )
        .select(F.col("_rep").alias("id_a"), F.col(id_col).alias("id_b"))
    )
    return exact.unionByName(starred).distinct()


def cosine_refine(pairs: DataFrame, vecs: DataFrame,
                  id_col: str = "vec_id", vec_col: str = "embedding",
                  out_a: str = "vec_a", out_b: str = "vec_b",
                  round_to: int | None = 6) -> DataFrame:
    """(id_a, id_b) -> (out_a, out_b, cosine) with the exact float64
    cosine, vectorized: gather both embeddings (two equi-joins), then one
    fused einsum per Arrow batch.

    ``round_to=None`` returns the RAW cosine — callers that threshold
    the result must filter on the raw value and round only for output
    (a pre-rounded cosine within 0.5*10^-round_to of the threshold
    would pass/fail differently from an oracle filtering raw)."""
    va = vecs.select(F.col(id_col).alias("id_a"),
                     F.col(vec_col).alias("_ea"))
    vb = vecs.select(F.col(id_col).alias("id_b"),
                     F.col(vec_col).alias("_eb"))
    joined = pairs.join(va, "id_a").join(vb, "id_b")

    def cos(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ea = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["_ea"]])
            eb = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["_eb"]])
            c = np.einsum("ij,ij->i", ea, eb) / (
                np.linalg.norm(ea, axis=1) * np.linalg.norm(eb, axis=1)
            )
            yield pd.DataFrame({
                out_a: pdf["id_a"].to_numpy(),
                out_b: pdf["id_b"].to_numpy(),
                "cosine": c if round_to is None else np.round(c, round_to),
            })

    return joined.mapInPandas(
        cos, f"{out_a} long, {out_b} long, cosine double"
    )
