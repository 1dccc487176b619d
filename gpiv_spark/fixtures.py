"""Deterministic synthetic fixtures (seed-free pure functions / seed 42).

- ``spans_documents`` — the north-rule input shape (input_hint):
  documents(doc_id string, spans array<struct<kind, text, media_ref,
  offset>>), interleaved text+media, offsets strictly increasing.
  The engine must carry ``spans`` through untouched (span-sequence
  equality invariant, verified in tests/test_span_invariant.py).
- ``points_cloud`` — TIN-stage input (FIXTURES.md §1): scattered XYZ
  + 6-column TPU (fixed [var_x, var_y, var_z, cov_xy, cov_xz,
  cov_yz] order — the draft 'correct code.txt:257-259' scrambled it;
  named columns prevent that bug class). Optional planar-z variant
  for the exactness property test.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from gpiv_spark.functions.geocode import EXTENT, X0, Y0

SPAN_KINDS = ["text", "image", "audio"]
WORDS = [
    "scan", "join", "merge", "filter", "window", "group", "sort", "hash",
    "table", "spark", "vector", "tile", "cell", "grid", "raster", "piv",
]


def spans_documents(spark: SparkSession, n_docs: int = 500,
                    skew_cell: bool = False) -> DataFrame:
    """Interleaved text+media documents; pure function of doc index.

    ``skew_cell=True`` concentrates 30% of docs on one location to
    exercise hot-cell salting (FIXTURES.md §3).
    """
    rows = []
    for i in range(n_docs):
        n_spans = 1 + (i * 7919) % 8
        spans = []
        off = 0
        for j in range(n_spans):
            kind = SPAN_KINDS[(i + j * 13) % len(SPAN_KINDS)]
            if kind == "text":
                k = (i * 31 + j * 17) % len(WORDS)
                text = " ".join(WORDS[(k + t) % len(WORDS)] for t in range((i + j) % 5 + 2))
                media = ""
            else:
                text = ""
                media = f"{kind}://bucket/{i % 97}/{(i * 131 + j) % 9973}.bin"
            spans.append((kind, text, media, off))
            off += 1 + len(text) + len(media)
        rows.append((f"doc-{i:08d}", spans))
    pdf = pd.DataFrame(rows, columns=["doc_id", "spans"])
    df = spark.createDataFrame(
        pdf,
        "doc_id string, spans array<struct<kind string, text string, "
        "media_ref string, offset int>>",
    )
    return df


def points_cloud(n: int = 20_000, seed: int = 42, planar: bool = False
                 ) -> pd.DataFrame:
    """Scattered points with smooth z + PSD per-point covariance."""
    rng = np.random.default_rng(seed)
    x = X0 + rng.uniform(0, EXTENT, n)
    y = Y0 + rng.uniform(0, EXTENT, n)
    if planar:
        z = 0.01 * (x - X0) - 0.02 * (y - Y0) + 5.0
    else:
        z = (
            10.0
            + 0.01 * (x - X0)
            + 0.005 * (y - Y0)
            + 1.5 * np.sin((x - X0) / 60.0) * np.cos((y - Y0) / 45.0)
            + 0.02 * rng.normal(0, 1, n)
        )
    # PSD 3x3: A A^T from a well-conditioned random factor
    a = rng.normal(0, 0.05, (n, 3, 3)) + 0.15 * np.eye(3)
    c = np.einsum("nij,nkj->nik", a, a)
    return pd.DataFrame(
        {
            "point_id": np.arange(n, dtype=np.int64),
            "x": x, "y": y, "z": z,
            "var_x": c[:, 0, 0], "var_y": c[:, 1, 1], "var_z": c[:, 2, 2],
            "cov_xy": c[:, 0, 1], "cov_xz": c[:, 0, 2], "cov_yz": c[:, 1, 2],
        }
    )
