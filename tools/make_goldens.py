"""Generate tests/golden/tin_var.parquet — the tin_var_kernel gate oracle.

The golden is computed by the GLOBAL-Delaunay NumPy path (one single
triangulation of the whole cloud, no partitioning/halo/cogroup), fully
independently of the distributed machinery the gate query exercises.
Inputs replicate gpiv_spark.queries_tin._points_df / _grid_df exactly
as a pure function of the documents row count, so one parquet (keyed by
n_docs) serves every test SF (sf0.001/sf0.01 -> 500 docs, sf0.1 -> 5000).

Run: python tools/make_goldens.py   (writes tests/golden/tin_var.parquet)
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from gpiv_spark.functions import geocode  # noqa: E402
from gpiv_spark.operators.tin import tin_numpy  # noqa: E402
from gpiv_spark import queries_tin as qt  # noqa: E402

X0, Y0 = geocode.X0, geocode.Y0


def golden_for(n_docs: int) -> pd.DataFrame:
    pid = np.arange(n_docs * qt._PPD, dtype=np.int64)
    x, y = geocode.numpy_geocode_q(pid)
    z = (5.0 + 0.01 * (x - X0) + 0.004 * (y - Y0)
         + 0.00005 * ((x - X0) * (y - Y0)))
    pts = np.column_stack([x, y, z])
    tpu = np.column_stack([
        (1 + pid % 7) * 0.0001,
        (1 + pid % 5) * 0.0001,
        (1 + pid % 3) * 0.0001,
        np.zeros_like(x), np.zeros_like(x), np.zeros_like(x),
    ])
    gy, gx = np.divmod(np.arange(qt._GN * qt._GN, dtype=np.int64), qt._GN)
    grid = np.column_stack([
        X0 + qt._GINSET + gx * qt._GSTEP,
        Y0 + qt._GINSET + gy * qt._GSTEP,
    ])
    zp, var, found = tin_numpy(pts, tpu, grid, np.asarray(qt._CEN))
    out = pd.DataFrame(
        {
            "n_docs": np.full(found.sum(), n_docs, dtype=np.int64),
            "grid_id": np.arange(qt._GN * qt._GN, dtype=np.int64)[found],
            "zp": np.round(zp[found], 6),
            "var_zp": np.round(var[found], 10),
        }
    )
    return out


def main() -> None:
    parts = [golden_for(n) for n in (500, 5000)]
    golden = pd.concat(parts, ignore_index=True)
    dest = Path(__file__).resolve().parent.parent / "tests" / "golden"
    dest.mkdir(exist_ok=True)
    golden.to_parquet(dest / "tin_var.parquet", index=False)
    print(f"wrote {dest / 'tin_var.parquet'}: "
          + ", ".join(f"n_docs={n}: {len(p)} rows"
                      for n, p in zip((500, 5000), parts)))


if __name__ == "__main__":
    main()
