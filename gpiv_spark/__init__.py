"""gpiv_spark — a from-scratch PySpark-native spatial-join + tiling engine.

Re-expresses the query/data-processing capabilities of the reference
(NimaEkhtari/GPIV, a single-threaded NumPy PIV / TIN error-propagation
tool) as an idiomatic, distributed Spark engine:

- documents (interleaved text+media spans) -> deterministic geocode ->
  H3/S2-style cell index (Z-order quadkey + axial hex) -> spatial joins
  (point-in-polygon, kNN) -> GPIV displacement-grid tile assignment;
- point cloud -> per-cell Delaunay TIN -> plane interpolation ->
  closed-form Jacobian variance propagation (ref tin_interpolation.py);
- raster pair -> tiles with halo -> per-tile NCC + sub-pixel peak +
  covariance propagation (ref piv_functions.py);
- training-data ops: dedup (exact / minhash-LSH / simhash / n-gram
  jaccard), ANN cosine top-k, text quality/language/tokens.

Design stance (SURVEY.md §7): zero per-row Python. Scalar math is
Catalyst column arithmetic generated from ONE dialect-neutral SQL
template (gpiv_spark.dialect) rendered to both Spark and DuckDB so the
engine and its oracle cannot drift. Heavy numeric kernels are batched
NumPy inside applyInPandas grouped by spatial cell/tile.
"""

__version__ = "0.1.0"
