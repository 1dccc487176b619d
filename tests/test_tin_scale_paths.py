"""The two doc-scale TIN paths (shuffle equi+refine join, broadcast
index probe) must agree with each other and interpolate planes exactly."""

import numpy as np
import pyspark.sql.functions as F
import pytest

from gpiv_spark.dialect import SPARK as d
from gpiv_spark.functions import geocode
from gpiv_spark.operators.tin import (
    build_triangles,
    propagate_at,
    propagate_at_broadcast,
)

X0, Y0 = geocode.X0, geocode.Y0
CEN = (X0 + 239.0, Y0 + 239.0, 7.0)


@pytest.fixture(scope="module")
def tris(spark):
    pts = spark.range(20_000).select(F.col("id").alias("pid"))
    px = geocode.xq_expr(d, "pid")
    py = geocode.yq_expr(d, "pid")
    points = pts.select(
        F.expr(px).alias("x"),
        F.expr(py).alias("y"),
        F.expr(f"0.01 * ({px} - {X0!r}) - 0.02 * ({py} - {Y0!r}) + 5.0").alias("z"),
        F.expr("(1 + pid % 7) * 0.0001").alias("var_x"),
        F.expr("(1 + pid % 5) * 0.0001").alias("var_y"),
        F.expr("(1 + pid % 3) * 0.0001").alias("var_z"),
        F.lit(0.0).alias("cov_xy"),
        F.lit(0.0).alias("cov_xz"),
        F.lit(0.0).alias("cov_yz"),
    )
    t = build_triangles(spark, points, cell_res=3, halo_m=8.0).cache()
    t.count()
    yield t
    t.unpersist()


@pytest.fixture(scope="module")
def docs(spark):
    return spark.range(5_000).select(
        F.col("id").alias("doc_id"),
        F.expr(geocode.x_expr(d, "id")).alias("x"),
        F.expr(geocode.y_expr(d, "id")).alias("y"),
    )


def test_shuffle_path_plane_exact(spark, tris, docs):
    res = propagate_at(docs, tris, index_res=8, centroid=CEN).toPandas()
    assert len(res) > 4900  # nearly all docs inside the hull
    expected = 0.01 * (res["zp"] * 0)  # placeholder shape
    dgeo = docs.toPandas().set_index("doc_id")
    exp = 0.01 * (dgeo.loc[res["doc_id"], "x"].to_numpy() - X0) - 0.02 * (
        dgeo.loc[res["doc_id"], "y"].to_numpy() - Y0
    ) + 5.0
    np.testing.assert_allclose(res["zp"], exp, atol=1e-7)
    assert (res["var_zp"] > 0).all()


def test_broadcast_path_matches_shuffle_path(spark, tris, docs):
    a = (
        propagate_at(docs, tris, index_res=8, centroid=CEN)
        .toPandas().set_index("doc_id").sort_index()
    )
    b = (
        propagate_at_broadcast(spark, docs, tris, index_res=8, centroid=CEN)
        .toPandas().set_index("doc_id").sort_index()
    )
    assert len(a) == len(b)
    np.testing.assert_allclose(a["zp"], b["zp"], atol=1e-9)
    # var depends on WHICH triangle is picked on shared edges; interior
    # docs pick identically, tolerate a tiny disagreement fraction
    close = np.isclose(a["var_zp"], b["var_zp"], rtol=1e-6)
    assert close.mean() > 0.999


def test_normalized_pack_matches_dense_pack(spark, tris, docs):
    """The (points + vertex-index) pack must produce identical results
    to the denormalized per-triangle pack."""
    import pandas as pd
    import pyspark.sql.functions as FF

    from gpiv_spark.operators.tin import (
        _probe_batch,
        build_triangle_ids,
        pack_triangle_index,
        pack_triangle_index_normalized,
    )

    pts = spark.range(20_000).select(FF.col("id").alias("pid"))
    px = geocode.xq_expr(d, "pid")
    py = geocode.yq_expr(d, "pid")
    points = pts.select(
        FF.col("pid"),
        FF.expr(px).alias("x"),
        FF.expr(py).alias("y"),
        FF.expr(f"0.01 * ({px} - {X0!r}) - 0.02 * ({py} - {Y0!r}) + 5.0").alias("z"),
        FF.expr("(1 + pid % 7) * 0.0001").alias("var_x"),
        FF.expr("(1 + pid % 5) * 0.0001").alias("var_y"),
        FF.expr("(1 + pid % 3) * 0.0001").alias("var_z"),
        FF.lit(0.0).alias("cov_xy"),
        FF.lit(0.0).alias("cov_xz"),
        FF.lit(0.0).alias("cov_yz"),
    )
    tri_ids = build_triangle_ids(spark, points, cell_res=3, halo_m=8.0,
                                 id_col="pid")
    pack_n = pack_triangle_index_normalized(
        tri_ids.toPandas(), points.toPandas(), index_res=8, id_col="pid"
    )
    pack_d = pack_triangle_index(tris.toPandas(), index_res=8)

    dpdf = docs.toPandas()
    xv = dpdf["x"].to_numpy()
    yv = dpdf["y"].to_numpy()
    zp_n, var_n, f_n = _probe_batch(pack_n, xv, yv, CEN)
    zp_d, var_d, f_d = _probe_batch(pack_d, xv, yv, CEN)
    # both triangulations come from the same points (possibly different
    # insertion partitioning at different cell_res), so compare on the
    # plane-exact zp where both found
    both = f_n & f_d
    assert both.mean() > 0.97
    np.testing.assert_allclose(zp_n[both], zp_d[both], atol=1e-7)
    assert (var_n[both] > 0).all()


def _point_df(spark, n):
    import pyspark.sql.functions as FF

    pts = spark.range(n).select(FF.col("id").alias("pid"))
    px = geocode.xq_expr(d, "pid")
    py = geocode.yq_expr(d, "pid")
    return pts.select(
        FF.col("pid"),
        FF.expr(px).alias("x"),
        FF.expr(py).alias("y"),
        FF.expr(f"0.01 * ({px} - {X0!r}) - 0.02 * ({py} - {Y0!r}) + 5.0").alias("z"),
        FF.expr("(1 + pid % 7) * 0.0001").alias("var_x"),
        FF.expr("(1 + pid % 5) * 0.0001").alias("var_y"),
        FF.expr("(1 + pid % 3) * 0.0001").alias("var_z"),
        FF.lit(0.0).alias("cov_xy"),
        FF.lit(0.0).alias("cov_xz"),
        FF.lit(0.0).alias("cov_yz"),
    )


def test_blob_pack_identical_to_driver_pack(spark, docs):
    """The distributed per-cell blob pack must reproduce the old
    driver-side pack EXACTLY — same arrays, same probe output — so the
    round-2 build-path change is a pure physical-plan swap."""
    from gpiv_spark.operators.tin import (
        _probe_batch,
        build_pack_blobs,
        build_triangle_ids,
        merge_pack_blobs,
        pack_triangle_index_normalized,
    )

    points = _point_df(spark, 20_000)
    tri_ids = build_triangle_ids(spark, points, cell_res=3, halo_m=8.0,
                                 id_col="pid")
    pack_old = pack_triangle_index_normalized(
        tri_ids.toPandas(), points.toPandas(), index_res=8, id_col="pid"
    )
    blobs = build_pack_blobs(spark, points, cell_res=3, index_res=8,
                             halo_m=8.0, id_col="pid")
    pack_new = merge_pack_blobs(blobs.toArrow(), index_res=8)

    for key in ("px", "py", "pz", "offsets", "cell_tri", "tv",
                "x1", "y1", "x2", "y2", "x3", "y3"):
        np.testing.assert_array_equal(pack_old[key], pack_new[key], err_msg=key)

    dpdf = docs.toPandas()
    xv, yv = dpdf["x"].to_numpy(), dpdf["y"].to_numpy()
    zo, vo, fo = _probe_batch(pack_old, xv, yv, CEN)
    zn, vn, fn = _probe_batch(pack_new, xv, yv, CEN)
    np.testing.assert_array_equal(fo, fn)
    np.testing.assert_array_equal(zo, zn)
    np.testing.assert_array_equal(vo, vn)


def test_run_pipeline_entry_switch(spark, monkeypatch, tmp_path, capsys):
    """The spark-submit entry ships the size-switched physical plan:
    broadcast branch = distributed pack blobs (checkpointed, no triangle
    toArrow), shuffle branch = distributed equi-join; both resumable."""
    import json
    import sys as _sys

    from pyspark.sql import SparkSession

    import jobs.run_pipeline as rp

    monkeypatch.setattr(SparkSession, "stop", lambda self: None)

    def run(argv):
        monkeypatch.setattr(_sys, "argv", ["run_pipeline.py"] + argv)
        rp.main()
        return json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    ck = str(tmp_path / "ckpt")
    base = ["--docs", "20000", "--points", "4000", "--checkpoint", ck]
    r1 = run(base)
    assert r1["mode"] == "bcast"
    assert r1["resumed"] == {"pack_blobs": False, "propagated": False}
    assert (tmp_path / "ckpt" / "pack_blobs" / "data").exists()
    assert r1["n_docs_out"] > 0.9 * 20000  # hull-edge docs drop (4k-pt TIN)

    r2 = run(base)  # same args -> full resume, identical output
    assert r2["resumed"] == {"pack_blobs": True, "propagated": True}
    assert r2["n_docs_out"] == r1["n_docs_out"]
    assert r2["mean_var"] == r1["mean_var"]

    r3 = run(base + ["--broadcast-budget-mb", "0"])  # forced shuffle path
    assert r3["mode"] == "shuffle"
    assert r3["resumed"] == {"triangles": False, "propagated": False}
    assert r3["n_docs_out"] == r1["n_docs_out"]
    np.testing.assert_allclose(r3["mean_var"], r1["mean_var"], rtol=1e-6)

    # LAS-sourced points through the same entry (S1 on the real format)
    from gpiv_spark import fixtures
    from gpiv_spark.sources import las as lasmod

    cloud = fixtures.points_cloud(n=4000, seed=5, planar=True)
    (tmp_path / "pts.las").write_bytes(
        lasmod.write_las(
            cloud["x"].to_numpy(), cloud["y"].to_numpy(),
            cloud["z"].to_numpy(),
            extra={
                eb: cloud[t].to_numpy()
                for eb, t in zip(
                    ["VarianceX", "VarianceY", "VarianceZ",
                     "CovarianceXY", "CovarianceXZ", "CovarianceYZ"],
                    ["var_x", "var_y", "var_z",
                     "cov_xy", "cov_xz", "cov_yz"],
                )
            },
        )
    )
    r4 = run(["--docs", "20000", "--checkpoint", str(tmp_path / "ck2"),
              "--las", str(tmp_path / "pts.las")])
    assert r4["mode"] == "bcast"
    assert r4["n_docs_out"] > 0.9 * 20000


def test_propagate_auto_switches_paths(spark, docs):
    """Budget above/below the estimated pack size selects broadcast vs
    shuffle, and both agree on the interpolated plane."""
    from gpiv_spark.operators.tin import propagate_auto

    points = _point_df(spark, 20_000)
    a, mode_a = propagate_auto(spark, docs, points, cell_res=3, index_res=8,
                               halo_m=8.0, id_col="pid", centroid=CEN)
    assert mode_a == "broadcast"
    b, mode_b = propagate_auto(spark, docs, points, cell_res=3, index_res=8,
                               halo_m=8.0, id_col="pid", centroid=CEN,
                               broadcast_budget_bytes=1024)
    assert mode_b == "shuffle"
    pa = a.toPandas().set_index("doc_id").sort_index()
    pb = b.toPandas().set_index("doc_id").sort_index()
    assert len(pa) == len(pb) and len(pa) > 4900
    np.testing.assert_allclose(pa["zp"], pb["zp"], atol=1e-9)
