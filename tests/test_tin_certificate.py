"""Halo-sufficiency certificate for the distributed Delaunay build.

The per-cell kernel certifies each OWNED triangle by checking that its
circumcircle — clamped to the data bbox, where points can exist — fits
inside the cell+halo region the kernel actually saw (operators/tin.py,
_cell_blob). build_broadcast_pack(certify=True) then retries failed
cells with doubled halos until every owned triangle certifies, which is
what makes a density-adaptive halo SAFE: certified triangles are
provably in the global Delaunay no matter how small the starting halo
was (soundness); only the thin band between local and global convex
hulls is not claimed (F4 hull probes there return NULL either way).
"""

import numpy as np
import pytest

from gpiv_spark.functions import delaunay as dl
from gpiv_spark.functions import geocode
from gpiv_spark.operators.tin import _EXT, _X0, _Y0, build_broadcast_pack

TPU_DEFAULTS = {
    "var_x": 0.0001, "var_y": 0.0002, "var_z": 0.0003,
    "cov_xy": 0.0, "cov_xz": 0.0, "cov_yz": 0.0,
}


def _cloud_df(spark, n, seed=11, stray=False):
    import pandas as pd

    rng = np.random.default_rng(seed)
    pdf = pd.DataFrame({
        "pid": np.arange(n, dtype=np.int64),
        "x": _X0 + rng.random(n) * _EXT,
        "y": _Y0 + rng.random(n) * _EXT,
        "z": rng.random(n) * 10.0,
    })
    for c, v in TPU_DEFAULTS.items():
        pdf[c] = v
    if stray:
        pdf.loc[0, "x"] = _X0 - 25.0  # outside the nominal extent
    return pdf, spark.createDataFrame(pdf)


def _pack_triples(pack, pids_sorted):
    return {tuple(sorted(pids_sorted[row])) for row in pack["tv"].tolist()}


def _global_triples(pdf):
    p = pdf[["x", "y"]].to_numpy(np.float64)
    tri = dl.delaunay(p)
    pid = pdf["pid"].to_numpy(np.int64)
    return {tuple(sorted(pid[row])) for row in tri.tolist()}


@pytest.mark.parametrize("halo", [2.0, 0.1])
def test_certified_pack_is_sound_subset_of_global(spark, halo):
    """Whatever the starting halo — even one far below the point
    spacing — the certified build emits only triangles of the GLOBAL
    Delaunay (retries repair undersized halos), and misses at most a
    sliver-thin hull band."""
    pdf, points = _cloud_df(spark, 4000, seed=7)
    bc = build_broadcast_pack(spark, points, cell_res=4, index_res=8,
                              halo_m=halo, id_col="pid", certify=True)
    pack = bc.value
    bc.destroy()
    got = _pack_triples(pack, np.sort(pdf["pid"].to_numpy(np.int64)))
    want = _global_triples(pdf)
    rogue = got - want
    assert not rogue, f"{len(rogue)} non-global triangles emitted"
    missing = want - got
    assert len(missing) < 0.002 * len(want), (
        f"hull-band completeness gap too large: {len(missing)}")


def test_uncertified_small_halo_emits_rogue_triangles(spark):
    """Control for the test above: WITHOUT certification the same
    undersized halo produces triangles that are not in the global
    Delaunay — the certificate is what's doing the work."""
    pdf, points = _cloud_df(spark, 4000, seed=7)
    bc = build_broadcast_pack(spark, points, cell_res=4, index_res=8,
                              halo_m=0.1, id_col="pid", certify=False)
    pack = bc.value
    bc.destroy()
    got = _pack_triples(pack, np.sort(pdf["pid"].to_numpy(np.int64)))
    assert got - _global_triples(pdf), "expected rogue triangles at halo=0.1"


def test_stray_points_void_bbox_clamp(spark):
    """A point outside the nominal extent makes the certificate's bbox
    clamp unsound; certify must refuse rather than certify wrongly."""
    _, points = _cloud_df(spark, 500, seed=3, stray=True)
    with pytest.raises(ValueError, match="outside the nominal extent"):
        build_broadcast_pack(spark, points, cell_res=4, index_res=8,
                             halo_m=2.0, id_col="pid", certify=True)


def test_certified_build_total_on_clustered_cloud(spark):
    """Clustered clouds (big inter-cluster voids => huge circumcircles
    everywhere) exercise the whole repair ladder: halo doubling, then
    grid auto-coarsening. The build must still terminate and emit only
    globally-Delaunay triangles."""
    import pandas as pd

    rng = np.random.default_rng(23)
    centers = np.stack([_X0 + rng.random(5) * _EXT,
                        _Y0 + rng.random(5) * _EXT], axis=1)
    pts = np.concatenate([
        c + rng.normal(0, _EXT * 0.02, (300, 2)) for c in centers
    ])
    pts = np.clip(pts, [_X0, _Y0],
                  [_X0 + _EXT * 0.999, _Y0 + _EXT * 0.999])
    pdf = pd.DataFrame({
        "pid": np.arange(len(pts), dtype=np.int64),
        "x": pts[:, 0], "y": pts[:, 1],
        "z": rng.random(len(pts)),
    })
    for c, v in TPU_DEFAULTS.items():
        pdf[c] = v
    bc = build_broadcast_pack(spark, spark.createDataFrame(pdf),
                              cell_res=3, index_res=8, halo_m=1.0,
                              id_col="pid", certify=True)
    pack = bc.value
    bc.destroy()
    got = _pack_triples(pack, np.sort(pdf["pid"].to_numpy(np.int64)))
    want = _global_triples(pdf)
    assert not (got - want), "rogue triangles on clustered cloud"
    assert len(want - got) < 0.01 * len(want)
