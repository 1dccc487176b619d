"""LAZ (LASzip-architecture) codec: exact round-trips, container
checks, Spark table parity (reference twin: run_test_v1.py:44 reads
.laz via PDAL). No golden .laz exists in the reference clone, so per
the round-4 review the validation bar is encode->decode equality on
synthetic clouds, plus the container-level walk shared with read_las."""

import numpy as np
import pandas as pd
import pytest

from gpiv_spark.sources.las import read_las, write_las
from gpiv_spark.sources.laz import (
    parse_laszip_vlr,
    laszip_vlr_body,
    write_laz,
)


def _cloud(n, seed=7, coherent=True):
    rng = np.random.default_rng(seed)
    if coherent:  # random walk — realistic lidar scan ordering
        x = 500000 + np.cumsum(rng.normal(0, 0.4, n))
        y = 3200000 + np.cumsum(rng.normal(0, 0.4, n))
        z = 100 + np.cumsum(rng.normal(0, 0.05, n))
    else:
        x = rng.uniform(0, 1000, n)
        y = rng.uniform(0, 1000, n)
        z = rng.uniform(0, 100, n)
    return x, y, z


TPU = ("VarianceX", "VarianceY", "VarianceZ",
       "CovarianceXY", "CovarianceXZ", "CovarianceYZ")


def _tpu(n, seed=11):
    rng = np.random.default_rng(seed)
    return {nm: np.abs(rng.normal(0.01, 0.002, n)) if nm.startswith("V")
            else rng.normal(0, 1e-4, n) for nm in TPU}


@pytest.mark.parametrize("n,chunk,coherent", [
    (0, 100, True), (1, 100, True), (2, 100, True),
    (100, 100, True),      # n == chunk exactly
    (101, 100, True),      # one-point trailing chunk
    (5000, 2000, True),
    (3000, 50_000, False),  # incoherent data, single chunk
])
def test_laz_round_trip_exact(n, chunk, coherent):
    x, y, z = _cloud(n, coherent=coherent)
    extra = _tpu(n) if n else None
    laz = write_laz(x, y, z, extra, chunk_size=chunk)
    las = write_las(x, y, z, extra)
    pd.testing.assert_frame_equal(read_las(laz), read_las(las))


def test_laz_model_boundary_pressure():
    """Long single-chunk stream drives every adaptive model through
    many halving/rebuild cycles (the state that wedged the coder before
    the repeated-halving fix) — must stay exact."""
    n = 30_000
    x, y, z = _cloud(n)
    extra = _tpu(n)
    laz = write_laz(x, y, z, extra, chunk_size=n)
    pd.testing.assert_frame_equal(
        read_las(laz), read_las(write_las(x, y, z, extra))
    )


def test_laz_compresses_coherent_xyz():
    """The point of the codec: a coherent cloud's 20-byte records
    shrink several-fold (extra-byte doubles are high-entropy and set
    the floor, so measure xyz-only)."""
    n = 20_000
    x, y, z = _cloud(n)
    laz = write_laz(x, y, z)
    las = write_las(x, y, z)
    assert len(laz) < 0.45 * len(las), (len(laz), len(las))


def test_laz_container_shape():
    """Compressed-format bit + laszip/22204 VLR, parseable layout."""
    x, y, z = _cloud(50)
    blob = write_laz(x, y, z, _tpu(50))
    assert blob[:4] == b"LASF"
    assert blob[104] & 0x80  # compressed point format
    info = parse_laszip_vlr(laszip_vlr_body(6, 50_000))
    assert info["compressor"] == 2 and info["coder"] == 0
    assert info["chunk_size"] == 50_000
    # POINT10 + BYTE items, sizes 20 and 48
    assert [(t, s) for t, s, v in info["items"]] == [(6, 20), (0, 48)]


def test_laz_without_vlr_rejected():
    """A compressed-format bit with no laszip VLR is malformed."""
    from gpiv_spark.sources.las import LasFormatError

    x, y, z = _cloud(10)
    blob = bytearray(write_las(x, y, z))
    blob[104] |= 0x80
    with pytest.raises(LasFormatError, match="laszip"):
        read_las(bytes(blob))


def test_laz_table_chunk_splits_match_whole_file(spark, tmp_path):
    """laz_table decodes chunk SPLITS in parallel (one giant .laz must
    not serialize onto one worker); its table must equal las_table's
    whole-file decode row-for-row, including global point_id order
    across multiple files."""
    from gpiv_spark.sources.las import las_table
    from gpiv_spark.sources.laz import laz_table

    for seed, fname in ((5, "a.laz"), (9, "b.laz")):
        n = 700
        x, y, z = _cloud(n, seed=seed)
        (tmp_path / fname).write_bytes(
            write_laz(x, y, z, _tpu(n, seed=seed), chunk_size=150))
    whole = las_table(spark, str(tmp_path)).toPandas().sort_values(
        "point_id").reset_index(drop=True)
    split = laz_table(spark, str(tmp_path)).toPandas().sort_values(
        "point_id").reset_index(drop=True)
    assert len(split) == 1400
    pd.testing.assert_frame_equal(split, whole)


def test_laz_planning_scan_prunes_content(spark, tmp_path):
    """laz_table's planning stage claims 'paths, not bytes': the
    binaryFile scan under the split-planning mapInPandas must prune
    the content column away (the workers open+seek the files
    themselves; Spark should never materialize the blobs)."""
    x, y, z = _cloud(60)
    (tmp_path / "c.laz").write_bytes(write_laz(x, y, z, chunk_size=25))
    files = spark.read.format("binaryFile").load(str(tmp_path))
    plan = files.select("path")._sc._jvm.PythonSQLUtils.explainString(
        files.select("path")._jdf.queryExecution(), "formatted"
    )
    assert "content" not in plan, plan


def test_laz_table_rejects_uncompressed(spark, tmp_path):
    from gpiv_spark.sources.laz import laz_table

    x, y, z = _cloud(20)
    (tmp_path / "plain.las").write_bytes(write_las(x, y, z))
    with pytest.raises(Exception, match="not a LAZ blob"):
        laz_table(spark, str(tmp_path)).count()


def test_las_table_reads_laz_and_las_mixed(spark, tmp_path):
    """The Spark S1 path treats .laz like .las: same binaryFile +
    mapInPandas decode, one task per file, identical table out."""
    from gpiv_spark.sources.las import las_table

    n = 400
    x, y, z = _cloud(n, seed=3)
    tpu = {nm: arr for nm, arr in zip(
        TPU, (np.full(n, 1e-4), np.full(n, 2e-4), np.full(n, 3e-4),
              np.zeros(n), np.zeros(n), np.zeros(n)))}
    (tmp_path / "a.las").write_bytes(write_las(x[:200], y[:200], z[:200],
                                               {k: v[:200] for k, v in tpu.items()}))
    (tmp_path / "b.laz").write_bytes(write_laz(x[200:], y[200:], z[200:],
                                               {k: v[200:] for k, v in tpu.items()},
                                               chunk_size=150))
    df = las_table(spark, str(tmp_path)).toPandas().sort_values(
        "point_id").reset_index(drop=True)
    assert len(df) == n
    # a.las sorts before b.laz -> global ids follow file order; both
    # formats descale to the same 1 mm quantization
    np.testing.assert_allclose(df["x"][:200], x[:200], atol=1e-3)
    np.testing.assert_allclose(df["x"][200:], x[200:], atol=1e-3)
    assert (df["var_x"] > 0).all()
