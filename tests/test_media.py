"""Codec-free WAV/BMP round-trips: the decode path parses real bytes."""

import numpy as np
import pytest

from gpiv_spark.sources import media as md


def test_wav_roundtrip_exact():
    rng = np.random.default_rng(7)
    s = rng.integers(-32768, 32767, 1234).astype(np.int16)
    blob = md.encode_wav(s, sample_rate=8000)
    assert len(blob) == 44 + 2 * len(s)  # canonical header size
    out = md.decode_wav(blob)
    assert out["sample_rate"] == 8000
    assert out["n_samples"] == 1234
    np.testing.assert_array_equal(out["samples"], s)
    np.testing.assert_allclose(
        out["rms"], np.sqrt(np.mean(s.astype(np.float64) ** 2))
    )
    assert out["duration_sec"] == 1234 / 8000.0


def test_wav_chunk_walk_tolerates_extra_chunks():
    """Real-world WAVs carry LIST/INFO chunks between fmt and data."""
    import struct

    s = np.arange(-50, 50, dtype=np.int16)
    blob = md.encode_wav(s)
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # odd size+pad
    patched = blob[:36] + extra + blob[36:]
    patched = (
        patched[:4]
        + struct.pack("<I", len(patched) - 8)
        + patched[8:]
    )
    out = md.decode_wav(patched)
    np.testing.assert_array_equal(out["samples"], s)


def test_bmp_roundtrip_exact():
    rng = np.random.default_rng(11)
    for h, w in [(8, 8), (13, 17), (31, 9)]:  # odd widths hit row padding
        img = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        blob = md.encode_bmp(img)
        assert len(blob) == 54 + h * ((3 * w + 3) & ~3)
        out = md.decode_bmp(blob)
        assert (out["width"], out["height"]) == (w, h)
        np.testing.assert_array_equal(out["pixels"], img)
        np.testing.assert_allclose(
            out["mean_luma"], img.astype(np.float64).mean()
        )


def test_malformed_blobs_raise():
    with pytest.raises(md.MediaFormatError):
        md.decode_wav(b"RIFFxxxxNOPE" + b"\x00" * 64)
    with pytest.raises(md.MediaFormatError):
        md.decode_wav(b"\x00" * 10)
    with pytest.raises(md.MediaFormatError):
        md.decode_bmp(b"XX" + b"\x00" * 100)
    # 8-bit BMP rejected (only 24 bpp implemented)
    img = np.zeros((4, 4, 3), np.uint8)
    blob = bytearray(md.encode_bmp(img))
    blob[28] = 8  # bpp field
    with pytest.raises(md.MediaFormatError):
        md.decode_bmp(bytes(blob))


def test_synth_blob_matches_formula():
    """The fixture generator's decoded features equal the closed forms
    the driver-gate oracle replays in SQL."""
    for mnum in (0, 1, 97, 9972):
        wav = md.decode_wav(md.synth_media_blob("audio", mnum))
        n = 800 + mnum % 1600
        t = np.arange(n)
        s = ((mnum * 31 + t * 17) % 2001) - 1000
        assert wav["n_samples"] == n
        np.testing.assert_allclose(
            wav["rms"], np.sqrt(np.mean(s.astype(np.float64) ** 2))
        )
        bmp = md.decode_bmp(md.synth_media_blob("image", mnum))
        w, h = 8 + mnum % 24, 8 + (mnum // 7) % 24
        assert (bmp["width"], bmp["height"]) == (w, h)
        r = np.arange(h)[:, None]
        c = np.arange(w)[None, :]
        v = (mnum + r * 7 + c * 3) % 256
        np.testing.assert_allclose(bmp["mean_luma"], v.mean())


def test_resize_q10_equals_float_bilinear():
    """The exact-int64 q10 kernel is the float bilinear kernel x1024."""
    rng = np.random.default_rng(11)
    for _ in range(50):
        h = int(rng.integers(8, 32))
        w = int(rng.integers(8, 32))
        img = rng.integers(0, 256, (h, w)).astype(np.int64)
        q = md.resize_q10(img, 16, 16)
        f = md.resize_bilinear(img.astype(np.float64), 16, 16)
        np.testing.assert_allclose(q / 1024.0, f, rtol=0, atol=1e-12)


def test_resize_q10_identity_on_16x16():
    """Resizing a 16x16 image to 16x16 is the identity (x1024)."""
    rng = np.random.default_rng(12)
    img = rng.integers(0, 256, (16, 16)).astype(np.int64)
    np.testing.assert_array_equal(md.resize_q10(img, 16, 16), img * 1024)


def test_resize_q10_constant_image():
    """A constant image resizes to the same constant at any size."""
    for h, w in [(8, 8), (9, 31), (31, 9)]:
        img = np.full((h, w), 77, dtype=np.int64)
        np.testing.assert_array_equal(
            md.resize_q10(img, 16, 16), np.full((16, 16), 77 * 1024)
        )


def test_frame_energies_exact_vs_naive():
    rng = np.random.default_rng(13)
    for _ in range(20):
        n = int(rng.integers(256, 3000))
        s = rng.integers(-1000, 1001, n).astype(np.int16)
        e = md.frame_energies(s)
        nf = 1 + (n - 256) // 128
        assert len(e) == nf
        naive = np.array(
            [int((s[f * 128:f * 128 + 256].astype(np.int64) ** 2).sum())
             for f in range(nf)],
            dtype=np.int64,
        )
        np.testing.assert_array_equal(e, naive)


def test_frame_energies_short_signal():
    assert len(md.frame_energies(np.zeros(255, dtype=np.int16))) == 0
    assert len(md.frame_energies(np.zeros(256, dtype=np.int16))) == 1


def test_resize_features_batches_rejects_color():
    """The q10 luma path demands grey pixels (exact-integer contract)."""
    import pandas as pd

    img = np.zeros((8, 8, 3), dtype=np.uint8)
    img[0, 0] = (1, 2, 3)  # not grey: channel sum 6 % 3 == 0 -> craft 7
    img[0, 1] = (1, 2, 5)  # sum 8 % 3 != 0
    blob = md.encode_bmp(img)
    pdf = pd.DataFrame(
        {"doc_id": ["d"], "kind": ["image"], "media_ref": ["m"],
         "blob": [blob]}
    )
    with pytest.raises(md.MediaFormatError):
        list(md.resize_features_batches(iter([pdf])))


def test_avi_roundtrip_exact():
    rng = np.random.default_rng(21)
    fr = rng.integers(0, 256, (7, 13, 9, 3)).astype(np.uint8)
    out = md.decode_avi(md.encode_avi(fr, fps=12))
    assert (out["n_frames"], out["height"], out["width"], out["fps"]) == (7, 13, 9, 12)
    np.testing.assert_array_equal(out["frames"], fr)


def test_avi_malformed_raises():
    with pytest.raises(md.MediaFormatError):
        md.decode_avi(b"RIFF\x00\x00\x00\x00WAVE")
    with pytest.raises(md.MediaFormatError):
        md.decode_avi(b"nope")
    # truncated frame payload: declared dims no longer match bytes
    good = md.encode_avi(np.zeros((2, 8, 8, 3), dtype=np.uint8))
    with pytest.raises(md.MediaFormatError):
        md.decode_avi(good[:-10])
    # truncation straddling a chunk header must ALSO be the documented
    # error, not struct.error (the walk clamps to the real buffer)
    for cut in (195, len(good) - 13, len(good) - 60):
        with pytest.raises(md.MediaFormatError):
            md.decode_avi(good[:-cut] if cut < len(good) else good[:12])


def test_video_fixture_matches_formula():
    mnum = 321
    v = md.decode_avi(md.synth_media_blob("video", mnum))
    w, h, nf = 8 + mnum % 16, 8 + (mnum // 5) % 16, 4 + mnum % 13
    assert (v["width"], v["height"], v["n_frames"]) == (w, h, nf)
    f = np.arange(nf)[:, None, None]
    r = np.arange(h)[None, :, None]
    c = np.arange(w)[None, None, :]
    np.testing.assert_array_equal(
        v["frames"][..., 1], ((mnum + f * 11 + r * 7 + c * 3) % 256).astype(np.uint8)
    )


def test_video_features_stride_sampling():
    import pandas as pd

    blob = md.synth_media_blob("video", 10)  # nf = 4 + 10 % 13 = 14
    pdf = pd.DataFrame({"doc_id": ["d"], "media_ref": ["m"], "blob": [blob]})
    out = pd.concat(md.video_features_batches(iter([pdf])))
    assert list(out["frame_idx"]) == [0, 2, 4, 6, 8, 10, 12]
    v = md.decode_avi(blob)
    luma = v["frames"].astype(np.int64).sum(axis=3) // 3
    for _, row in out.iterrows():
        assert row["luma_sum"] == int(luma[row["frame_idx"]].sum())
