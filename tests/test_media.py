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
