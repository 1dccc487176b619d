"""Codec-free media decode: RIFF/PCM WAV and 24-bit BMP in pure NumPy.

North-rule multimodal requirement (media columns are opaque binary +
typed metadata; decode/feature-extract runs as Arrow-batched kernels).
This module replaces the round-1/2 deterministic *stub* with REAL
container parsing — the same struct-parsing discipline as
sources/geotiff.py: both formats are fixed-layout headers + raw sample
data, so no codec library is needed.

- ``encode_wav`` / ``decode_wav``: RIFF little-endian, PCM 16-bit mono
  (chunk walk tolerates extra chunks; validates RIFF/WAVE/fmt magic).
- ``encode_bmp`` / ``decode_bmp``: BITMAPFILEHEADER + BITMAPINFOHEADER,
  24 bpp bottom-up, 4-byte row padding.
- ``synth_media_blob``: the deterministic fixture generator (signal is
  a pure integer function of the media id so the driver gate can replay
  every feature in SQL), used where a real deployment would read the
  Iceberg binary column.
- ``decode_features_batches``: the mapInPandas kernel — parses actual
  bytes, emits (kind, n_bytes, feat) rows.

Reference twin: none (GPIV has no media path); this is the engine's
training-data-pipeline surface.
"""

from __future__ import annotations

import struct

import numpy as np

SAMPLE_RATE = 8000


class MediaFormatError(ValueError):
    """Malformed container bytes."""


# --------------------------------------------------------------------------
# WAV (RIFF/PCM, 16-bit mono)
# --------------------------------------------------------------------------

def encode_wav(samples: np.ndarray, sample_rate: int = SAMPLE_RATE) -> bytes:
    """int16 mono samples -> canonical 44-byte-header RIFF/WAVE blob."""
    s = np.asarray(samples, dtype="<i2")
    data = s.tobytes()
    byte_rate = sample_rate * 2
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate,
                                byte_rate, 2, 16)
    return hdr + fmt + b"data" + struct.pack("<I", len(data)) + data


def decode_wav(blob: bytes) -> dict:
    """Parse RIFF/WAVE PCM: walks chunks, returns samples + metadata."""
    if len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise MediaFormatError("not a RIFF/WAVE blob")
    pos = 12
    sample_rate = channels = bits = None
    samples = None
    while pos + 8 <= len(blob):
        cid = blob[pos : pos + 4]
        (size,) = struct.unpack_from("<I", blob, pos + 4)
        body = blob[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt_tag, channels, sample_rate = struct.unpack_from("<HHI", body, 0)
            (bits,) = struct.unpack_from("<H", body, 14)
            if fmt_tag != 1:
                raise MediaFormatError(f"unsupported WAV format tag {fmt_tag}")
        elif cid == b"data":
            if bits != 16 or channels != 1:
                raise MediaFormatError(
                    f"only 16-bit mono PCM supported (got {bits}/{channels})"
                )
            samples = np.frombuffer(body, dtype="<i2")
        pos += 8 + size + (size & 1)  # RIFF chunks are word-aligned
    if sample_rate is None or samples is None:
        raise MediaFormatError("missing fmt/data chunk")
    return {
        "sample_rate": int(sample_rate),
        "n_samples": int(len(samples)),
        "samples": samples,
        "duration_sec": len(samples) / float(sample_rate),
        "rms": float(np.sqrt(np.mean(samples.astype(np.float64) ** 2)))
        if len(samples) else 0.0,
    }


# --------------------------------------------------------------------------
# BMP (24 bpp bottom-up)
# --------------------------------------------------------------------------

def encode_bmp(img: np.ndarray) -> bytes:
    """uint8 (h, w, 3) RGB -> 24-bit BMP (BGR, bottom-up, padded rows)."""
    img = np.asarray(img, dtype=np.uint8)
    h, w, _ = img.shape
    row_bytes = (3 * w + 3) & ~3
    pixel_bytes = row_bytes * h
    file_size = 54 + pixel_bytes
    fh = b"BM" + struct.pack("<IHHI", file_size, 0, 0, 54)
    ih = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, pixel_bytes,
                     2835, 2835, 0, 0)
    rows = np.zeros((h, row_bytes), dtype=np.uint8)
    rows[:, : 3 * w] = img[::-1, :, ::-1].reshape(h, 3 * w)  # bottom-up BGR
    return fh + ih + rows.tobytes()


def decode_bmp(blob: bytes) -> dict:
    """Parse 24-bit uncompressed BMP -> (h, w, 3) RGB + luma stats."""
    if len(blob) < 54 or blob[:2] != b"BM":
        raise MediaFormatError("not a BMP blob")
    (data_off,) = struct.unpack_from("<I", blob, 10)
    hdr_size, w, h = struct.unpack_from("<Iii", blob, 14)
    planes, bpp = struct.unpack_from("<HH", blob, 26)
    (compression,) = struct.unpack_from("<I", blob, 30)
    if hdr_size < 40 or planes != 1 or bpp != 24 or compression != 0:
        raise MediaFormatError(
            f"only 24-bit uncompressed BMP supported (hdr={hdr_size} "
            f"bpp={bpp} comp={compression})"
        )
    bottom_up = h > 0
    h = abs(h)
    row_bytes = (3 * w + 3) & ~3
    raw = np.frombuffer(blob, dtype=np.uint8,
                        count=row_bytes * h, offset=data_off)
    rows = raw.reshape(h, row_bytes)[:, : 3 * w].reshape(h, w, 3)
    img = rows[::-1, :, ::-1] if bottom_up else rows[:, :, ::-1]  # -> RGB
    # integer-exact mean luma on the raw channel values (the fixture
    # writes r=g=b so luma == channel value; oracle replays it in SQL)
    return {
        "width": int(w),
        "height": int(h),
        "pixels": img,
        "mean_luma": float(img.astype(np.float64).mean()),
    }


# --------------------------------------------------------------------------
# Deterministic fixture blobs (the "Iceberg binary column" stand-in)
# --------------------------------------------------------------------------

def synth_media_blob(kind: str, mnum: int) -> bytes:
    """Deterministic container bytes for media id ``mnum``.

    The SIGNAL is a pure integer function of (mnum, position) so the
    driver gate can replay every decoded feature in closed-form SQL —
    while the engine path must parse the actual container to get at it.

    audio: n = 800 + mnum % 1600 samples, s_t = ((mnum*31 + t*17) % 2001) - 1000
    image: w = 8 + mnum % 24, h = 8 + (mnum // 7) % 24,
           grey pixel v(r,c) = (mnum + r*7 + c*3) % 256
    """
    if kind == "audio":
        n = 800 + mnum % 1600
        t = np.arange(n, dtype=np.int64)
        s = ((mnum * 31 + t * 17) % 2001) - 1000
        return encode_wav(s.astype(np.int16))
    if kind == "image":
        w = 8 + mnum % 24
        h = 8 + (mnum // 7) % 24
        r = np.arange(h, dtype=np.int64)[:, None]
        c = np.arange(w, dtype=np.int64)[None, :]
        v = ((mnum + r * 7 + c * 3) % 256).astype(np.uint8)
        return encode_bmp(np.repeat(v[:, :, None], 3, axis=2))
    raise ValueError(f"unknown media kind {kind!r}")


def decode_features_batches(batches):
    """mapInPandas kernel: (doc_id, kind, media_ref, blob) -> features.

    Parses REAL container bytes per row (WAV for audio, BMP for image);
    feat is rms for audio and mean_luma for image — one comparable
    double per row alongside the container byte count.
    """
    import pandas as pd

    for pdf in batches:
        feats = np.empty(len(pdf), dtype=np.float64)
        nbytes = np.empty(len(pdf), dtype=np.int64)
        kinds = pdf["kind"].to_numpy()
        blobs = pdf["blob"].to_numpy()
        for i, (kind, blob) in enumerate(zip(kinds, blobs)):
            b = bytes(blob)
            nbytes[i] = len(b)
            if kind == "audio":
                feats[i] = decode_wav(b)["rms"]
            else:
                feats[i] = decode_bmp(b)["mean_luma"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "kind": pdf["kind"],
                "n_bytes": nbytes,
                "feat": feats,
            }
        )
