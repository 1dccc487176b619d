"""Minimal pure-NumPy GeoTIFF reader (S1/S2 on the reference's own data).

Reads exactly the encoding the reference repo's bundled fixtures use
(data/output/*.tif, produced by rasters.py via rasterio): single-band
float64, LZW compression, 256x256 tiles, no predictor, little-endian,
plus the GeoTIFF transform tags (ModelPixelScale 33550, ModelTiepoint
33922) and the GDAL nodata ASCII tag (42113). No rasterio/GDAL in this
container — ~150 lines of TIFF spec suffice for the golden e2e to run
on the actual reference rasters instead of synthetic ones.

Not a general TIFF library: unsupported layouts raise ValueError.
"""

from __future__ import annotations

import struct

import numpy as np


def _lzw_decode(buf: bytes) -> bytes:
    """TIFF-variant LZW: MSB-first codes, 9->12 bits, EARLY code-width
    change (the width bumps one code before the table fills)."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    value = 0
    bits = 0
    pos = 0
    nbits = 9
    table: list[bytes] = []
    prev: bytes | None = None
    n = len(buf)

    def reset():
        nonlocal table, nbits, prev
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        nbits = 9
        prev = None

    reset()
    while True:
        while bits < nbits:
            if pos >= n:
                return bytes(out)
            value = (value << 8) | buf[pos]
            pos += 1
            bits += 8
        bits -= nbits
        code = value >> bits
        value &= (1 << bits) - 1
        if code == EOI:
            return bytes(out)
        if code == CLEAR:
            reset()
            continue
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"corrupt LZW stream: code {code}")
        out += entry
        prev = entry
        # early change: TIFF writers bump the width when the NEXT code
        # would not fit, i.e. at table size 511/1023/2047
        if len(table) == (1 << nbits) - 1 and nbits < 12:
            nbits += 1


def _read_ifd(data: bytes, e: str, off: int) -> dict[int, tuple]:
    (n,) = struct.unpack_from(e + "H", data, off)
    sizes = {1: 1, 2: 1, 3: 2, 4: 4, 11: 4, 12: 8, 16: 8}
    fmts = {1: "B", 2: "c", 3: "H", 4: "I", 11: "f", 12: "d", 16: "Q"}
    tags: dict[int, tuple] = {}
    for i in range(n):
        tag, typ, cnt = struct.unpack_from(e + "HHI", data, off + 2 + i * 12)
        vo = off + 10 + i * 12
        nbytes = sizes.get(typ, 4) * cnt
        if nbytes > 4:
            (vo,) = struct.unpack_from(e + "I", data, vo)
        if typ == 2:
            raw = data[vo : vo + cnt]
            tags[tag] = (raw.split(b"\0")[0].decode("latin-1"),)
        else:
            tags[tag] = struct.unpack_from(e + str(cnt) + fmts[typ], data, vo)
    return tags


def read_geotiff(path: str) -> tuple[np.ndarray, dict]:
    """-> (float64 array (h, w), geo dict with ul_x/ul_y/pixel_*/nodata)."""
    with open(path, "rb") as f:
        data = f.read()
    if data[:2] == b"II":
        e = "<"
    elif data[:2] == b"MM":
        e = ">"
    else:
        raise ValueError("not a TIFF")
    magic, ifd_off = struct.unpack_from(e + "HI", data, 2)
    if magic != 42:
        raise ValueError("not a classic TIFF")
    t = _read_ifd(data, e, ifd_off)

    w, h = t[256][0], t[257][0]
    if t.get(258, (0,))[0] != 64 or t.get(339, (0,))[0] != 3:
        raise ValueError("only float64 sample format supported")
    comp = t.get(259, (1,))[0]
    if comp not in (1, 5):
        raise ValueError(f"unsupported compression {comp}")
    if t.get(317, (1,))[0] != 1:
        raise ValueError("predictor not supported")
    if t.get(277, (1,))[0] != 1:
        raise ValueError("single band only")

    arr = np.full((h, w), np.nan)
    if 322 in t:  # tiled
        tw, th = t[322][0], t[323][0]
        offs, cnts = t[324], t[325]
        ntx = (w + tw - 1) // tw
        for i, (o, c) in enumerate(zip(offs, cnts)):
            raw = data[o : o + c]
            if comp == 5:
                raw = _lzw_decode(raw)
            tile = np.frombuffer(raw, dtype=e + "f8",
                                 count=tw * th).reshape(th, tw)
            ty, tx = divmod(i, ntx)
            r0, c0 = ty * th, tx * tw
            arr[r0 : min(r0 + th, h), c0 : min(c0 + tw, w)] = tile[
                : min(th, h - r0), : min(tw, w - c0)
            ]
    else:  # stripped
        rps = t.get(278, (h,))[0]
        offs, cnts = t[273], t[279]
        for i, (o, c) in enumerate(zip(offs, cnts)):
            raw = data[o : o + c]
            if comp == 5:
                raw = _lzw_decode(raw)
            r0 = i * rps
            nrows = min(rps, h - r0)
            arr[r0 : r0 + nrows] = np.frombuffer(
                raw, dtype=e + "f8", count=nrows * w
            ).reshape(nrows, w)

    geo: dict = {}
    if 33550 in t and 33922 in t:
        sx, sy = t[33550][0], t[33550][1]
        # tiepoint: raster (i, j, k) -> model (x, y, z)
        i0, j0, _, mx, my, _ = t[33922][:6]
        geo = {
            "ul_x": mx - i0 * sx,
            "ul_y": my + j0 * sy,
            "pixel_width": sx,
            "pixel_height": sy,
        }
    if 42113 in t:
        try:
            geo["nodata"] = float(t[42113][0])
        except ValueError:
            pass
    return arr, geo
