"""Minimal pure-NumPy GeoTIFF reader AND writer (S1-S3 I/O surface).

Reads exactly the encoding the reference repo's bundled fixtures use
(data/output/*.tif, produced by rasters.py via rasterio): single-band
float64, LZW compression, 256x256 tiles, no predictor, little-endian,
plus the GeoTIFF transform tags (ModelPixelScale 33550, ModelTiepoint
33922) and the GDAL nodata ASCII tag (42113). No rasterio/GDAL in this
container — ~150 lines of TIFF spec suffice for the golden e2e to run
on the actual reference rasters instead of synthetic ones.

``write_geotiff`` is the exact inverse for the raster SINK (the
reference's rasters.py:21-43 emits .tif via rasterio; round 3 wrote
parquet tiles + JSON sidecar only): striped single-band float64
little-endian, optional TIFF-LZW, same transform/nodata tags, so
read(write(arr, geo)) round-trips bit-exactly through this module.

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
        if typ not in fmts:
            # TIFF 6.0 §2: readers must SKIP fields with unknown types
            # (e.g. RATIONAL XResolution tags many writers add); none of
            # the tags read_geotiff requires uses a type outside fmts,
            # so skipping cannot hide a missing required tag
            continue
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
            if len(raw) < tw * th * 8:
                raise ValueError(
                    f"truncated tile {i}: {len(raw)} bytes decoded, "
                    f"{tw * th * 8} needed — corrupt or short file"
                )
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
            if len(raw) < nrows * w * 8:
                raise ValueError(
                    f"truncated strip {i}: {len(raw)} bytes decoded, "
                    f"{nrows * w * 8} needed — corrupt or short file"
                )
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


def _lzw_encode(buf: bytes) -> bytes:
    """TIFF-variant LZW encoder, the exact inverse of _lzw_decode:
    MSB-first codes, 9->12 bits with EARLY width change, CLEAR+reset
    before the decoder would ever need a 13-bit code.

    Width timing: the encoder's table runs exactly ONE entry ahead of
    the decoder's (the decoder reconstructs entry k while consuming
    the code the encoder emitted after creating entry k), so where the
    decoder bumps at table length (1<<nbits)-1 the encoder bumps at
    next_code == (1<<nbits) — verified round-trip against _lzw_decode
    in tests.

    Sequences are interned as int keys (prev_code << 8 | byte), O(1)
    per input byte with no byte-string concatenation.
    """
    CLEAR, EOI = 256, 257
    out = bytearray()
    value = 0
    bits = 0

    def emit(code: int, nbits: int) -> None:
        nonlocal value, bits
        value = (value << nbits) | code
        bits += nbits
        while bits >= 8:
            bits -= 8
            out.append((value >> bits) & 0xFF)
        value &= (1 << bits) - 1  # keep the residue bounded (no bignum)

    table: dict[int, int] = {}
    next_code = 258
    nbits = 9
    emit(CLEAR, nbits)
    it = iter(buf)
    w = next(it, None)
    if w is None:
        emit(EOI, nbits)
        if bits:
            out.append((value << (8 - bits)) & 0xFF)
        return bytes(out)
    for byte in it:
        key = (w << 8) | byte
        nxt = table.get(key)
        if nxt is not None:
            w = nxt
            continue
        emit(w, nbits)
        table[key] = next_code
        next_code += 1
        if next_code == (1 << nbits):
            if nbits < 12:
                nbits += 1
            else:
                emit(CLEAR, nbits)
                table.clear()
                next_code = 258
                nbits = 9
        w = byte
    emit(w, nbits)
    # The decoder appends one more table entry after consuming this
    # final data code; if that lands on the early-change boundary
    # (511/1023/2047) it widens BEFORE reading EOI. Mirror the same
    # advance here (what libtiff's LZWPostEncode does) so EOI goes out
    # at the width the decoder reads it with — otherwise the tail
    # desyncs and strict readers see garbage after the last strip byte.
    next_code += 1
    if next_code == (1 << nbits) and nbits < 12:
        nbits += 1
    emit(EOI, nbits)
    if bits:
        out.append((value << (8 - bits)) & 0xFF)
    return bytes(out)


def write_geotiff(path: str, arr: np.ndarray, geo: dict | None = None,
                  compress: str = "lzw", rows_per_strip: int = 256) -> None:
    """Single-band float64 striped little-endian (Geo)TIFF writer.

    ``geo`` carries the same keys read_geotiff returns (ul_x, ul_y,
    pixel_width, pixel_height, optional nodata); omit it for a plain
    TIFF. compress is "lzw" (reference parity) or "none".
    """
    if arr.ndim != 2:
        raise ValueError("single-band 2-D array only")
    if compress not in ("lzw", "none"):
        raise ValueError(f"unsupported compression {compress!r}")
    a = np.ascontiguousarray(arr, dtype="<f8")
    h, w = a.shape
    e = "<"

    strips = []
    for r0 in range(0, h, rows_per_strip):
        raw = a[r0 : r0 + rows_per_strip].tobytes()
        strips.append(_lzw_encode(raw) if compress == "lzw" else raw)

    # tag id -> (type, values); types: 2 ASCII, 3 SHORT, 4 LONG, 12 DOUBLE
    tags: dict[int, tuple[int, tuple]] = {
        256: (4, (w,)),
        257: (4, (h,)),
        258: (3, (64,)),
        259: (3, (5 if compress == "lzw" else 1,)),
        262: (3, (1,)),  # BlackIsZero
        273: (4, ()),    # strip offsets, patched below
        277: (3, (1,)),
        278: (4, (rows_per_strip,)),
        279: (4, tuple(len(s) for s in strips)),
        339: (3, (3,)),  # IEEE float
    }
    if geo:
        tags[33550] = (12, (float(geo["pixel_width"]),
                            float(geo["pixel_height"]), 0.0))
        tags[33922] = (12, (0.0, 0.0, 0.0, float(geo["ul_x"]),
                            float(geo["ul_y"]), 0.0))
        if "epsg" in geo:
            # minimal GeoKeyDirectory: projected model, PixelIsArea,
            # ProjectedCSType = epsg (GeoTIFF spec §6.2; readers that
            # don't do CRS — including read_geotiff — skip the tag)
            e_ = int(geo["epsg"])
            tags[34735] = (3, (1, 1, 0, 3,
                               1024, 0, 1, 1,
                               1025, 0, 1, 1,
                               3072, 0, 1, e_))
        if "nodata" in geo:
            nd = f"{geo['nodata']:.17g}".encode() + b"\0"
            tags[42113] = (2, (nd,))

    type_fmt = {3: "H", 4: "I", 12: "d"}
    n_tags = len(tags)
    ifd_off = 8
    ext_off = ifd_off + 2 + n_tags * 12 + 4  # external value area
    ext = bytearray()

    def value_bytes(typ: int, vals: tuple) -> tuple[int, bytes]:
        if typ == 2:
            return len(vals[0]), vals[0]
        return len(vals), struct.pack(e + str(len(vals)) + type_fmt[typ], *vals)

    # strip data follows the external values; compute offsets in two
    # passes (offsets themselves live in the external area when n>1)
    def ext_len() -> int:
        n = 0
        for tag in sorted(tags):
            typ, vals = tags[tag]
            cnt, vb = value_bytes(typ, vals)
            if len(vb) > 4:
                n += len(vb) + (len(vb) & 1)
        return n

    tags[273] = (4, tuple(0 for _ in strips))  # placeholder, same size
    data_off = ext_off + ext_len()
    offs = []
    pos = data_off
    for s in strips:
        offs.append(pos)
        pos += len(s)
    tags[273] = (4, tuple(offs))

    entries = bytearray()
    for tag in sorted(tags):
        typ, vals = tags[tag]
        cnt, vb = value_bytes(typ, vals)
        if len(vb) > 4:
            voff = ext_off + len(ext)
            ext += vb
            if len(ext) & 1:
                ext += b"\0"
            entries += struct.pack(e + "HHII", tag, typ, cnt, voff)
        else:
            entries += struct.pack(e + "HHI", tag, typ, cnt) + vb.ljust(4, b"\0")

    with open(path, "wb") as f:
        f.write(struct.pack(e + "2sHI", b"II", 42, ifd_off))
        f.write(struct.pack(e + "H", n_tags))
        f.write(entries)
        f.write(struct.pack(e + "I", 0))  # no next IFD
        f.write(ext)
        for s in strips:
            f.write(s)
