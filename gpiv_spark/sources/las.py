"""Minimal LAS point-cloud source (uncompressed LAS 1.2-1.4, point
format 0, extra-byte VLR dims) in pure NumPy — the reference's only
real input format (run_test_v1.py:43-58 reads a .las with PDAL and
pulls X/Y/Z plus the six TPU extra-byte dims VarianceX..CovarianceYZ).

Fixed-layout structs all the way down, same discipline as
sources/geotiff.py:

- public header block (227 bytes at 1.2; 1.3/1.4 grow it — the header
  carries its own size so the walk is version-agnostic);
- variable-length records; the "LASF_Spec"/4 Extra Bytes VLR holds one
  192-byte descriptor per extra dim (name char[32], data_type u8 —
  type 10 = float64, which is what the reference's TPU dims use);
- point records: format 0 = 20 bytes of scaled int32 XYZ + attributes,
  extra-byte payload appended per point.

Scale note: one LAS *file* parses on one worker (np.frombuffer over
the record block — no per-point Python). ``las_table`` therefore goes
through ``spark.read.format("binaryFile")`` + ``mapInPandas``: a
10^4-file collection parses as 10^4 independent tasks; no file ever
visits the driver. LAZ (compressed, run_test_v1.py:44) is handled by
sources/laz.py — a from-scratch LASzip-architecture codec (chunked
arithmetic coding; see its docstring for the faithfulness statement)
— and routes through the same reader automatically. For one GIANT
.laz (where file-level tasks can't parallelize), laz.py's laz_table
scans chunk SPLITS instead — parquet-row-group-style planning over
the chunk table, point bytes never read during planning.
"""

from __future__ import annotations

import struct

import numpy as np

HDR_FMT0_LEN = 20  # point data record format 0

# reference extra-byte dim names -> engine TPU columns
# (run_test_v1.py:48-51 vstacks them in exactly this order)
EB_NAME_MAP = {
    "VarianceX": "var_x",
    "VarianceY": "var_y",
    "VarianceZ": "var_z",
    "CovarianceXY": "cov_xy",
    "CovarianceXZ": "cov_xz",
    "CovarianceYZ": "cov_yz",
}


class LasFormatError(ValueError):
    """Malformed or unsupported LAS bytes."""


def _pad(s: bytes, n: int) -> bytes:
    return s[:n] + b"\x00" * (n - len(s[:n]))


def file_id_offsets(df, path_col: str, count_col: str | None = None):
    """(path, _off) frame: total record count of lexicographically
    EARLIER files — the shared global-point_id contract of las_table
    and laz_table (both must offset identically or ids diverge between
    the readers). ``count_col=None`` counts rows of ``df`` per path;
    otherwise sums that column (e.g. per-chunk counts)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.orderBy(path_col).rowsBetween(Window.unboundedPreceding, -1)
    per = (
        df.groupBy(path_col).count().withColumnRenamed("count", "_n")
        if count_col is None
        else df.groupBy(path_col).agg(F.sum(count_col).alias("_n"))
    )
    return (
        per.withColumn("_off", F.coalesce(F.sum("_n").over(w), F.lit(0)))
        .select(path_col, "_off")
    )


def _build_points(x, y, z, extra: dict, scale: float):
    """Scaled struct records + (offset, minmax) shared by the LAS and
    LAZ writers."""
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    z = np.asarray(z, np.float64)
    n = len(x)
    off = (float(x.min()) if n else 0.0, float(y.min()) if n else 0.0,
           float(z.min()) if n else 0.0)
    dt = _point_dtype(len(extra), list(extra))
    pts = np.zeros(n, dtype=dt)
    sx = np.round((x - off[0]) / scale).astype(np.int64)
    sy = np.round((y - off[1]) / scale).astype(np.int64)
    sz = np.round((z - off[2]) / scale).astype(np.int64)
    hi = np.int64(2**31 - 1)
    if n and max(sx.max(), sy.max(), sz.max()) > hi:
        # LAS point records store int32 counts: assigning a larger
        # int64 into the i4 field silently WRAPS (coordinates off by
        # ~2^31*scale on read-back) — refuse instead
        raise ValueError(
            f"coordinate span / scale ({scale}) exceeds the LAS int32 "
            "count range; use a coarser scale_factor"
        )
    pts["X"], pts["Y"], pts["Z"] = sx, sy, sz
    pts["rn"] = 0b00001001  # 1 return, return number 1
    for name, arr in extra.items():
        pts[name] = np.asarray(arr, np.float64)
    minmax = (float(x.max()), float(x.min()), float(y.max()),
              float(y.min()), float(z.max()), float(z.min())) if n else None
    return pts, off, minmax


def _extra_vlr(extra_names) -> bytes:
    """LASF_Spec/4 extra-byte descriptor VLR (type 10 = double)."""
    eb_payload = b""
    for name in extra_names:
        d = bytearray(192)
        d[2] = 10  # data_type: double
        d[4:36] = _pad(name.encode(), 32)
        eb_payload += bytes(d)
    if not eb_payload:
        return b""
    return (
        struct.pack("<H", 0) + _pad(b"LASF_Spec", 16)
        + struct.pack("<HH", 4, len(eb_payload)) + _pad(b"extra bytes", 32)
        + eb_payload
    )


def _build_header(n: int, rec_len: int, pt_offset: int, n_vlr: int,
                  scale: float, off, minmax, fmt_byte: int) -> bytes:
    header_size = 227
    hdr = bytearray(header_size)
    hdr[0:4] = b"LASF"
    hdr[24] = 1
    hdr[25] = 2
    hdr[26:58] = _pad(b"gpiv_spark", 32)
    hdr[58:90] = _pad(b"gpiv_spark las writer", 32)
    struct.pack_into("<H", hdr, 94, header_size)
    struct.pack_into("<I", hdr, 96, pt_offset)
    struct.pack_into("<I", hdr, 100, n_vlr)
    hdr[104] = fmt_byte
    struct.pack_into("<H", hdr, 105, rec_len)
    struct.pack_into("<I", hdr, 107, n)
    struct.pack_into("<I", hdr, 111, n)  # returns[0]
    struct.pack_into("<3d", hdr, 131, scale, scale, scale)
    struct.pack_into("<3d", hdr, 155, *off)
    if minmax is not None:
        struct.pack_into("<6d", hdr, 179, *minmax)
    return bytes(hdr)


def write_las(x: np.ndarray, y: np.ndarray, z: np.ndarray,
              extra: dict[str, np.ndarray] | None = None,
              scale: float = 0.001) -> bytes:
    """Synthesize an uncompressed LAS 1.2 / format-0 blob.

    ``extra``: name -> float64 array; stored as extra-byte dims behind a
    LASF_Spec/4 VLR (data_type 10 = double), exactly how the reference's
    TPU products carry VarianceX..CovarianceYZ.
    """
    extra = extra or {}
    pts, off, minmax = _build_points(x, y, z, extra, scale)
    vlrs = _extra_vlr(list(extra))
    rec_len = HDR_FMT0_LEN + 8 * len(extra)
    hdr = _build_header(len(pts), rec_len, 227 + len(vlrs),
                        1 if vlrs else 0, scale, off, minmax, 0)
    return hdr + vlrs + pts.tobytes()


def _point_dtype(n_extra: int, names: list[str]) -> np.dtype:
    fields = [
        ("X", "<i4"), ("Y", "<i4"), ("Z", "<i4"), ("intensity", "<u2"),
        ("rn", "u1"), ("cls", "u1"), ("ang", "i1"), ("usr", "u1"),
        ("src", "<u2"),
    ]
    fields += [(names[k], "<f8") for k in range(n_extra)]
    return np.dtype(fields)


def parse_las_layout(head: bytes) -> dict:
    """Header + VLR walk shared by the whole-blob reader and the
    chunk-split LAZ scan (laz.py). ``head`` needs only the bytes up to
    the point block (headers + VLRs are a few KB; 64 KB is plenty).

    Returns n, pt_offset, scales/offsets, extra_names, the laszip VLR
    body (or None) and the compressed flag."""
    if len(head) < 227 or head[0:4] != b"LASF":
        raise LasFormatError("not a LAS blob")
    vmaj, vmin = head[24], head[25]
    if vmaj != 1 or vmin not in (1, 2, 3, 4):
        raise LasFormatError(f"unsupported LAS version {vmaj}.{vmin}")
    (header_size,) = struct.unpack_from("<H", head, 94)
    (pt_offset,) = struct.unpack_from("<I", head, 96)
    (n_vlr,) = struct.unpack_from("<I", head, 100)
    fmt = head[104] & 0x3F  # LAZ sets the two high bits
    (rec_len,) = struct.unpack_from("<H", head, 105)
    (n_legacy,) = struct.unpack_from("<I", head, 107)
    sx, sy, sz = struct.unpack_from("<3d", head, 131)
    ox, oy, oz = struct.unpack_from("<3d", head, 155)
    n = n_legacy
    if n == 0 and vmin == 4 and header_size >= 375:
        (n,) = struct.unpack_from("<Q", head, 247)
    if fmt != 0:
        raise LasFormatError(f"only point format 0 supported (got {fmt})")

    # VLR walk: LASF_Spec/4 extra-byte descriptors + laszip/22204
    extra_names: list[str] = []
    laszip_vlr: bytes | None = None
    pos = header_size
    for _ in range(n_vlr):
        if pos + 54 > len(head):
            raise LasFormatError(
                f"VLR header at {pos} extends past the {len(head)} "
                "bytes provided — truncated blob, or pass a larger "
                "header prefix"
            )
        user_id = head[pos + 2 : pos + 18].rstrip(b"\x00").decode("ascii",
                                                                  "replace")
        rec_id, rlen = struct.unpack_from("<HH", head, pos + 18)
        if pos + 54 + rlen > len(head):
            raise LasFormatError(
                f"VLR body at {pos} ({rlen} B) extends past the "
                f"{len(head)} bytes provided — truncated blob, or pass "
                "a larger header prefix"
            )
        body = head[pos + 54 : pos + 54 + rlen]
        if user_id == "LASF_Spec" and rec_id == 4:
            for k in range(len(body) // 192):
                d = body[k * 192 : (k + 1) * 192]
                if d[2] != 10:
                    raise LasFormatError(
                        f"extra-byte dim type {d[2]} unsupported (want 10)"
                    )
                extra_names.append(
                    d[4:36].rstrip(b"\x00").decode("ascii", "replace")
                )
        elif user_id == "laszip encoded" and rec_id == 22204:
            laszip_vlr = body
        pos += 54 + rlen

    want = HDR_FMT0_LEN + 8 * len(extra_names)
    if rec_len != want:
        raise LasFormatError(
            f"record length {rec_len} != format0 + {len(extra_names)} "
            f"double extra dims ({want})"
        )
    return {
        "n": n, "pt_offset": pt_offset, "rec_len": rec_len,
        "scale": (sx, sy, sz), "offset": (ox, oy, oz),
        "extra_names": extra_names, "laszip_vlr": laszip_vlr,
        "compressed": bool(head[104] & 0xC0),
    }


def read_las(blob: bytes):
    """Parse LAS 1.2-1.4 / format 0 (+ double extra bytes) ->
    pandas.DataFrame with x, y, z (descaled float64) and one float64
    column per extra-byte dim, in file order."""
    import pandas as pd

    lay = parse_las_layout(blob)
    n, pt_offset = lay["n"], lay["pt_offset"]
    sx, sy, sz = lay["scale"]
    ox, oy, oz = lay["offset"]
    extra_names = lay["extra_names"]
    if lay["compressed"]:
        if lay["laszip_vlr"] is None:
            raise LasFormatError(
                "compressed point format without a laszip VLR"
            )
        from .laz import decompress_blob, parse_laszip_vlr

        info = parse_laszip_vlr(lay["laszip_vlr"])
        if info["compressor"] != 2 or info["coder"] != 0:
            raise LasFormatError(
                f"unsupported LAZ compressor/coder "
                f"{info['compressor']}/{info['coder']}"
            )
        pts = decompress_blob(blob[pt_offset:], extra_names)
        if len(pts) != n:
            raise LasFormatError(
                f"LAZ chunk table holds {len(pts)} points, header says {n}"
            )
    else:
        dt = _point_dtype(len(extra_names), extra_names)
        pts = np.frombuffer(blob, dtype=dt, count=n, offset=pt_offset)
    out = {
        "x": pts["X"].astype(np.float64) * sx + ox,
        "y": pts["Y"].astype(np.float64) * sy + oy,
        "z": pts["Z"].astype(np.float64) * sz + oz,
    }
    for name in extra_names:
        out[name] = pts[name].astype(np.float64)
    return pd.DataFrame(out)


LAS_POINTS_SCHEMA = (
    "point_id long, x double, y double, z double, var_x double, "
    "var_y double, var_z double, cov_xy double, cov_xz double, "
    "cov_yz double"
)


def las_table(spark, path: str):
    """Distributed LAS scan -> the engine points table (S1 on the real
    format): binaryFile source (one task per file, bytes never visit
    the driver) + mapInPandas parse. Extra dims are renamed to the TPU
    columns via EB_NAME_MAP; point_id is the global position derived
    from a deterministic (path, file-order) rank so the table is stable
    across re-reads."""
    import pandas as pd
    from pyspark.sql import functions as F

    files = spark.read.format("binaryFile").load(path)

    def parse(batches):
        for pdf in batches:
            for _, row in pdf.iterrows():
                df = read_las(bytes(row["content"]))
                df = df.rename(columns=EB_NAME_MAP)
                df.insert(0, "point_id", np.arange(len(df), dtype=np.int64))
                df["_path"] = row["path"]
                yield df

    parsed = files.select("path", "content").mapInPandas(
        parse, LAS_POINTS_SCHEMA + ", _path string"
    ).localCheckpoint(eager=False)
    # ^ one materialization feeds BOTH the offsets aggregate and the
    # join below — without it the two plan branches each re-read and
    # re-decode every file (the dominant scan cost, 2x). At catalog
    # scale the per-file counts would come from table metadata instead.
    # global ids: offset each file's local ids by the total count of
    # lexicographically-earlier files (two tiny aggs on file metadata)
    offsets = file_id_offsets(parsed, "_path")
    return (
        parsed.join(F.broadcast(offsets), "_path")
        .withColumn("point_id", F.col("point_id") + F.col("_off"))
        .drop("_path", "_off")
    )
