"""Lazy compiler/loader for the C Bowyer-Watson core (_delaunay_core.c).

The .so is built once per machine into the package directory, keyed by
the source's md5 (so editing the .c transparently rebuilds), under a
file lock (executor workers race to import). Compilation flags pin IEEE
semantics: -fno-fast-math -ffp-contract=off — the C core must round
exactly like the NumPy/python-scalar twin or the bit-identity contract
in delaunay.py breaks. Any failure (no compiler, readonly dir, bad
flags) degrades silently to None and callers keep the NumPy path.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
from pathlib import Path

_DIR = Path(__file__).resolve().parent
_SRC = _DIR / "_delaunay_core.c"

_lib = None
_tried = False
_libs: dict = {}


# -ffp-contract=off (no FMA) and -fno-builtin-pow (rr uses libm pow, the
# exact function behind CPython's float ** — gcc otherwise folds
# pow(x,2) to x*x, which differs by 1 ulp on ~0.1% of inputs and broke
# bit-identity on duplicate-point on-circle tests).
_CFLAGS = ["-O2", "-fPIC", "-shared",
           "-fno-fast-math", "-ffp-contract=off", "-fno-builtin-pow"]


def _build(src: Path, so_path: Path) -> bool:
    with tempfile.NamedTemporaryFile(
        suffix=".so", dir=str(so_path.parent), delete=False
    ) as tmp:
        tmp_path = tmp.name
    try:
        r = subprocess.run(
            ["cc", *_CFLAGS, str(src), "-lm", "-o", tmp_path],
            capture_output=True, timeout=120,
        )
        if r.returncode != 0:
            return False
        os.replace(tmp_path, so_path)  # atomic: racers see old or new
        return True
    except Exception:
        return False
    finally:
        if os.path.exists(tmp_path):
            try:
                os.unlink(tmp_path)
            except OSError:
                pass


def load_lib(src: Path):
    """Compile-and-load any single-file C source next to this module
    (same IEEE-pinning flags, same md5-keyed cache + lock). Returns a
    ctypes.CDLL or None."""
    if src in _libs:
        return _libs[src]
    lib = None
    try:
        digest = hashlib.md5(
            src.read_bytes() + " ".join(_CFLAGS).encode()
        ).hexdigest()[:12]
        so_path = src.parent / f"{src.stem}-{digest}.so"
        if not so_path.exists():
            lock = src.parent / f"{src.stem}.lock"
            with open(lock, "w") as lf:
                import fcntl

                fcntl.flock(lf, fcntl.LOCK_EX)
                try:
                    if not so_path.exists() and not _build(src, so_path):
                        _libs[src] = None
                        return None
                finally:
                    fcntl.flock(lf, fcntl.LOCK_UN)
        lib = ctypes.CDLL(str(so_path))
    except Exception:
        lib = None
    _libs[src] = lib
    return lib


def load():
    """ctypes handle to the compiled Delaunay core, or None (NumPy
    fallback)."""
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    try:
        lib = load_lib(_SRC)
        if lib is None:
            return None
        fn = lib.gpiv_delaunay_core
        fn.restype = ctypes.c_int64
        fn.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ]
        _lib = lib
    except Exception:
        _lib = None
    return _lib
