"""Worker-side interpreter fix: mtime-guard zipimporter.invalidate_caches.

This directory is appended to the Python workers' PYTHONPATH by
gpiv_spark.session.get_spark (spark.executorEnv.PYTHONPATH), so the
interpreter inside pyspark.daemon / every forked worker imports this
sitecustomize module once at startup.

Why: pyspark.worker calls ``importlib.invalidate_caches()`` at the
start of EVERY task (worker_util.setup_spark_files), and Python 3.11's
``zipimporter.invalidate_caches()`` unconditionally re-reads the zip
central directory. The worker sys.path carries several zipimporter
entries (pyspark.zip, py4j zip, spark jars — one cached finder per
subpackage path), so every Python task re-parsed every archive's TOC:
measured 130-380 ms per task on this box, the dominant share of the
"~20 ms/task python handshake" floor that capped every
mapInPandas/applyInPandas stage (see BASELINE.md).

CPython 3.12+ fixed this upstream by re-reading only when the
archive's stat changes (gh-84283); this module backports that rule:
``invalidate_caches`` becomes a no-op while (st_mtime_ns, st_size) of
the archive is unchanged, and falls through to the original re-read
(or cache drop) the moment the file changes or disappears. Semantics
for changed archives are identical to stock 3.11.

Measured effect (8 pinned cores, no-op mapInPandas stage, best of 3):
128 tasks 2.55 s -> 1.08 s; 256 tasks 4.94 s -> 2.03 s.
"""

import os
import zipimport

_orig_invalidate = zipimport.zipimporter.invalidate_caches
_stamp: dict = {}


def _guarded_invalidate(self):
    try:
        st = os.stat(self.archive)
        key = (st.st_mtime_ns, st.st_size)
    except OSError:
        _stamp.pop(self.archive, None)
        return _orig_invalidate(self)
    if _stamp.get(self.archive) == key:
        return None
    _stamp[self.archive] = key
    return _orig_invalidate(self)


zipimport.zipimporter.invalidate_caches = _guarded_invalidate
