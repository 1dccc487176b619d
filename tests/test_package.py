"""dist/gpiv_spark.zip freshness (VERDICT r5 #2): round 5 shipped a
spark-submit artifact whose parsers predated the review fixes because
nothing compared the zip against the tree. This test rebuilds the zip
when absent and md5-compares EVERY entry against the working tree —
a stale artifact (or a tree file missing from the zip) fails CI."""

import hashlib
import subprocess
import zipfile
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
ZIP = ROOT / "dist" / "gpiv_spark.zip"


def _tree_files():
    out = {}
    for pat in ("*.py", "*.c"):
        for p in sorted((ROOT / "gpiv_spark").rglob(pat)):
            out[p.relative_to(ROOT).as_posix()] = hashlib.md5(
                p.read_bytes()).hexdigest()
    return out


def test_zip_matches_tree():
    if not ZIP.exists():
        subprocess.run(["bash", str(ROOT / "tools" / "package.sh")],
                       check=True, capture_output=True)
    want = _tree_files()
    with zipfile.ZipFile(ZIP) as z:
        got = {n: hashlib.md5(z.read(n)).hexdigest() for n in z.namelist()}
    stale = {n for n in want if got.get(n) != want[n]}
    extra = set(got) - set(want)
    assert not stale, f"zip entries differ from tree: {sorted(stale)[:5]}"
    assert not extra, f"zip holds files not in tree: {sorted(extra)[:5]}"
