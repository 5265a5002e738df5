"""Build the --py-files archive for spark-submit (SURVEY M7).

    python tools/make_pyfiles.py [dist/gnames_spark.zip]

The zip is DETERMINISTIC (sorted entries, fixed 1980 timestamps, fixed
permissions): the same source tree always produces byte-identical
bytes, so executor-side caches keyed on the archive hash stay warm
across resubmits and a run manifest can pin the exact code by sha256.
"""

from __future__ import annotations

import hashlib
import os
import sys
import zipfile


def build_zip(dest: str, repo_root: str | None = None) -> str:
    root = repo_root or os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))
    )
    pkg = os.path.join(root, "gnames_spark")
    os.makedirs(os.path.dirname(os.path.abspath(dest)) or ".", exist_ok=True)
    entries = []
    for dirpath, dirnames, filenames in os.walk(pkg):
        dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
        for fn in sorted(filenames):
            if fn.endswith(".py"):
                full = os.path.join(dirpath, fn)
                entries.append((os.path.relpath(full, root), full))
    entries.sort()
    with zipfile.ZipFile(dest, "w", zipfile.ZIP_DEFLATED) as z:
        for rel, full in entries:
            zi = zipfile.ZipInfo(rel.replace(os.sep, "/"),
                                 date_time=(1980, 1, 1, 0, 0, 0))
            zi.external_attr = 0o644 << 16
            zi.compress_type = zipfile.ZIP_DEFLATED
            with open(full, "rb") as f:
                z.writestr(zi, f.read())
    return dest


def sha256_of(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


if __name__ == "__main__":
    dest = sys.argv[1] if len(sys.argv) > 1 else "dist/gnames_spark.zip"
    build_zip(dest)
    print(f"{dest} sha256={sha256_of(dest)}")
