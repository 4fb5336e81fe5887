"""Build the ``--py-files`` artifact for cluster submission.

    python tools/make_pyfiles.py [out.zip]     # default: dist/linkgraph.zip
    spark-submit --py-files dist/linkgraph.zip driver.py --algo pagerank ...

Deterministic: fixed timestamps and sorted entries, so the same tree
always produces a byte-identical zip (cacheable by content hash on the
cluster side). Only the ``linkgraph`` package goes in — tests, tools and
benchmark data stay out of executor python paths.
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_path: str) -> str:
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    entries = []
    pkg_root = os.path.join(REPO, "linkgraph")
    for dirpath, dirnames, filenames in os.walk(pkg_root):
        dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
        for fn in sorted(filenames):
            if fn.endswith(".py"):
                full = os.path.join(dirpath, fn)
                arc = os.path.relpath(full, REPO)
                entries.append((full, arc))
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for full, arc in entries:
            info = zipfile.ZipInfo(arc, date_time=(1980, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            info.external_attr = 0o644 << 16
            with open(full, "rb") as f:
                zf.writestr(info, f.read())
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "dist", "linkgraph.zip")
    print(build(out))
