"""Package graph_data_science_spark as a --py-files zip.

Usage: python tools/package_pyfiles.py [/tmp/gds_spark.zip]

The zip holds the package at its import root, so executors unpack it onto
sys.path and ``import graph_data_science_spark`` resolves — the standard
spark-submit delivery for a pure-Python engine (no wheels to build, no
cluster-side install).
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "graph_data_science_spark"


def build(out_path: str) -> str:
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        pkg_root = os.path.join(REPO, PKG)
        for dirpath, _dirnames, filenames in os.walk(pkg_root):
            if "__pycache__" in dirpath:
                continue
            for fn in sorted(filenames):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                zf.write(full, os.path.relpath(full, REPO))
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/gds_spark.zip"
    print(build(out))
