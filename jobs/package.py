#!/usr/bin/env python
"""Build dist/dedupe_spark.zip for spark-submit --py-files.

Zip contains the package sources only (no tests, no caches) — executors
import ``dedupe_spark.*`` from it; the driver script (jobs/run_pipeline.py)
ships separately as the spark-submit primary file.
"""

from __future__ import annotations

import os
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_dir: str | None = None) -> str:
    out_dir = out_dir or os.path.join(ROOT, "dist")
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, "dedupe_spark.zip")
    pkg = os.path.join(ROOT, "dedupe_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, dirnames, filenames in os.walk(pkg):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for fn in sorted(filenames):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                z.write(full, os.path.relpath(full, ROOT))
    return out


if __name__ == "__main__":
    print(build())
