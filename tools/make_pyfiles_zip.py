"""Build dist/zetasketch_spark.zip for spark-submit --py-files."""

from __future__ import annotations

import os
import zipfile

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def main(out: str | None = None) -> str:
    if out is None:
        dist = os.path.join(ROOT, "dist")
        os.makedirs(dist, exist_ok=True)
        out = os.path.join(dist, "zetasketch_spark.zip")
    pkg = os.path.join(ROOT, "zetasketch_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for fn in sorted(files):
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    z.write(full, os.path.relpath(full, ROOT))
    print(out)
    return out


if __name__ == "__main__":
    main()
