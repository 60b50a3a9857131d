"""Build dist/dqmtools_spark.zip for spark-submit --py-files.

Zips the package with deterministic member order and zeroed timestamps
so the artifact hash is reproducible (same tree -> same bytes), which
lets a cluster cache the shipped zip across submissions.
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "dqmtools_spark")
OUT = os.path.join(REPO, "dist", "dqmtools_spark.zip")


def main() -> None:
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    members = []
    for root, _dirs, files in os.walk(PKG):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                full = os.path.join(root, f)
                members.append((os.path.relpath(full, REPO), full))
    members.sort()
    with zipfile.ZipFile(OUT, "w", zipfile.ZIP_DEFLATED) as z:
        for arc, full in members:
            info = zipfile.ZipInfo(arc, date_time=(1980, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            with open(full, "rb") as fh:
                z.writestr(info, fh.read())
    print(OUT, f"({len(members)} modules)")


if __name__ == "__main__":
    main()
