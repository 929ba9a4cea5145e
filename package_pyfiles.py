"""Package the engine as a --py-files zip for spark-submit (north-rule run
mode): python package_pyfiles.py → dist/giga_spatial_spark.zip.

    spark-submit --master <cluster> --py-files dist/giga_spatial_spark.zip \
        bench.py
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.abspath(__file__))


def build(out: str | None = None) -> str:
    out = out or os.path.join(REPO, "dist", "giga_spatial_spark.zip")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    pkg = os.path.join(REPO, "giga_spatial_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    p = os.path.join(root, f)
                    z.write(p, os.path.relpath(p, REPO))
        z.write(os.path.join(REPO, "__spark_entry__.py"), "__spark_entry__.py")
    return out


if __name__ == "__main__":
    print(build())
