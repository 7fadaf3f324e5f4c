"""Package cog3pio_spark into dist/cog3pio_spark.zip for spark-submit --py-files."""

from __future__ import annotations

import os
import zipfile

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> str:
    out_dir = os.path.join(HERE, "dist")
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, "cog3pio_spark.zip")
    pkg = os.path.join(HERE, "cog3pio_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, dirs, files in os.walk(pkg):
            # prune in place (r5 review: the substring test still descended
            # every __pycache__ tree and would skip any dir whose PATH
            # merely contains the string)
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for fn in files:
                if fn.endswith(".pyc"):
                    continue
                full = os.path.join(root, fn)
                zf.write(full, os.path.relpath(full, HERE))
    print(out)
    return out


if __name__ == "__main__":
    main()
