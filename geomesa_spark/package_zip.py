#!/usr/bin/env python
"""Build dist/geomesa_spark.zip for ``spark-submit --py-files``."""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from geomesa_spark.contract import _build_pyfiles_zip  # noqa: E402


def main() -> str:
    src = _build_pyfiles_zip()
    dist = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "dist")
    os.makedirs(dist, exist_ok=True)
    out = os.path.join(dist, "geomesa_spark.zip")
    shutil.copyfile(src, out)
    print(out)
    return out


if __name__ == "__main__":
    main()
