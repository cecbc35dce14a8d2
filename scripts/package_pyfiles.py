#!/usr/bin/env python
"""Build ``medallion_etl_spark.zip`` for ``spark-submit --py-files``.

The north rule's deployment contract is "the same spark-submit
--py-files job runs unchanged at N and 4N executors"; this is the
artifact that contract ships. The zip holds the package directory at
the archive root, so both the driver (spark-submit prepends --py-files
to PYTHONPATH) and every executor (files are shipped and added to
sys.path) import identical code:

    python scripts/package_pyfiles.py -o medallion_etl_spark.zip
    spark-submit --master <cluster> --py-files medallion_etl_spark.zip \
        scripts/replay_cli.py --events ... --table ...

tests/test_spark_submit.py runs this end-to-end (real spark-submit
subprocess, CLI copied OUTSIDE the repo so imports can only resolve
from the zip).
"""

from __future__ import annotations

import argparse
import os
import zipfile


def build_zip(out_path: str, repo_root: str | None = None) -> str:
    """Zip the ``medallion_etl_spark`` package (sans __pycache__) with
    the package dir at the archive root, as --py-files requires."""
    repo_root = repo_root or os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg = os.path.join(repo_root, "medallion_etl_spark")
    if not os.path.isdir(pkg):
        raise FileNotFoundError(pkg)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, dirnames, filenames in os.walk(pkg):
            dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
            for fn in sorted(filenames):
                if fn.endswith((".pyc", ".pyo")):
                    continue
                full = os.path.join(dirpath, fn)
                zf.write(full, os.path.relpath(full, repo_root))
    return out_path


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("-o", "--out", default="medallion_etl_spark.zip")
    args = ap.parse_args()
    print(build_zip(args.out))


if __name__ == "__main__":
    main()
