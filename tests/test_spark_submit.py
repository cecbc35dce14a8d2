"""End-to-end proof of the deployment contract: the replay job runs
under REAL ``spark-submit --py-files medallion_etl_spark.zip`` with the
cluster size chosen by the submit line, not by the code.

This is the north rule's "same spark-submit --py-files job runs
unchanged at N and 4N executors" made concrete in the sandbox:

- the package is imported ONLY from the zip (the CLI is copied outside
  the repo, so its repo-relative sys.path fallback points at an empty
  dir and ``--py-files`` is the only way the import can resolve);
- ``--master local[2]`` AND ``--conf`` sizing from the submit line win
  over the code's defaults (builder .config() overrides submit-line
  system properties, so get_spark must set neither master nor sizing
  confs under spark-submit — an unconditional .master() silently pins
  the job to the driver no matter what cluster was submitted);
- the state the subprocess replayer commits is byte-identical to the
  in-process pandas oracle (token-array equality per row).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

from medallion_etl_spark.cdc.table import LakeTable
from medallion_etl_spark.synth import gen_events, write_events_shuffled

from .cdc_oracle import assert_frames_equal, expected_final_state

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit() -> str | None:
    found = shutil.which("spark-submit")
    if found:
        return found
    fallback = "/opt/spark/bin/spark-submit"
    return fallback if os.path.exists(fallback) else None


@pytest.mark.skipif(_spark_submit() is None, reason="spark-submit not installed")
def test_spark_submit_py_files_replay(spark, tmp_path):
    # package the library exactly as a deployment would (path popped so
    # scripts/ modules can't shadow later imports in the shared process)
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    try:
        from package_pyfiles import build_zip
    finally:
        sys.path.pop(0)

    zip_path = build_zip(str(tmp_path / "medallion_etl_spark.zip"))

    # the job script lives OUTSIDE the repo: its sys.path fallback
    # (parent of its own dir) has no package, so only --py-files can
    # satisfy the imports — on the driver AND on executors
    cli = str(tmp_path / "replay_cli.py")
    shutil.copyfile(os.path.join(REPO, "scripts", "replay_cli.py"), cli)

    events_path = str(tmp_path / "events")
    df = gen_events(spark, n_events=4_000, n_keys=300, hot_fraction=0.25, n_hot=3)
    write_events_shuffled(df, events_path, n_files=4)
    events_pdf = spark.read.parquet(events_path).toPandas()

    table_root = str(tmp_path / "lake")
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    # --parallelism 16 is a decoy: the submit-line master must win
    proc = subprocess.run(
        [
            _spark_submit(),
            "--master",
            "local[2]",
            "--conf",
            "spark.sql.shuffle.partitions=4",
            "--py-files",
            zip_path,
            cli,
            "--events",
            events_path,
            "--table",
            table_root,
            "--chunk-size",
            "1000",
            "--n-buckets",
            "4",
            "--parallelism",
            "16",
        ],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=str(tmp_path),
        env=env,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr[-4000:]}"
    res = json.loads(
        [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
    )
    assert res["master"] == "local[2]", res
    # submit-line --conf sizing wins too: get_spark must not force its
    # own shuffle partitions (max(16, 8) from the decoy) over the 4
    assert res["shuffle_partitions"] == "4", res
    assert res["batches_applied"] == 4, res

    got = LakeTable.load(table_root).read(spark).toPandas()
    assert_frames_equal(got, expected_final_state(events_pdf))
