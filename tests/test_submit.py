"""spark-submit --py-files launch mode (north rule: the job runs via
spark-submit with the package shipped as a zip to driver + executors).

One end-to-end subprocess run: scripts/submit.sh builds dist/<pkg>.zip,
launches scripts/submit_pipeline.py under spark-submit, and the pipeline
prints its stage-summary JSON. This is the same distribution path a real
multi-executor cluster uses — only --master changes."""

from __future__ import annotations

import json
import os
import shutil
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_spark_submit_py_files_launch(tmp_path):
    out = str(tmp_path / "gd_submit_out")
    proc = subprocess.run(
        [
            "bash",
            os.path.join(REPO, "scripts", "submit.sh"),
            "--master",
            "local[2]",
            "--input",
            "synth:500",
            "--output",
            out,
            "--fresh",
            "--no-suffix",
        ],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=240,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["n_files"] == 500
    assert summary["n_clusters"] > 0
    assert summary["pipeline_wall_ms"] > 0
    # checkpointed stage outputs landed under the submitted job's out dir
    # (layout: {out}/checkpoint/{config_hash}/{stage})
    ckpt = os.path.join(out, "checkpoint", summary["config_hash"])
    assert os.path.isdir(os.path.join(ckpt, "clusters")), os.listdir(out)
    shutil.rmtree(out, ignore_errors=True)
