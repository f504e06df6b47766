"""The `ssdseglib` notebook-compat layer (BASELINE.json north star: the
reference tutorial notebooks run unmodified against this backend).

Each flow runs in a subprocess: the compat package is importable as
`ssdseglib` — the same name the read-only reference package uses — and the
`reference` oracle fixture imports that one in-process (tests/conftest.py),
so the two must never share a `sys.modules` entry.

The full-resolution (480x640) verbatim execution of the reference
notebook's code cells is `examples/05_reference_notebook_unmodified.py`
(run on TPU; log under docs/runs/) — these tests cover the same API
surface at CI-sized shapes.
"""

import subprocess
import sys
from pathlib import Path

SCRIPTS = Path(__file__).parent / "compat_scripts"


def _run(script: str, marker: str, timeout: int = 1200) -> None:
    result = subprocess.run(
        [sys.executable, str(SCRIPTS / script)],
        capture_output=True,
        text=True,
        timeout=timeout,
        cwd="/root/repo",
    )
    assert result.returncode == 0, (
        f"{script} failed rc={result.returncode}\n"
        f"--- stdout ---\n{result.stdout[-4000:]}\n"
        f"--- stderr ---\n{result.stderr[-4000:]}"
    )
    assert marker in result.stdout, result.stdout[-2000:]


def test_facade_flow():
    """compile/fit/save/load_model/inference/predict on in-memory batches."""
    _run("facade_flow.py", "FACADE_FLOW_OK")


def test_tf_pipeline_flow():
    """The notebook's tf.data recipe end-to-end: files on disk ->
    Dataset.map(read_and_encode) -> fit -> save -> tf.keras load_model
    shim -> inference predict(ds_test) -> evaluators."""
    _run("tf_pipeline_flow.py", "TF_PIPELINE_FLOW_OK")


def _run_notebook_verbatim(nb: str, marker: str) -> None:
    """Reference notebook `nb` code cells exec'd VERBATIM (no model fit:
    notebooks 01/99 are data/plotting only — notebook 03's fit cell runs
    full-size on TPU via examples/05, logged under docs/runs/)."""
    result = subprocess.run(
        [
            sys.executable,
            "examples/05_reference_notebook_unmodified.py",
            "--notebook", nb, "--cpu",
            # CI smoke sizes: the example's defaults (256/64) are the
            # learning-gate scale, ~5 min of PNG synthesis on this host
            "--train-samples", "14", "--test-samples", "8",
        ],
        capture_output=True,
        text=True,
        timeout=1200,
        cwd="/root/repo",
    )
    assert result.returncode == 0, (
        f"notebook {nb} verbatim failed rc={result.returncode}\n"
        f"--- stdout ---\n{result.stdout[-4000:]}\n"
        f"--- stderr ---\n{result.stderr[-4000:]}"
    )
    assert marker in result.stdout, result.stdout[-2000:]


def test_notebook_01_verbatim():
    """Reference notebook 01 (SSD framework: DefaultBoundingBoxes grids +
    sample plotting, reference 01-ssd-framework...ipynb cells 0-3)."""
    _run_notebook_verbatim("01", "VERBATIM_NOTEBOOK_01_OK")


def test_notebook_99_verbatim():
    """Reference notebook 99 (class-imbalance audit over data/*.json +
    CSVs, reference 99-check-dataset-class-imbalance.ipynb cells 0-3)."""
    _run_notebook_verbatim("99", "VERBATIM_NOTEBOOK_99_OK")
