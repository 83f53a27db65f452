"""Every example must run end-to-end on CPU (each asserts its own recon
quality). Mirrors the reference's doc-literate examples being built by CI."""

import os
import pathlib
import subprocess
import sys

import pytest

EXAMPLES = sorted(
    (pathlib.Path(__file__).parent.parent / "examples").glob("*.py")
)


@pytest.mark.parametrize("path", EXAMPLES, ids=lambda p: p.stem)
def test_example_runs(path):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)  # no virtual mesh needed; keep startup fast
    env["PYTHONPATH"] = str(path.parent.parent)
    res = subprocess.run(
        [sys.executable, str(path)],
        capture_output=True,
        text=True,
        timeout=240,
        env=env,
    )
    assert res.returncode == 0, (
        f"{path.name} failed:\n{res.stdout[-2000:]}\n{res.stderr[-2000:]}"
    )
