"""CI wrapper for the one-command lifecycle rehearsal (scripts/
e2e_lifecycle.py): the reference's full user workflow — data gen ->
validate -> sweep -> train -> export -> eval parity -> promotion gate ->
serve -> API tests -> frontend proxy -> drain — in one subprocess run
with metric assertions (reference workflow: README.md:63-171).

Slow-marked (~4-7 min on CPU): `-m "not slow"` skips it; `make e2e`
runs the full-size version directly.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_lifecycle_rehearsal(tmp_path):
    env = {
        "PATH": os.environ.get("PATH", ""),
        "HOME": os.environ.get("HOME", "/root"),
        # axon sitecustomize stays off PYTHONPATH so JAX_PLATFORMS holds
        "PYTHONPATH": REPO,
        "JAX_PLATFORMS": "cpu",
        "JAX_COMPILATION_CACHE_DIR": os.path.join(REPO, "tests",
                                                  ".jax_cache"),
    }
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "e2e_lifecycle.py"),
         "--work_dir", str(tmp_path), "--sweep_count", "2", "--epochs", "4"],
        env=env, capture_output=True, text=True, timeout=1500)
    assert r.returncode == 0, r.stdout[-4000:] + r.stderr[-4000:]
    for stage in ("make_synthetic", "check_dataset", "sweep", "train",
                  "export_onnx", "evaluate_onnx", "crossval_gate",
                  "serve_up", "test_api_all", "frontend_proxy",
                  "sigterm_drain"):
        assert f"PASS {stage}" in r.stdout, (stage, r.stdout[-4000:])
    assert "E2E_SUMMARY" in r.stdout
