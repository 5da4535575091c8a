"""Pin hw_proof.py's mechanics so the hardware-proof script cannot rot.

hw_proof.py is the round's strongest interop statement (train on real TPU
via the lora_db CLI, load the artifact in the LIVE reference); --tiny runs
the identical mechanics on CPU. This test keeps the script honest between
hardware runs: the CLI subprocess env (a past bug silently inherited the
axon backend pin), the reference monkeypatch path incl. eval() vs the
reference's default dropout_p=0.1, and the delta-equals-file assertion.
"""

import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_hw_proof_tiny_end_to_end():
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "hw_proof.py"),
         "--tiny", "--steps", "2"],
        capture_output=True, text=True, timeout=900, cwd=REPO,
        env={**os.environ, "PYTHONPATH": REPO})
    assert r.returncode == 0, f"stdout:{r.stdout[-1500:]}\nerr:{r.stderr[-1500:]}"
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["metric"] == "hw_artifact_proof"
    assert out["reference_loaded"] is True
    assert out["steps"] == 2
    # the live reference applied our file and the injected delta matched
    # the file's own up@down product
    assert out["delta_max_err"] < 1e-4
    # training moved the ups (non-trivial artifact, not a zero file)
    assert out["trained_delta_magnitude"] > 0
    assert out["n_unet_pairs"] > 0
