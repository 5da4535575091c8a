"""CLI entry points respond to --help via subprocess (guards argument
plumbing and import graphs of all console commands)."""

import subprocess
import sys

import pytest

CLIS = [
    "lora_tpu.cli.lora_add",
    "lora_tpu.cli.lora_distill",
    "lora_tpu.cli.lora_pti",
    "lora_tpu.cli.lora_db",
    "lora_tpu.cli.lora_ti",
    "lora_tpu.cli.lora_ppim",
    "lora_tpu.cli.kohya_convert",
]


@pytest.mark.parametrize("mod", CLIS)
def test_cli_help(mod):
    r = subprocess.run(
        [sys.executable, "-m", mod, "--help"],
        capture_output=True, text=True, timeout=120,
        env={"PATH": "/usr/bin:/bin", "PYTHONPATH": "/root/repo",
             "JAX_PLATFORMS": "cpu", "HOME": "/root"},
    )
    assert r.returncode == 0, r.stderr[-500:]
    assert "usage:" in r.stdout


def test_unknown_flag_rejected():
    r = subprocess.run(
        [sys.executable, "-m", "lora_tpu.cli.lora_add", "--bogus_flag", "1"],
        capture_output=True, text=True, timeout=120,
        env={"PATH": "/usr/bin:/bin", "PYTHONPATH": "/root/repo",
             "JAX_PLATFORMS": "cpu", "HOME": "/root"},
    )
    assert r.returncode != 0
    assert "unknown flag" in (r.stderr + r.stdout)
