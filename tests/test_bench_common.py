"""Pin the bench capture outage-proofing (bench_common.py).

Round 3 lost its perf datapoint to an un-diagnosable rc=1 traceback when the
TPU tunnel hung at backend init (VERDICT r3, weak #1). bench_common now
probes the backend in a killable subprocess with bounded retries and emits
ONE structured JSON line on terminal failure. These tests keep that contract
honest without touching any real backend: the probe subprocess is just
`sys.executable -c "import jax; ..."` so we steer it with a stub `jax`
module via PYTHONPATH / the probe knob env vars.
"""

import io
import json
import sys
import time
from contextlib import redirect_stdout

import pytest


@pytest.fixture()
def fresh_bench_common(monkeypatch, tmp_path):
    """Import a fresh bench_common with probe knobs set small and the probe
    subprocess steered to a stub `jax` package in tmp_path."""

    def make(jax_body: str, attempts=2, timeout_s=2, backoff_s=0):
        (tmp_path / "jax").mkdir(exist_ok=True)
        (tmp_path / "jax" / "__init__.py").write_text(jax_body)
        monkeypatch.setenv("PYTHONPATH", str(tmp_path))
        monkeypatch.setenv("LORA_BENCH_PROBE_ATTEMPTS", str(attempts))
        monkeypatch.setenv("LORA_BENCH_PROBE_TIMEOUT", str(timeout_s))
        monkeypatch.setenv("LORA_BENCH_PROBE_BACKOFF", str(backoff_s))
        sys.modules.pop("bench_common", None)
        import bench_common

        return bench_common

    yield make
    # drop the knob-patched module; the next importer re-reads the (by then
    # restored) env
    sys.modules.pop("bench_common", None)


def test_probe_success_returns_none(fresh_bench_common):
    bc = fresh_bench_common("def devices():\n    return [type('D', (), "
                            "{'platform': 'stub'})()]\n")
    assert bc.probe_backend() is None


def test_probe_hang_is_killed_and_reported(fresh_bench_common):
    """A backend init that hangs forever (the round-3 failure mode: 25 min
    at 0 CPU) must be killed at the per-attempt timeout, not waited on."""
    bc = fresh_bench_common(
        "import time\n"
        "def devices():\n    time.sleep(3600)\n",
        attempts=2, timeout_s=1)
    t0 = time.monotonic()
    err = bc.probe_backend()
    elapsed = time.monotonic() - t0
    assert err is not None and "hung" in err
    assert elapsed < 30, f"probe did not enforce its timeout ({elapsed}s)"


def test_probe_error_returns_stderr_tail(fresh_bench_common):
    bc = fresh_bench_common(
        "raise RuntimeError('Unable to initialize backend axon: "
        "UNAVAILABLE')\n", attempts=1)
    err = bc.probe_backend()
    assert err is not None
    assert "UNAVAILABLE" in err


def test_emit_unavailable_is_one_parseable_json_line(fresh_bench_common):
    bc = fresh_bench_common("def devices():\n    return []\n")
    buf = io.StringIO()
    with redirect_stdout(buf):
        bc.emit_unavailable("train_steps_per_s", "x" * 1000, extra_key=7)
    lines = buf.getvalue().strip().splitlines()
    assert len(lines) == 1
    rec = json.loads(lines[0])
    assert rec["metric"] == "train_steps_per_s"
    assert rec["value"] is None
    assert rec["backend_unavailable"] is True
    assert rec["extra_key"] == 7
    assert len(rec["error"]) <= 400  # bounded — a traceback can't flood


def test_require_backend_or_exit_exits_zero_on_outage(fresh_bench_common):
    """The driver treats nonzero rc as a broken bench; an outage must exit 0
    with the structured record on stdout instead."""
    bc = fresh_bench_common(
        "raise RuntimeError('tunnel down')\n", attempts=1)
    buf = io.StringIO()
    with redirect_stdout(buf), pytest.raises(SystemExit) as ei:
        bc.require_backend_or_exit("train_steps_per_s")
    assert ei.value.code == 0
    rec = json.loads(buf.getvalue().strip())
    assert rec["backend_unavailable"] is True


def test_bare_import_of_benches_never_probes(monkeypatch):
    """bench.py/bench_serve.py/hw_proof.py keep the probe under __main__ so
    importing them (tests, smokes) can't spawn a probe subprocess, hang on
    a down tunnel, or sys.exit. An import that probed would hang this test
    for PROBE_TIMEOUT x attempts; keep the knobs tiny so a regression fails
    fast instead of stalling the lane."""
    monkeypatch.setenv("LORA_BENCH_PROBE_ATTEMPTS", "1")
    monkeypatch.setenv("LORA_BENCH_PROBE_TIMEOUT", "1")
    for mod in ("bench", "bench_serve", "hw_proof"):
        sys.modules.pop(mod, None)
        __import__(mod)
