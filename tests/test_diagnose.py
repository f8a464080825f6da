"""The deployment diagnostic CLI (concrete_tpu.diagnose).

The _bounded helper's three outcomes are pinned by doctests (auto-
discovered); these tests cover the wait-mode state machine, which shells
out a fresh subprocess per probe (a blocked PJRT init never unblocks
within a process, so in-process retries would be meaningless).
"""

import subprocess
import sys

from concrete_tpu import diagnose


def _patch_run(monkeypatch, results):
    """Feed wait() a scripted sequence of probe outcomes."""
    seq = iter(results)

    def fake_run(cmd, **kw):
        r = next(seq)
        if r == "timeout":
            raise subprocess.TimeoutExpired(cmd, kw.get("timeout"))
        rc, out = r
        return subprocess.CompletedProcess(cmd, rc, stdout=out, stderr="")

    monkeypatch.setattr(subprocess, "run", fake_run)


def test_wait_returns_0_when_probe_goes_live(monkeypatch):
    _patch_run(monkeypatch, ["timeout", (0, "LIVE 256.0 TPU v5 lite\n")])
    monkeypatch.setattr("time.sleep", lambda s: None)
    assert diagnose.wait(max_wait_s=600, probe_timeout_s=1, interval_s=1) == 0


def test_wait_returns_1_on_budget_exhaustion(monkeypatch):
    _patch_run(monkeypatch, ["timeout"] * 50)
    monkeypatch.setattr("time.sleep", lambda s: None)
    # interval > budget: exactly one probe, then give up
    assert diagnose.wait(max_wait_s=0.5, probe_timeout_s=1, interval_s=1) == 1


def test_wait_treats_probe_error_as_not_live(monkeypatch):
    _patch_run(monkeypatch,
               [(1, "RuntimeError: backend 'axon' failed\n"),
                (0, "LIVE 256.0 TPU v5 lite\n")])
    monkeypatch.setattr("time.sleep", lambda s: None)
    assert diagnose.wait(max_wait_s=600, probe_timeout_s=1, interval_s=1) == 0


def test_wait_rejects_silent_cpu_fallback(monkeypatch):
    """A plugin that ERRORS (instead of blocking) can leave JAX on the CPU
    backend; a wait-for-accelerator must not declare that LIVE — the
    serving job would land on the 100x-slower portable path."""
    _patch_run(monkeypatch,
               [(0, "CPU_FALLBACK 256.0 cpu\n"),
                (0, "LIVE 256.0 TPU v5 lite\n")])
    monkeypatch.setattr("time.sleep", lambda s: None)
    assert diagnose.wait(max_wait_s=600, probe_timeout_s=1, interval_s=1) == 0


def test_wait_allow_cpu_accepts_fallback(monkeypatch):
    _patch_run(monkeypatch, [(0, "CPU_FALLBACK 256.0 cpu\n")])
    monkeypatch.setattr("time.sleep", lambda s: None)
    assert diagnose.wait(max_wait_s=600, probe_timeout_s=1, interval_s=1,
                         allow_cpu=True) == 0


def test_wait_probe_source_forces_host_pull():
    """The probe must pull bytes to the host (np.asarray) — on this
    platform block_until_ready can return at enqueue time, so a probe
    without a pull could report LIVE against a wedged chip."""
    import inspect

    src = inspect.getsource(diagnose.wait)
    assert "np.asarray" in src and sys.executable  # sanity anchor
