"""Deployment diagnostics: `python -m concrete_tpu.diagnose`.

A serving process that cannot reach its accelerator should fail fast and
say why. On remote-attached TPUs (PJRT plugins that proxy to a pooled
chip) the failure mode is nasty: a lost or wedged device claim makes
client creation block FOREVER inside ``jax.devices()`` — observed for
hours after a killed remote compile on a single-tenant chip. This module
probes each layer with a bounded timeout and reports where initialization
stops, so operators see "backend init blocked (wedged claim?)" instead of
a silent hang.

Checks, in order:
1. import + version report (jax, jaxlib, numpy, this package);
2. backend init (``jax.devices()``) under a timeout, in a thread;
3. a tiny matmul round trip (forced host pull — ``block_until_ready`` can
   return at enqueue time on some remote platforms);
4. backend classification: TPU / CPU / other, MXU path eligibility.

Exit code 0 = compute path live; 1 = backend init or execution failed.

``python -m concrete_tpu.diagnose wait [max_wait_s]`` polls instead of
reporting once: fresh-subprocess probes (a blocked PJRT init never
unblocks within a process) every 2 minutes until the accelerator answers
or the budget runs out — the operator tool for sitting out a wedged-claim
drain.

Reference analog: none (the reference's CPU backend cannot be absent);
this is the deployment counterpart of its build-time feature detection
(concrete-csprng x86_64 AES-NI gating, concrete-csprng/src/lib.rs).
"""

from __future__ import annotations

import sys
import threading
import time


def _bounded(fn, timeout_s: float):
    """Run fn() in a daemon thread; return (status, value_or_error).

    >>> _bounded(lambda: 7, 5.0)[0]
    'ok'
    >>> _bounded(lambda: 1 / 0, 5.0)
    ('ERROR', 'ZeroDivisionError: division by zero')
    >>> import time
    >>> _bounded(lambda: time.sleep(60), 0.05)[0]
    'BLOCKED'
    """
    out: dict = {}

    def run():
        try:
            out["value"] = fn()
        except Exception as e:  # noqa: BLE001 — diagnostic surface
            out["error"] = f"{type(e).__name__}: {e}"

    th = threading.Thread(target=run, daemon=True)
    t0 = time.perf_counter()
    th.start()
    th.join(timeout_s)
    dt = time.perf_counter() - t0
    if th.is_alive():
        return "BLOCKED", f"still blocked after {timeout_s:.0f}s"
    if "error" in out:
        return "ERROR", out["error"]
    return "ok", (out["value"], dt)


def main(timeout_s: float = 120.0) -> int:
    import numpy as np

    import concrete_tpu

    print(f"concrete_tpu {concrete_tpu.__version__}  "
          f"python {sys.version.split()[0]}  numpy {np.__version__}")
    import jax
    import jaxlib

    print(f"jax {jax.__version__}  jaxlib {jaxlib.__version__}")

    status, res = _bounded(jax.devices, timeout_s)
    if status != "ok":
        print(f"backend init: {status} — {res}")
        if status == "BLOCKED":
            print("  likely a wedged/lost remote device claim (single-tenant"
                  " chips stay wedged while an orphaned compile drains);"
                  " retry later or from a fresh pool session")
        return 1
    devices, dt = res
    print(f"backend init: ok ({dt:.1f}s) — {devices}")
    kind = getattr(devices[0], "device_kind", "?")
    plat = jax.default_backend()
    print(f"device_kind: {kind}  platform: {plat}")

    import jax.numpy as jnp

    def matmul():
        x = jnp.ones((512, 512), jnp.bfloat16)
        y = jax.jit(lambda a: a @ a)(x)
        return float(np.asarray(y)[0, 0])  # forced host round trip

    status, res = _bounded(matmul, timeout_s)
    if status != "ok":
        print(f"matmul round trip: {status} — {res}")
        return 1
    val, dt = res
    print(f"matmul round trip: ok ({dt:.1f}s, got {val})")

    from concrete_tpu.core import bootstrap_mxu as bsx

    on_tpu = bsx._on_tpu()
    print(f"MXU toeplitz path eligible: {on_tpu} "
          f"({'production TPU path' if on_tpu else 'NTT fallback backend'})")
    return 0


def wait(max_wait_s: float = 3600.0, probe_timeout_s: float = 120.0,
         interval_s: float = 120.0, allow_cpu: bool = False) -> int:
    """Poll until the accelerator answers; exit 0 the moment it does.

    Once a process's PJRT client creation has blocked, it stays blocked for
    that process's lifetime — so every probe must run in a FRESH subprocess.
    Useful on single-tenant remote chips, which stay wedged while an
    orphaned compile drains (observed minutes to hours, scaling with how
    long the killed compile had been running).

    A probe whose plugin ERRORS (rather than blocks) can leave JAX silently
    falling back to the CPU backend; that is NOT the accelerator answering,
    so the probe reports CPU_FALLBACK and the wait continues (unless
    ``allow_cpu`` — for rigs where CPU is the intended backend).
    """
    import subprocess
    import time as _time

    probe_src = (
        "import jax, jax.numpy as jnp, numpy as np;"
        "x = jnp.ones((256, 256), jnp.bfloat16);"
        "v = np.asarray(jnp.dot(x, x))[0, 0];"
        "tag = 'CPU_FALLBACK' if jax.default_backend() == 'cpu' else 'LIVE';"
        "print(tag, v, jax.devices()[0].device_kind)"
    )
    ok_tags = ("LIVE", "CPU_FALLBACK") if allow_cpu else ("LIVE",)
    deadline = _time.monotonic() + max_wait_s
    attempt = 0
    while True:
        attempt += 1
        try:
            r = subprocess.run(
                [sys.executable, "-c", probe_src], capture_output=True,
                text=True, timeout=probe_timeout_s)
            first_word = (r.stdout.strip().splitlines() or [""])[-1].split(
                " ")[0]
            if r.returncode == 0 and first_word in ok_tags:
                print(f"accelerator LIVE (attempt {attempt}): "
                      f"{r.stdout.strip().splitlines()[-1]}")
                return 0
            if r.returncode == 0 and first_word == "CPU_FALLBACK":
                print(f"attempt {attempt}: plugin errored, JAX fell back to"
                      " CPU — accelerator still down", flush=True)
                tail = None
            else:
                tail = (r.stderr or r.stdout).strip().splitlines()
            if tail is not None:
                print(f"attempt {attempt}: probe failed"
                      f" ({tail[-1][:120] if tail else 'no output'})",
                      flush=True)
        except subprocess.TimeoutExpired:
            print(f"attempt {attempt}: still blocked after"
                  f" {probe_timeout_s:.0f}s (wedged claim draining?)",
                  flush=True)
        if _time.monotonic() + interval_s > deadline:
            print(f"accelerator still unavailable after {max_wait_s:.0f}s")
            return 1
        _time.sleep(interval_s)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "wait":
        mw = float(sys.argv[2]) if len(sys.argv) > 2 else 3600.0
        sys.exit(wait(mw))
    t = float(sys.argv[1]) if len(sys.argv) > 1 else 120.0
    sys.exit(main(t))
