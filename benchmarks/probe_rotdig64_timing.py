"""Clean steady-state timing of the u64 PBS: plane path OFF vs ON.

The pbs/pair stages of probe_rotdig64.py disagreed on the OFF baseline
(1049 ms after a 246 s compile vs 495 ms in a fresh process) — this
probe times each config with 5 synchronized reps in one process (each rep
blocks on its output before the next dispatch), OFF first, so the number
is steady-state and comparable.

NOTE: the env var is TRACE-TIME-bound — the OFF/ON comparison is only
valid because each _timed call builds a fresh jax.jit lambda, so the flag
is re-read when that lambda traces. Never reuse a jitted fn across the
flag flip.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from probe_rotdig64 import _setup  # noqa: E402


def _timed(cfg, bsk, lut, lwe, tag, reps=5):
    import jax

    from concrete_tpu.core import bootstrap_mxu as bsx

    fn = jax.jit(lambda k_, u, w: bsx.bootstrap_mxu(cfg, k_, u, w))
    t0 = time.perf_counter()
    out = np.asarray(fn(bsk, lut, lwe)[:4, :4])
    print(f"{tag}: compile+first {time.perf_counter()-t0:.1f} s", flush=True)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        full = fn(bsk, lut, lwe)
        np.asarray(full[:1, :1])
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(f"{tag}: reps {[f'{t*1e3:.0f}' for t in times]} ms; "
          f"best {best*1e3:.0f} ms -> {lwe.shape[0]/best:.0f} PBS/s",
          flush=True)
    return np.asarray(fn(bsk, lut, lwe))


if __name__ == "__main__":
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    cfg, plan, bsk, lut, lwe = _setup(N, k)
    os.environ["CONCRETE_TPU_ROTDIG64"] = "0"
    base = _timed(cfg, bsk, lut, lwe, "plane OFF")
    os.environ["CONCRETE_TPU_ROTDIG64"] = "1"
    got = _timed(cfg, bsk, lut, lwe, "plane ON")
    assert np.array_equal(base, got), "BIT MISMATCH"
    print("bit-identity: OK", flush=True)
