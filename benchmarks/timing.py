"""Trustworthy TPU timing under the axon remote platform.

block_until_ready() on this platform can return at enqueue time, so every
measurement MUST round-trip a (tiny) result to the host. time_device() times
a chained scan of `reps` applications of fn and subtracts the measured
host round-trip overhead.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def _rtt():
    """One tiny dispatch+transfer round trip (amortize-measured)."""
    x = jnp.zeros((8, 128), jnp.float32)
    f = jax.jit(lambda v: v + 1.0)
    np.asarray(f(x))
    t0 = time.perf_counter()
    n = 5
    for _ in range(n):
        np.asarray(f(x))
    return (time.perf_counter() - t0) / n


def time_device(step, init, reps=32, warmup=True):
    """step: x -> x (same structure). Returns seconds per step (device time).

    Chains `reps` applications inside one jit; forces completion by pulling a
    tiny slice of the result to the host; subtracts the measured RTT.
    """

    @jax.jit
    def run(x):
        def body(c, _):
            return step(c), None

        out, _ = jax.lax.scan(body, x, None, length=reps)
        return jax.tree_util.tree_map(lambda a: a.ravel()[:8], out)

    if warmup:
        np.asarray(jax.tree_util.tree_leaves(run(init))[0])
    rtt = _rtt()
    t0 = time.perf_counter()
    np.asarray(jax.tree_util.tree_leaves(run(init))[0])
    total = time.perf_counter() - t0
    return max(total - rtt, 1e-9) / reps


def time_fn(fn, *args, reps=5):
    """Times fn(*args) end-to-end including one host pull per call.
    For big single computations where chaining isn't possible."""
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:8])
    rtt = _rtt()
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:8])
    return max((time.perf_counter() - t0) / reps - rtt, 1e-9)
