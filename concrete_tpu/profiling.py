"""Profiling and roofline accounting for the server-side kernels.

The reference's performance tooling is criterion benchmarks; on TPU the
equivalents are jax.profiler traces plus an analytic roofline model: this
module computes per-op work (u32 lane-ops and HBM bytes) so measured times
can be compared against compute- and bandwidth-bound limits.

Example:
    >>> from concrete_tpu.profiling import ntt_roofline
    >>> r = ntt_roofline(1024, 2, 3, 256)
    >>> r.bound_seconds() > 0
    True
"""

from __future__ import annotations

import contextlib
import dataclasses
import time


@dataclasses.dataclass
class Roofline:
    """Work accounting for one op invocation."""

    name: str
    lane_ops: float          # elementary u32 VPU ops
    hbm_bytes: float         # minimum HBM traffic (inputs+outputs once)

    def bound_seconds(self, vpu_ops_per_s: float = 4e12, hbm_bytes_per_s: float = 8.1e11):
        """Speed-of-light time: max(compute, bandwidth) bound.

        Defaults approximate a TPU v5e chip (peak vector u32 throughput and
        HBM bandwidth); override for other parts.
        """
        return max(self.lane_ops / vpu_ops_per_s, self.hbm_bytes / hbm_bytes_per_s)


# Cost model constants (ops per element) for the u32 Montgomery pipeline.
MONT_MUL_OPS = 12          # 2x mul32_hilo (4 mults + folds) + REDC adds/selects
MOD_ADD_OPS = 3
BUTTERFLY_OPS = MONT_MUL_OPS + 2 * MOD_ADD_OPS + 4  # rolls/selects amortized


def ntt_roofline(n: int, n_polys: int, n_primes: int, batch: int) -> Roofline:
    """One batched forward (or inverse) NTT."""
    import math

    stages = int(math.log2(n))
    elems = batch * n_polys * n_primes * n
    ops = elems * (stages * BUTTERFLY_OPS + MONT_MUL_OPS)  # + twist
    return Roofline("ntt", ops, elems * 4 * 2)


def external_product_roofline(cfg, batch: int) -> Roofline:
    """One batched external product (decompose + NTT + MAC + INTT + CRT)."""
    import math

    n = cfg.polynomial_size
    P = len(cfg.primes)
    l, ks1 = cfg.pbs_level, cfg.glwe_size
    stages = int(math.log2(n))
    fwd = batch * l * ks1 * P * n * (stages * BUTTERFLY_OPS + MONT_MUL_OPS)
    mac = batch * l * ks1 * ks1 * P * n * (MONT_MUL_OPS + MOD_ADD_OPS)
    inv = batch * ks1 * P * n * (stages * BUTTERFLY_OPS + MONT_MUL_OPS)
    dec = batch * ks1 * n * (l * 8 + 4)
    crt = batch * ks1 * n * (P - 1) * (2 * MONT_MUL_OPS + 8)
    ggsw_bytes = l * ks1 * ks1 * P * n * 4
    io_bytes = batch * ks1 * n * 4 * 2 + ggsw_bytes
    return Roofline("external_product", fwd + mac + inv + dec + crt, io_bytes)


def pbs_roofline(cfg, batch: int) -> Roofline:
    ep = external_product_roofline(cfg, batch)
    n_iter = cfg.lwe_dimension
    rot = batch * cfg.glwe_size * cfg.polynomial_size * 4 * 12  # barrel stages
    return Roofline("pbs", n_iter * (ep.lane_ops + rot), n_iter * ep.hbm_bytes)


@contextlib.contextmanager
def trace(path: str = "/tmp/concrete_tpu_trace"):
    """jax.profiler trace context (view with tensorboard / xprof)."""
    import jax

    jax.profiler.start_trace(path)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def measure(fn, *args, reps: int = 3):
    """Wall-clock an already-jitted function (device-synchronized)."""
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def report_pbs_efficiency(cfg, batch: int, measured_seconds: float) -> dict:
    """Compare a measured PBS time against the roofline."""
    rl = pbs_roofline(cfg, batch)
    sol = rl.bound_seconds()
    return {
        "lane_ops": rl.lane_ops,
        "hbm_bytes": rl.hbm_bytes,
        "speed_of_light_s": sol,
        "measured_s": measured_seconds,
        "efficiency": sol / measured_seconds if measured_seconds else 0.0,
    }


def mxu_external_product_roofline(
    n_iterations: int,
    poly_size: int,
    glwe_size: int,
    level: int,
    n_sub: int,
    n_limbs: int,
    batch: int,
    mxu_macs_per_s: float = 1.97e14,
) -> Roofline:
    """Blind rotation on the toeplitz-matmul path (core/bootstrap_mxu.py).

    The dominant term is the int8 MXU dot per CMux:
    [B, R*N] x [R*N, (k+1)*n_limbs*N] with R = level*(k+1)*n_sub. HBM
    traffic per iteration: the compact rings in, the built RHS out+in, the
    S accumulator out+in, the digit matrix, and the accumulator update.
    """
    big_n = poly_size
    rows = level * glwe_size * n_sub * big_n
    cols = glwe_size * n_limbs * big_n
    macs = n_iterations * batch * rows * cols
    rhs_bytes = rows * cols
    s_bytes = batch * cols * 4
    acc_bytes = glwe_size * batch * big_n * 4
    per_iter_hbm = 2 * rhs_bytes + 2 * s_bytes + batch * rows + 3 * acc_bytes
    r = Roofline(
        name=f"mxu_blind_rotate(N={big_n}, B={batch})",
        lane_ops=0.0,
        hbm_bytes=float(n_iterations * per_iter_hbm),
    )
    # report the MXU bound through lane_ops-equivalent by reusing the field:
    # bound_seconds() callers should use mxu_bound_seconds for this op.
    r.mxu_macs = float(macs)  # type: ignore[attr-defined]
    r.mxu_bound_s = macs / mxu_macs_per_s  # type: ignore[attr-defined]
    return r
