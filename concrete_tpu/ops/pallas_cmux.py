"""Fused CMux step as a Pallas TPU kernel.

One kernel invocation performs the full per-iteration body of the blind
rotation for a batch tile — rotate, signed-decompose, per-prime forward NTT,
MAC against the GGSW spectra, inverse NTT, CRT recombination, accumulate —
entirely VMEM-resident. The XLA version materializes every NTT stage to HBM;
the fused kernel's only HBM traffic is the accumulator tile in/out and the
per-iteration GGSW slice.

The in-kernel NTT uses the roll formulation (math/ntt.RollNttPlans): circular
shifts + selects on a fixed [rows, N] geometry — no reshapes, which Mosaic
does not support across lane boundaries.

Example:
    >>> from concrete_tpu.core.bootstrap import ServerConfig
    >>> from concrete_tpu.ops.pallas_cmux import make_cmux_kernel
    >>> cfg = ServerConfig(lwe_dimension=4, glwe_dimension=1, polynomial_size=64,
    ...     pbs_base_log=7, pbs_level=2, ks_base_log=4, ks_level=3)
    >>> callable(make_cmux_kernel(cfg, tile_b=8, interpret=True))
    True
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..math import ntt


def _roll_lanes(x, shift: int):
    """Circular shift along the last (lane) axis."""
    return pltpu.roll(x, shift, axis=x.ndim - 1)


def _neg_roll(x, shift: int, n: int):
    """x * X^shift (negacyclic, static shift in [0, 2N))."""
    shift = shift % (2 * n)
    neg = shift >= n
    shift = shift % n
    zero = np.uint32(0)
    out = x
    if shift:
        rolled = _roll_lanes(x, shift)
        lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
        out = jnp.where(lane < shift, zero - rolled, rolled)
    return (zero - out) if neg else out


def _mont_mul(x, y, p: int, n_prime: int):
    """u32 Montgomery product (scalars p, n_prime are python ints)."""
    from ..math.mod_arith import mul32_hilo

    hi, lo = mul32_hilo(x, y)
    m = lo * np.uint32(n_prime)
    mhi, _ = mul32_hilo(m, np.uint32(p))
    t = hi + mhi + (lo != 0).astype(jnp.uint32)
    return jnp.where(t >= np.uint32(p), t - np.uint32(p), t)


def _mod_add(x, y, p: int):
    s = x + y
    return jnp.where(s >= np.uint32(p), s - np.uint32(p), s)


def _mod_sub(x, y, p: int):
    return jnp.where(x >= y, x - y, x + (np.uint32(p) - y))


def _fwd_ntt_roll(x, pi: int, rp: ntt.RollNttPlans, tw_ref, wf_ref):
    """In-kernel forward negacyclic NTT (roll butterflies) on [rows, N]."""
    n = rp.n
    p = int(rp.primes[pi])
    npr = int(rp.n_prime[pi])
    x = _mont_mul(x, tw_ref[pi], p, npr)
    log2n = n.bit_length() - 1
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    for s in range(log2n):
        L = n >> s
        m = L // 2
        mask = (lane & (L - 1)) < m  # first half of each block
        w = wf_ref[s, pi][None, :]
        xp = _roll_lanes(x, n - m)
        xm = _roll_lanes(x, m)
        lo = _mod_add(x, xp, p)
        hi = _mont_mul(_mod_sub(xm, x, p), w, p, npr)
        x = jnp.where(mask, lo, hi)
    return x


def _inv_ntt_roll(x, pi: int, rp: ntt.RollNttPlans, untw_ref, wi_ref):
    n = rp.n
    p = int(rp.primes[pi])
    npr = int(rp.n_prime[pi])
    log2n = n.bit_length() - 1
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    for s in reversed(range(log2n)):
        L = n >> s
        m = L // 2
        mask = (lane & (L - 1)) < m
        w = wi_ref[s, pi][None, :]
        v = _mont_mul(x, w, p, npr)
        vp = _roll_lanes(v, n - m)
        um = _roll_lanes(x, m)
        x = jnp.where(mask, _mod_add(x, vp, p), _mod_sub(um, v, p))
    return _mont_mul(x, untw_ref[pi], p, npr)


def make_cmux_kernel(cfg, tile_b: int, interpret: bool = False):
    """Build the fused CMux pallas_call for a ServerConfig. Returns
    fn(acc [k+1, B, N], a_hat [B], ggsw [P, l, k+1, k+1, N]) -> new acc.

    ``interpret=True`` runs the kernel through the Pallas interpreter so CPU
    CI can pin bit-identity against the XLA step (tests/test_bootstrap_mxu).
    Status: measured *slower* than the XLA scan step on v5e (Mosaic's
    roll+select codegen trails XLA's ~2x); kept as the fused-VMEM design
    reference, selectable via CONCRETE_TPU_PALLAS_CMUX=1."""
    rp = ntt.make_roll_plans(cfg.polynomial_size, cfg.primes)
    cc = cfg.crt_context
    n = cfg.polynomial_size
    P = len(cfg.primes)
    l, ks1 = cfg.pbs_level, cfg.glwe_size
    base_log = cfg.pbs_base_log
    bits = cfg.bits
    assert bits == 32, "pallas cmux kernel is u32-torus only for now"
    non_rep = bits - l * base_log
    log2n2 = (2 * n - 1).bit_length()

    # Garner constants for the 2-prime u32 recombine
    assert P == 2, "kernel currently specialized to 2 CRT primes"
    p0, p1 = cfg.primes
    r1 = (1 << 32) % p1
    c_garner = cc.garner_inv[1] * r1 % p1          # inv(p0 mod p1)*R mod p1
    t1_digit, t2_digit = cc.half_digits            # mixed-radix of ceil(M/2)
    m_mod_q = cc.m_mod_q & 0xFFFFFFFF
    np1 = int(ntt.make_plan(n, p1).ctx.n_prime)

    def kernel(a_hat_ref, acc_ref, ggsw_ref, tw_ref, untw_ref, wf_ref, wi_ref, out_ref):
        # acc_ref: [k+1, TB, N]; a_hat_ref: [1, TB]; ggsw: [P, l, ks1, ks1, N]
        # rotate each poly by the per-ct degree (barrel over degree bits)
        diffs = []
        for i in range(ks1):
            x = acc_ref[i]
            deg = a_hat_ref[0][:, None]  # [TB, 1]
            rot = x
            for j in range(log2n2):
                bit = (deg >> j) & 1
                rolled = _neg_roll(rot, 1 << j, n)
                rot = jnp.where(bit == 1, rolled, rot)
            diffs.append(rot - x)  # wrapping diff (ct1 - ct0)

        # signed decomposition of each diff poly -> digits[lev][i] : [TB, N] i32
        digits = [[None] * ks1 for _ in range(l)]
        one = np.uint32(1)
        mask_b = np.uint32((1 << base_log) - 1)
        for i in range(ks1):
            v = diffs[i]
            if non_rep:
                msb = (v >> np.uint32(non_rep - 1)) & one
                v = ((v >> np.uint32(non_rep)) + msb) << np.uint32(non_rep)
            state = v >> np.uint32(bits - base_log * l)
            for step in range(l):
                res = state & mask_b
                state = state >> np.uint32(base_log)
                carry = ((res - one) | state) & res
                carry = carry >> np.uint32(base_log - 1)
                state = state + carry
                dig = res - (carry << np.uint32(base_log))
                digits[l - 1 - step][i] = jax.lax.bitcast_convert_type(dig, jnp.int32)

        # per prime: NTT digits, MAC against GGSW rows, inverse NTT, recombine
        res_p = []
        for pi in range(P):
            p = int(cfg.primes[pi])
            npr = int(rp.n_prime[pi])
            acc_spec = [None] * ks1
            for lev in range(l):
                for i in range(ks1):
                    d = digits[lev][i]
                    dres = jnp.where(d < 0, d + np.int32(p), d).astype(jnp.uint32)
                    dspec = _fwd_ntt_roll(dres, pi, rp, tw_ref, wf_ref)
                    for jcol in range(ks1):
                        g = ggsw_ref[pi, lev, i, jcol][None, :]
                        prod = _mont_mul(dspec, g, p, npr)
                        acc_spec[jcol] = (
                            prod
                            if acc_spec[jcol] is None
                            else _mod_add(acc_spec[jcol], prod, p)
                        )
            res_p.append(
                [_inv_ntt_roll(acc_spec[j], pi, rp, untw_ref, wi_ref) for j in range(ks1)]
            )

        # u32 Garner recombine (2 primes) + accumulate into out
        for jcol in range(ks1):
            x1 = res_p[0][jcol]
            r2 = res_p[1][jcol]
            x1m = jnp.where(x1 >= np.uint32(p1), x1 - np.uint32(p1), x1)
            diff = _mod_sub(r2, x1m, p1)
            x2 = _mont_mul(diff, np.uint32(c_garner), p1, np1)
            v = x1 + np.uint32(p0 & 0xFFFFFFFF) * x2
            ge = (x2 > np.uint32(t2_digit)) | (
                (x2 == np.uint32(t2_digit)) & (x1 >= np.uint32(t1_digit))
            )
            v = v - jnp.where(ge, np.uint32(m_mod_q), np.uint32(0))
            out_ref[jcol] = acc_ref[jcol] + v

    P_, l_, k_ = P, l, ks1

    @functools.partial(jax.jit, static_argnames=())
    def run(acc, a_hat, ggsw):
        # acc: [k+1, B, N]; a_hat: [B]; ggsw: [P, l, k+1, k+1, N]
        b = acc.shape[1]
        assert b % tile_b == 0, (b, tile_b)
        grid = (b // tile_b,)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, tile_b), lambda g: (0, g), memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (k_, tile_b, n), lambda g: (0, g, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(memory_space=pltpu.VMEM),  # ggsw full
                pl.BlockSpec(memory_space=pltpu.VMEM),  # twist
                pl.BlockSpec(memory_space=pltpu.VMEM),  # untwist
                pl.BlockSpec(memory_space=pltpu.VMEM),  # w_fwd
                pl.BlockSpec(memory_space=pltpu.VMEM),  # w_inv
            ],
            out_specs=pl.BlockSpec(
                (k_, tile_b, n), lambda g: (0, g, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct(acc.shape, acc.dtype),
            interpret=interpret,
        )(
            a_hat[None, :].astype(jnp.int32),
            acc,
            ggsw,
            jnp.asarray(rp.twist_fwd),
            jnp.asarray(rp.untwist_inv),
            jnp.asarray(np.stack(rp.w_fwd_full)),   # [stages, P, N]
            jnp.asarray(np.stack(rp.w_inv_full)),
        )

    return run
