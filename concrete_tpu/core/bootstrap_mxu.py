"""MXU-native programmable bootstrapping: the external product as an exact
negacyclic *toeplitz matmul mod 2^32* on the int8 MXU path.

Why this beats the NTT in the hot loop (measured on v5e):
- The spectral path is pure VPU u32 work (Montgomery butterflies); the VPU
  sustains ~0.17 Tmontmul/s, capping gate throughput near 700/s.
- The MXU sustains ~400 int8 TOPS. The external product
  ``sum_{lev,i} d_{lev,i} (*) g_{lev,i,j}`` is a contraction with K = l*(k+1)*N
  when written against negacyclic toeplitz blocks of the GGSW polynomials —
  a perfect deep-K matmul.

Exactness (bit-identical to the NTT path, crypto/bootstrap/fourier/mod.rs
semantics without the FFT rounding noise):
- gadget digits are |d| <= B/2; digits wider than int8 are split exactly as
  d = 2^s*d_hi + d_lo (both sub-digits int8; the split is algebraic identity,
  so no convention change and no noise change);
- each u32 torus coefficient of the key is decomposed into 4 *balanced*
  signed-byte limbs c_m in [-128,127] with carry propagation, so
  sum_m c_m 2^{8m} == v (mod 2^32);
- the i8 x i8 -> i32 MXU accumulation over K <= 12N rows is bounded by
  12N * 64 * 128 < 2^26, i.e. exact in int32;
- the final limb recombination sum_m S_m << 8m in wrapping int32 arithmetic
  IS the result mod 2^32.

Per-iteration dataflow (one CMux of the blind rotation, batch B):
    XLA    : barrel-rotate accumulator by per-lane a_hat, wrapping diff,
             signed gadget decomposition -> digit matrix D [B, R*N] int8
    Pallas : expand the iteration's GGSW into negacyclic toeplitz tables
             T32 [R, N, k+1, N] u32 (balanced limbs packed per word),
             built VMEM-resident by log-doubling of rotation rings
    XLA    : bitcast T32 -> int8 [R*N, (k+1)*N*4]; one dot_general on the
             MXU; limb-recombine; accumulate into the GLWE accumulator.

Reference algorithm: blind_rotate (fourier/mod.rs:666-726), external_product
(:463-645), cmux (:648-664). The per-iteration "skip if mask == 0" branch is
dropped (a zero rotation contributes exactly 0 — branchless identical).

Example:
    >>> from concrete_tpu.core.bootstrap import ServerConfig
    >>> from concrete_tpu.core.bootstrap_mxu import MxuPlan
    >>> cfg = ServerConfig(lwe_dimension=4, glwe_dimension=1, polynomial_size=64,
    ...     pbs_base_log=7, pbs_level=2, ks_base_log=4, ks_level=3)
    >>> plan = MxuPlan.from_config(cfg)
    >>> (plan.row_blocks, plan.n_limbs, plan.limbs_used)
    (4, 4, 4)
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..math import decomposition, polynomial
from . import lwe as lwe_ops
from .bootstrap import (
    ServerConfig,
    pbs_modulus_switch,
    sample_extract,
    sample_extract_nth,
)

# ---------------------------------------------------------------------------
# plan
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class MxuPlan:
    """Static layout info for the toeplitz-matmul external product."""

    lwe_dimension: int
    glwe_size: int          # k+1
    polynomial_size: int
    base_log: int
    level: int
    n_sub: int              # sub-digits per gadget digit (int8-fitting chunks)
    ks_base_log: int
    ks_level: int
    bits: int = 32          # torus width: 32 (boolean) or 64 (highlevel)
    limb_drop: int = 0      # low GGSW byte limbs dropped (reduced precision)

    # balanced 7-bit chunking: d = sum_j 2^{7j} e_j, every e_j in [-64, 64]
    SUB_CHUNK_BITS = 7

    @classmethod
    def from_config(cls, cfg: ServerConfig) -> "MxuPlan":
        if cfg.bits not in (32, 64):
            raise NotImplementedError("mxu bootstrap path: u32/u64 torus only")
        # |digit| <= B/2; int8 operands must stay within [-128, 127] and every
        # sub-digit within +-64 so i32 accumulation stays exact.
        if cfg.polynomial_size > 4096:
            raise NotImplementedError(
                "toeplitz RHS is O(N^2) per CMux; beyond N=4096 the exact-NTT"
                " backend is the right path (auto backend falls back)")
        bl = cfg.pbs_base_log
        n_sub = 1 if bl <= 7 else (bl - 8) // 7 + 2
        k_rows = cfg.pbs_level * (cfg.glwe_dimension + 1) * n_sub * cfg.polynomial_size
        if k_rows * 64 * 128 >= 2 ** 31:
            raise NotImplementedError(
                f"int32 MXU accumulation bound exceeded (K={k_rows}): "
                "use the ntt backend for this configuration")
        return cls(
            lwe_dimension=cfg.lwe_dimension,
            glwe_size=cfg.glwe_size,
            polynomial_size=cfg.polynomial_size,
            base_log=bl,
            level=cfg.pbs_level,
            n_sub=n_sub,
            ks_base_log=cfg.ks_base_log,
            ks_level=cfg.ks_level,
            bits=cfg.bits,
            limb_drop=getattr(cfg, "mxu_limb_drop", 0),
        )

    def sub_multiplier(self, sub: int) -> int:
        """2^{7j} weight of sub-digit `sub` (sub=0 = most significant)."""
        return 1 << (self.SUB_CHUNK_BITS * (self.n_sub - 1 - sub))

    @property
    def n_words(self) -> int:
        """u32 words per torus coefficient (1 for u32, 2 for u64)."""
        return self.bits // 32

    @property
    def n_limbs(self) -> int:
        """signed-byte limbs per torus coefficient."""
        return self.bits // 8

    @property
    def limbs_used(self) -> int:
        """GGSW byte limbs actually carried by the RHS/recombine
        (n_limbs - limb_drop; the dropped low limbs round the key operand)."""
        return self.n_limbs - self.limb_drop

    @property
    def row_blocks(self) -> int:
        """R = number of N-row blocks in the digit matrix."""
        return self.level * self.glwe_size * self.n_sub


# ---------------------------------------------------------------------------
# key conversion: BSK -> per-iteration limb-packed rotation rings
# ---------------------------------------------------------------------------


def _limb_pack(v):
    """Pack the balanced signed-byte limb decomposition of u32/u64 `v` into
    same-width words (byte m = limb c_m mod 256; carries propagate upward and
    the top carry wraps, so the bytes recompose to v exactly)."""
    bits = v.dtype.itemsize * 8
    one = v.dtype.type(1)
    w = v
    with np.errstate(over="ignore"):
        for b in range(7, bits - 8, 8):
            w = w + (((w >> v.dtype.type(b)) & one) << v.dtype.type(b + 1))
    return w


def bsk_to_mxu(bsk_data, cfg: ServerConfig):
    """[n, l, k+1, k+1, N] u32 BSK -> toeplitz rotation rings
    [n, R, k+1, 2N] u32 (limb-packed; ring = [limbs(+g'), limbs(-g')]).

    Row-block order (lev, sub, ki) with sub=0 the 2^s-scaled high half when
    the digit split is active. Precomputing the negated half avoids per-byte
    negation in the hot loop (balanced limbs of -g != -limbs of g).
    """
    plan = MxuPlan.from_config(cfg)
    dt = np.uint32 if plan.bits == 32 else np.uint64
    bsk = np.asarray(bsk_data, dtype=dt)
    n, l, ks1, _, N = bsk.shape
    rings = np.empty(
        (n, plan.row_blocks, ks1, plan.n_words, 2 * N), dtype=np.uint32)
    blk = 0
    with np.errstate(over="ignore"):
        for lev in range(l):
            for sub in range(plan.n_sub):
                mult = dt(plan.sub_multiplier(sub))
                for ki in range(ks1):
                    g = bsk[:, lev, ki, :, :] * mult  # [n, k+1, N] wrapping
                    pos = _limb_pack(g)
                    neg = _limb_pack((dt(0) - g).astype(dt))
                    for w in range(plan.n_words):
                        sh = dt(32 * w)
                        rings[:, blk, :, w, :N] = (pos >> sh).astype(np.uint32)
                        rings[:, blk, :, w, N:] = (neg >> sh).astype(np.uint32)
                    blk += 1
    return rings.reshape(n, plan.row_blocks, ks1 * plan.n_words, 2 * N)


# ---------------------------------------------------------------------------
# toeplitz table build (the only Pallas piece; jnp fallback off-TPU)
# ---------------------------------------------------------------------------


def _kept_limbs(n_words: int, limb_drop: int, limb_hi_drop: int = 0):
    """Kept (word, byte) pairs in ascending global-limb order.

    limb_drop removes LOW limbs (reduced-precision fast mode);
    limb_hi_drop removes HIGH limbs — used by the Nussbaumer-domain tables,
    whose values only occupy w' = bits + log2(2L) < 8*n_limbs bits (dropping
    limbs with shift >= ceil(w'/8)*8 is exact mod 2^(8*kept))."""
    return [(w, m) for w in range(n_words) for m in range(4)
            if limb_drop <= 4 * w + m < 4 * n_words - limb_hi_drop]


def _build_tables_jnp(rings, N: int, n_words: int = 1, limb_drop: int = 0,
                      limb_hi_drop: int = 0):
    """rings [R, planes, 2N] u32 -> RHS [R*N, ks1*L*N] i8: row (blk, r),
    column (kj, limb, c) holds byte limb of (X^r * ring_plane)[c] — the
    negacyclic toeplitz matrix T[r, c] = limb(ring[(c - r) mod 2N]).
    planes = (k+1)*n_words word-planes; L = 4*n_words - limb_drop kept
    limbs (the lowest `limb_drop` byte limbs are dropped: reduced-precision
    external product, see ServerConfig.mxu_limb_drop)."""
    r_blocks, planes, _ = rings.shape
    ks1 = planes // n_words
    x = rings[:, :, None, :]  # [R, planes, 1, 2N]
    rows = 1
    while rows < N:
        x = jnp.concatenate([x, jnp.roll(x, rows, axis=-1)], axis=2)
        rows *= 2
    cols = x[..., :N]  # [R, planes, N(rows), N(cols)]
    mask = np.uint32(0xFF)
    kept = _kept_limbs(n_words, limb_drop, limb_hi_drop)
    limbs = jnp.stack(
        [((cols[:, kj * n_words + w] >> np.uint32(8 * m)) & mask).astype(jnp.int8)
         for kj in range(ks1) for (w, m) in kept],
        axis=1,
    )  # [R, (kj, limb), N, N]
    rhs = jnp.moveaxis(limbs, 1, 2)  # [R, N, (kj, limb), N]
    return rhs.reshape(r_blocks * N, ks1 * len(kept) * N)


@functools.lru_cache(maxsize=None)
def _build_tables_pallas(r_blocks: int, planes: int, N: int,
                         n_words: int = 1, limb_drop: int = 0,
                         limb_hi_drop: int = 0,
                         interpret: bool = False, tile: int | None = None):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    mask = np.uint32(0xFF)
    ks1 = planes // n_words
    kept = _kept_limbs(n_words, limb_drop, limb_hi_drop)
    n_kept = len(kept)
    # Row-tile the doubling so scratch ([T, 2N] u32) and the output block
    # ([T, planes*4*N] i8) stay within VMEM at large N. Tile t seeds from
    # roll(ring, t*T) (dynamic-scalar roll), then log-doubles T rows.
    #
    # Tile choice was swept on v5e with chained >=100 ms timing (shorter
    # chains through the ~25 ms tunnel RTT produce bogus 2-6x "effects"):
    # the single-tile default and N/2 / N/8 row tiles are equal at N=1024
    # (u32 80 us = 1.30x write floor; u64 158 us = 1.29x), and the
    # single-tile build WINS at u64/N=512 (15 us vs 41 tiled). One hard
    # cliff: tile=64 at u64/N=1024 HANGS the remote Mosaic compiler (like
    # the strided-roll build, TODO.md) — never tile below 128 rows.
    if tile is None:
        tile = min(N, max(8, (1 << 22) // N))
        # limb-aware VMEM cap (round 5): the output block
        # [T, ks1*n_kept*N] i8 must fit VMEM double-buffered. 32 MB is the
        # largest swept working point (u32 N=2048); the u64 N=2048 shape
        # (64 MB single-tile) crashed the remote compile helper. Halve
        # rows until within budget — but never below 128 (smaller tiles
        # hang the remote Mosaic compiler, TODO.md).
        while tile > 128 and tile * ks1 * n_kept * N > (1 << 25):
            tile //= 2
    n_tiles = N // tile

    def kernel(e_ref, o_ref):
        r0 = pl.program_id(1) * tile if n_tiles > 1 else 0
        for kj in range(ks1):
            for w in range(n_words):
                ms = [m for (ww, m) in kept if ww == w]
                if not ms:
                    continue
                x = e_ref[0, kj * n_words + w][None, :]  # [1, 2N]
                if n_tiles > 1:
                    x = pltpu.roll(x, jnp.int32(r0), axis=1)
                rows = 1
                while rows < tile:
                    rolled = pltpu.roll(x, np.int32(rows), axis=1)
                    x = jnp.concatenate([x, rolled], axis=0)
                    rows *= 2
                cols = x[:, :N]
                for m in ms:
                    limb = (cols >> np.uint32(8 * m)) & mask
                    c0 = (kj * n_kept + kept.index((w, m))) * N
                    o_ref[:, c0:c0 + N] = limb.astype(jnp.int8)

    grid = (r_blocks,) if n_tiles == 1 else (r_blocks, n_tiles)
    if n_tiles == 1:
        in_index = lambda r: (r, 0, 0)          # noqa: E731
        out_index = lambda r: (r, 0)            # noqa: E731
    else:
        in_index = lambda r, t: (r, 0, 0)       # noqa: E731
        out_index = lambda r, t: (r * n_tiles + t, 0)  # noqa: E731
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, planes, 2 * N), in_index, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, ks1 * n_kept * N), out_index,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (r_blocks * N, ks1 * n_kept * N), jnp.int8),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )


def _on_tpu() -> bool:
    """True when the default backend is TPU hardware. The backend name can be
    a vendor plugin (e.g. a tunneled platform), so check the device kind."""
    backend = jax.default_backend()
    if backend == "tpu":
        return True
    if backend == "cpu":
        return False
    try:
        return "tpu" in jax.devices()[0].device_kind.lower()
    except Exception:  # pragma: no cover - exotic platforms
        return False


def build_tables(rings, N: int, n_words: int = 1, limb_drop: int = 0,
                 limb_hi_drop: int = 0):
    """Dispatch toeplitz expansion: Pallas on TPU, jnp elsewhere."""
    r_blocks, planes, _ = rings.shape
    if _on_tpu():
        # the package enables x64 globally (u64 torus support); Mosaic wants
        # i32 grid/index arithmetic, so trace the kernel in x32 mode.
        with jax.enable_x64(False):
            return _build_tables_pallas(
                r_blocks, planes, N, n_words, limb_drop,
                limb_hi_drop)(rings)
    return _build_tables_jnp(rings, N, n_words, limb_drop, limb_hi_drop)


# ---------------------------------------------------------------------------
# fused rotation + digit extraction (VPU Pallas kernel)
# ---------------------------------------------------------------------------


def _kernel_barrel_rotate(x, ah, n: int):
    """Negacyclic X^ah * x on one [T, N] u32 block inside a Pallas kernel:
    barrel rotation over the bits of ah [T, 1] i32 (degrees in [0, 2N)).
    Static slice+concat rolls only — dynamic roll ops have hung this remote
    Mosaic toolchain (TODO.md). Shared verbatim by every rotdig kernel so
    the bit-identical contract has a single definition."""
    rot = x
    for j in range((2 * n - 1).bit_length()):
        s = 1 << j
        if s < n:
            rolled = jnp.concatenate(
                [np.uint32(0) - rot[:, n - s:], rot[:, :n - s]], axis=1)
        else:                                                # X^N == -1
            rolled = np.uint32(0) - rot
        bit = (ah >> j) & 1
        rot = jnp.where(bit == 1, rolled, rot)
    return rot


def _split_subdigits(digit, n_sub: int):
    """Balanced SUB_CHUNK_BITS-wide chunks of a signed gadget digit,
    returned MSB-first: d = sum_j 2^(7j) e_j with |e_j| <= 64, so every
    chunk fits a signed byte for the MXU. The single shared definition of
    the (lev, sub, ki) sub-digit order — used by both the XLA path
    (_digit_matrix) and the Pallas kernel (_kernel_emit_digits), which must
    stay bit-identical. `digit` is any i32 jnp array; traced values work
    inside kernels."""
    if n_sub == 1:
        return (digit,)
    w = MxuPlan.SUB_CHUNK_BITS
    half = np.int32(1 << (w - 1))
    msk = np.int32((1 << w) - 1)
    rem = digit
    chunks = []
    for _ in range(n_sub - 1):
        e = ((rem + half) & msk) - half   # balanced low chunk in [-64, 64)
        rem = (rem - e) >> np.int32(w)
        chunks.append(e)
    chunks.append(rem)                    # |rem| <= 64 by the n_sub choice
    return tuple(reversed(chunks))        # MSB-first


def _kernel_emit_digits(o_ref, diff, ki: int, ks1: int, n: int,
                        base_log: int, level: int, col_base: int = 0,
                        n_sub: int = 1):
    """Signed gadget decomposition of one polynomial's rotation delta
    `diff` [T, N] u32, written as int8 digit rows into o_ref at column
    blocks col_base + ((lev*n_sub + sub)*ks1 + ki)*n. The unrolled
    closest_representable + decompose_levels form (math/decomposition.py),
    level-l first; for n_sub > 1 each digit splits into balanced 7-bit
    chunks emitted MSB-first (the _digit_matrix sub-digit order)."""
    non_rep = 32 - base_log * level
    if non_rep:
        msb = (diff >> np.uint32(non_rep - 1)) & np.uint32(1)
        diff = ((diff >> np.uint32(non_rep)) + msb) << np.uint32(non_rep)
    state = diff >> np.uint32(32 - base_log * level)
    _kernel_emit_state_digits(o_ref, state, ki, ks1, n, base_log, level,
                              col_base, n_sub)


def _kernel_emit_state_digits(o_ref, state, ki: int, ks1: int, n: int,
                              base_log: int, level: int, col_base: int = 0,
                              n_sub: int = 1):
    """decompose_levels' digit loop on a pre-rounded, pre-shifted u32
    `state` holding the top base_log*level bits (<= 32 — which is why the
    u64 kernel can share this loop: after its pair-arithmetic rounding
    prologue the state fits a u32 lane)."""
    mask = np.uint32((1 << base_log) - 1)
    half_bits = np.uint32(base_log - 1)
    for step in range(level):
        res = state & mask
        state = state >> np.uint32(base_log)
        carry = ((res - np.uint32(1)) | state) & res
        carry = carry >> half_bits
        state = state + carry
        digit = res - (carry << np.uint32(base_log))
        # reinterpret the wrapped u32 as signed before narrowing (matches
        # decompose_levels' bitcast + _digit_matrix's cast)
        digit = jax.lax.bitcast_convert_type(digit, jnp.int32)
        lev = level - 1 - step
        for sub, dsub in enumerate(_split_subdigits(digit, n_sub)):
            c0 = col_base + ((lev * n_sub + sub) * ks1 + ki) * n
            o_ref[:, c0:c0 + n] = dsub.astype(jnp.int8)


def _kernel_recombine_limbs(s_ref, ki: int, limbs_used: int, limb_drop: int,
                            n: int):
    """Wrapping-i32 limb-plane recombination of one polynomial's dot-output
    columns (the in-kernel recombine_limb_planes form): returns [T, N] i32."""
    base = ki * limbs_used * n
    o = s_ref[:, base:base + n]
    if limb_drop:
        o = o << jnp.int32(8 * limb_drop)
    for j in range(1, limbs_used):
        c0 = base + j * n
        o = o + (s_ref[:, c0:c0 + n] << jnp.int32(8 * (limb_drop + j)))
    return o


@functools.lru_cache(maxsize=None)
def _rotdig_pallas(ks1: int, n: int, b: int, base_log: int, level: int,
                   n_sub: int = 1,
                   interpret: bool = False, tile: int | None = None):
    """One CMux step's negacyclic barrel rotation + signed gadget
    decomposition as a single VPU kernel: acc [k+1, B, N] u32 + per-lane
    degrees a_hat [B, 1] i32 -> digit matrix [B, R*N] i8 (row-block order
    (lev, sub, ki); R = level*n_sub*(k+1)).

    Why a kernel: the XLA form (negacyclic_monomial_mul + _digit_matrix) is
    log2(2N)+1 select stages plus the digit bit-twiddling, each an HBM-level
    fusion — measured 88 us/iter at the TPU128 shape (B=2048) and
    SUPERLINEAR in batch (158 us/iter-norm at B=4096 — the whole B=4096
    regression, docs/performance.md). In-kernel the barrel stages run on
    VMEM-resident tiles. Pure VPU work — Mosaic's matmul deficit does not
    apply. Bit-identical to the XLA path (tests/test_bootstrap_mxu.py).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if tile is None:
        tile = min(b, 512)
        while b % tile:
            tile //= 2
    n_tiles = b // tile
    r_blocks = level * n_sub * ks1

    def kernel(acc_ref, ah_ref, o_ref):
        ah = ah_ref[:, :1]                                   # [T, 1] i32
        for ki in range(ks1):
            x = acc_ref[ki]                                  # [T, N] u32
            rot = _kernel_barrel_rotate(x, ah, n)
            _kernel_emit_digits(o_ref, rot - x, ki, ks1, n, base_log, level,
                                n_sub=n_sub)

    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((ks1, tile, n), lambda t: (0, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, r_blocks * n), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, r_blocks * n), jnp.int8),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )


def _pair_neg(lo, hi):
    """-(x) mod 2^(2w) on a (lo, hi) word pair: the borrow out of the low
    word is 1 exactly when lo != 0. Dtype-generic (u32 pairs in the Mosaic
    kernels; u64 pairs in the Nussbaumer u64-torus recombine)."""
    zero = lo.dtype.type(0)
    nz = (lo != zero).astype(lo.dtype)
    return zero - lo, (zero - hi) - nz


def _kernel_barrel_rotate_pair(lo, hi, ah, n: int):
    """Negacyclic X^ah * x for u64 coefficients carried as two u32 word
    planes [T, N] inside a Pallas kernel (Mosaic rejects i64 lanes, and on
    v5e i64 is lane-emulated anyway). Same static slice+concat barrel as
    _kernel_barrel_rotate; the wrap negation couples the planes through the
    low-word borrow."""
    for j in range((2 * n - 1).bit_length()):
        s = 1 << j
        if s < n:
            nl, nh = _pair_neg(lo[:, n - s:], hi[:, n - s:])
            rl = jnp.concatenate([nl, lo[:, :n - s]], axis=1)
            rh = jnp.concatenate([nh, hi[:, :n - s]], axis=1)
        else:                                                # X^N == -1
            rl, rh = _pair_neg(lo, hi)
        bit = (ah >> j) & 1
        lo = jnp.where(bit == 1, rl, lo)
        hi = jnp.where(bit == 1, rh, hi)
    return lo, hi


@functools.lru_cache(maxsize=None)
def _rotdig_pallas64(ks1: int, n: int, b: int, base_log: int, level: int,
                     n_sub: int = 1,
                     interpret: bool = False, tile: int | None = None):
    """u64-torus rotation+digit kernel on u32 word-pair planes:
    acc2 [2, k+1, B, N] u32 (plane 0 = low words, 1 = high) + a_hat [B, 1]
    i32 -> digit matrix [B, R*N] i8, R = level*n_sub*(k+1).

    Requires base_log*level <= 32: the closest_representable rounding then
    reads only the HIGH word (plus the low word's borrow and, at exactly 32,
    its top bit), and the post-shift digit state fits a single u32 lane —
    so the whole decompose loop is shared verbatim with the u32 kernel
    (_kernel_emit_state_digits). Configs beyond 32 prefix bits stay on the
    XLA path. Bit-identical to negacyclic_monomial_mul + _digit_matrix on
    the u64 torus (tests/test_bootstrap_mxu.py)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    prefix = base_log * level
    if prefix > 32:
        raise NotImplementedError(
            f"u64 rotdig kernel needs base_log*level <= 32 prefix bits "
            f"(got {prefix}); the XLA path handles wider prefixes")
    if tile is None:
        tile = min(b, 512)
        while b % tile:
            tile //= 2
    n_tiles = b // tile
    r_blocks = level * n_sub * ks1
    non_rep = 64 - prefix                                    # >= 32

    def kernel(acc_ref, ah_ref, o_ref):
        ah = ah_ref[:, :1]                                   # [T, 1] i32
        for ki in range(ks1):
            a_lo, a_hi = acc_ref[0, ki], acc_ref[1, ki]      # [T, N] u32
            r_lo, r_hi = _kernel_barrel_rotate_pair(a_lo, a_hi, ah, n)
            # diff = rot - acc mod 2^64 on pairs
            d_lo = r_lo - a_lo
            borrow = (r_lo < a_lo).astype(jnp.uint32)
            d_hi = r_hi - a_hi - borrow
            # closest_representable + top-prefix shift, u32-state form
            if non_rep == 32:
                state = d_hi + (d_lo >> np.uint32(31))       # wrap == mod 2^32
            else:
                msb = (d_hi >> np.uint32(non_rep - 33)) & np.uint32(1)
                state = ((d_hi >> np.uint32(non_rep - 32)) + msb) \
                    & np.uint32((1 << prefix) - 1)
            _kernel_emit_state_digits(o_ref, state, ki, ks1, n, base_log,
                                      level, n_sub=n_sub)

    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((2, ks1, tile, n), lambda t: (0, 0, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, r_blocks * n), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, r_blocks * n), jnp.int8),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )


@functools.lru_cache(maxsize=None)
def _rotdig_recombine_pallas(ks1: int, n: int, b: int, base_log: int,
                             level: int, limbs_used: int, limb_drop: int,
                             n_sub: int = 1,
                             interpret: bool = False,
                             tile: int | None = None):
    """The rotdig kernel with the PREVIOUS iteration's limb recombination +
    accumulator update folded in: (s_prev [B, ks1*lu*N] i32,
    acc [k+1, B, N] u32, a_hat [B, 1] i32) -> (acc_new [k+1, B, N] u32,
    d8 [B, R*N] i8) where acc_new = acc + recombine(s_prev) and d8 is the
    digit matrix of (X^a_hat * acc_new - acc_new).

    Why: the standalone XLA recombine+accumulate scales SUPERLINEARLY in
    batch (27/49/189 us-norm at B=2048/4096/8192 — the same fusion
    degradation the rotation stage had), while a standalone Mosaic
    recombine kernel is HBM-slow (221 us: nothing to hide the streaming
    behind). Folded here, the ~10 MB/tile S read rides the Pallas DMA
    pipeline UNDER the barrel-rotation compute, so the whole stage
    disappears from the serial HLO schedule. Bit-identical composition
    (tests/test_bootstrap_mxu.py)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    r_blocks = level * ks1 * n_sub
    if tile is None:
        # VMEM-aware rows: the block set per tile row is s (ks1*lu*N i32)
        # + acc in/out (2 * ks1*N u32) + d8 out (R*N i8), double-buffered
        # by the pipeline — the N=2048 sweep shape overflowed the 100 MB
        # scoped limit at the plain 512-row tile (108 MB)
        per_row = (ks1 * limbs_used * n + 2 * ks1 * n) * 4 + r_blocks * n
        budget = max(8, (48 << 20) // per_row)
        tile = min(b, 512, 1 << (budget.bit_length() - 1))
        while b % tile:
            tile //= 2
    n_tiles = b // tile

    def kernel(s_ref, acc_ref, ah_ref, accn_ref, o_ref):
        ah = ah_ref[:, :1]                                   # [T, 1] i32
        for ki in range(ks1):
            # fold the previous iteration's recombine into this one's
            # accumulator update (wrapping i32 == mod 2^32)
            o = _kernel_recombine_limbs(s_ref, ki, limbs_used, limb_drop, n)
            x = acc_ref[ki] + jax.lax.bitcast_convert_type(o, jnp.uint32)
            accn_ref[ki] = x
            rot = _kernel_barrel_rotate(x, ah, n)
            _kernel_emit_digits(o_ref, rot - x, ki, ks1, n, base_log, level,
                                n_sub=n_sub)

    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile, ks1 * limbs_used * n), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ks1, tile, n), lambda t: (0, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((ks1, tile, n), lambda t: (0, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, r_blocks * n), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((ks1, b, n), jnp.uint32),
            jax.ShapeDtypeStruct((b, r_blocks * n), jnp.int8),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )


def auto_defer(plan: MxuPlan, batch: int) -> bool:
    """Should this (plan, batch) run the dot-first deferred-recombine scan?

    Measured crossover (v5e, round 5, probe_defer sweeps at TPU128 /
    TFHE_LIB / DEFAULT shapes + the N-sweep): the deferred kernel beats the
    XLA recombine+accumulate where XLA's fusion goes superlinear — per-CMux
    dot output S past ~100 MB — except right at the boundary at small
    batch (the N=2048 sweep point, 134 MB at B=2048, still loses 3%; the
    same 134 MB at B=4096 wins). Below the crossover XLA's recombine is at
    its single-pass floor and the Mosaic kernel's slower HBM streaming
    loses 4-15%. All nine measured points classify correctly
    (docs/performance.md "Deferred recombine").

    >>> from concrete_tpu.core.bootstrap import ServerConfig
    >>> tpu128 = MxuPlan.from_config(ServerConfig(
    ...     lwe_dimension=630, glwe_dimension=4, polynomial_size=256,
    ...     pbs_base_log=7, pbs_level=2, ks_base_log=4, ks_level=3))
    >>> [auto_defer(tpu128, b) for b in (2048, 4096, 8192)]
    [False, False, True]
    """
    s_bytes = batch * plan.glwe_size * plan.limbs_used * \
        plan.polynomial_size * 4
    return s_bytes > 100e6 and (batch >= 4096 or s_bytes >= 200e6)


def _rotdig_kernel_active(plan: MxuPlan) -> bool:
    import os

    if not (os.environ.get("CONCRETE_TPU_ROTDIG", "1") == "1"
            and plan.bits == 32 and _on_tpu()):
        return False
    if plan.n_sub == 1:
        return True
    # n_sub==2 (base_log 8, e.g. DEFAULT_PARAMETERS): kernel implemented and
    # interpreter-validated, but opt-in until its on-TPU Mosaic compile is
    # validated at the gate shapes (an unvalidated compile on the default
    # path could wedge the single-tenant chip — TODO.md).
    return (plan.n_sub == 2
            and os.environ.get("CONCRETE_TPU_ROTDIG_NSUB2", "0") == "1")


def rotdig(plan: MxuPlan, acc, a_hat):
    """Digit matrix of (X^a_hat * acc - acc): acc [k+1, B, N] u32,
    a_hat [B] ints -> [B, R*N] i8.

    Default path on TPU for the u32 single-sub-digit case (opt out with
    CONCRETE_TPU_ROTDIG=0). Measured at the TPU128 shape: 72.7 us/iter at
    B=2048 (XLA form ~88) and 75.2 us/iter-norm at B=4096 (XLA form 158 —
    the XLA fusions scale superlinearly past ~2048 lanes; the kernel is
    flat). The earlier pltpu.roll formulation HUNG the remote Mosaic
    compiler; this slice+concat form compiles (32-300 s, shape-dependent).
    """
    if _rotdig_kernel_active(plan):
        with jax.enable_x64(False):
            fn = _rotdig_pallas(plan.glwe_size, plan.polynomial_size,
                                acc.shape[1], plan.base_log, plan.level,
                                plan.n_sub)
            return fn(acc, a_hat.astype(jnp.int32)[:, None])
    rot = polynomial.negacyclic_monomial_mul(acc, a_hat[None, :])
    return _digit_matrix(plan, rot - acc)


# ---------------------------------------------------------------------------
# external product / cmux step via the MXU
# ---------------------------------------------------------------------------

_RECOMB_W = (1, 1 << 8, 1 << 16, 1 << 24)


def _digit_matrix(plan: MxuPlan, diff):
    """Signed gadget decomposition of `diff` [k+1, B, N] u32 into the int8
    digit matrix [B, R*N] matching the (lev, sub, ki) row-block order.

    Assembled with pure lane-axis concatenations (no transposes — minor-dim
    relayouts are expensive on TPU)."""
    digits = decomposition.decompose_rounded(diff, plan.base_log, plan.level)
    # digits: [k+1, B, N, l] i32, level index on the last axis
    ks1 = diff.shape[0]
    parts = []
    for lev in range(plan.level):
        d = digits[..., lev]                       # [k+1, B, N]
        for dsub in _split_subdigits(d, plan.n_sub):
            for ki in range(ks1):
                parts.append(dsub[ki].astype(jnp.int8))   # [B, N]
    return jnp.concatenate(parts, axis=1)                 # [B, R*N]


def _recombine_u64_pair(plan: MxuPlan, s):
    """u64 limb recombination on native u32 lanes: each 64-bit output rides
    as an explicit (lo, hi) u32 word pair with a hand-rolled carry, so no
    i64 lane math is emitted (v5e emulates i64 AND f64 lanes; the earlier
    f64-carry variant lost for exactly that reason — this one uses only
    u32 shifts/adds/compares).

    For byte limb j at shift t = 8*(limb_drop + j), the 64-bit contribution
    of the signed i32 partial sum sm is sext64(sm) << t:
      t < 32:  lo += u32(sm) << t;  hi += sra(sm, max(32-t, 31)) + carry
      t >= 32: hi += u32(sm) << (t - 32)            (no carry possible)
    with carry = (lo_new < addend) in u32 compare. All adds wrap mod 2^32,
    which is exactly the mod-2^64 arithmetic of the (lo, hi) pair.
    Bit-identical to the i64 form (tests/test_bootstrap_mxu.py)."""
    zero = jnp.zeros(
        (2, plan.glwe_size) + s.shape[:1] + (plan.polynomial_size,),
        jnp.uint32)
    return _planes_to_acc_u64(_accumulate_u64_planes(plan, zero, s))


def _pair_add_limbs(plan: MxuPlan, lo, hi, s, kj: int):
    """(lo, hi) += recombine(limb planes of polynomial kj in s) mod 2^64,
    on u32 lanes with explicit carries (see _recombine_u64_pair)."""
    N, lu = plan.polynomial_size, plan.limbs_used
    base = kj * lu * N
    for j in range(lu):
        t = 8 * (plan.limb_drop + j)
        sm = s[:, base + j * N: base + (j + 1) * N]            # i32
        smu = jax.lax.bitcast_convert_type(sm, jnp.uint32)
        if t < 32:
            c_lo = smu << jnp.uint32(t)
            sh = 31 if t == 0 else 32 - t                      # arith shift
            c_hi = jax.lax.bitcast_convert_type(
                sm >> jnp.int32(sh), jnp.uint32)
            lo_new = lo + c_lo
            carry = (lo_new < c_lo).astype(jnp.uint32)
            lo = lo_new
            hi = hi + c_hi + carry
        else:
            hi = hi + (smu << jnp.uint32(t - 32))
    return lo, hi


def _accumulate_u64_planes(plan: MxuPlan, planes, s):
    """planes [2, k+1, B, N] u32 (word-pair accumulator of the i64-free u64
    blind rotation) += recombine(s) mod 2^64. Pure u32 lane math; the plane
    layout feeds _rotdig_pallas64 directly, so the whole u64 CMux scan
    carries no i64 op."""
    ks1 = plan.glwe_size
    los, his = [], []
    for kj in range(ks1):
        lo, hi = _pair_add_limbs(plan, planes[0, kj], planes[1, kj], s, kj)
        los.append(lo)
        his.append(hi)
    return jnp.stack([jnp.stack(los), jnp.stack(his)], axis=0)


def _acc_u64_to_planes(acc):
    """[k+1, B, N] u64 -> [2, k+1, B, N] u32 word planes (0=lo, 1=hi)."""
    pairs = jax.lax.bitcast_convert_type(acc, jnp.uint32)     # [..., 2]
    return jnp.moveaxis(pairs, -1, 0)


def _planes_to_acc_u64(planes):
    """Inverse of _acc_u64_to_planes."""
    pairs = jnp.moveaxis(planes, 0, -1)                       # [..., 2]
    return jax.lax.bitcast_convert_type(pairs, jnp.uint64)


def recombine_limb_planes(plan: MxuPlan, s):
    """[B, (kj, m, c)] i32 dot output -> [k+1, B, N] torus values.

    Wrapping limb recombination via pure lane slices — the mod-2^bits
    reduction IS the two's-complement wrap. Shared by the single-device dot
    and the tp-sharded pipeline (partial sums psum'd before recombining).
    With limb_drop > 0 only the kept high limbs are present; their global
    shifts start at 8*limb_drop (reduced-precision mode).

    (A u64 variant assembling (lo32, hi32) word pairs with an exact f64
    carry was measured SLOWER on v5e — f64 lanes are emulated there just
    like i64. The u32-pair carry form is CONCRETE_TPU_RECOMB64=pair,
    pending on-TPU measurement.)"""
    if plan.bits == 64:
        import os

        if os.environ.get("CONCRETE_TPU_RECOMB64", "i64") == "pair":
            return _recombine_u64_pair(plan, s)
    N, ks1, lu = plan.polynomial_size, plan.glwe_size, plan.limbs_used
    acc_t = jnp.int32 if plan.bits == 32 else jnp.int64
    out_t = jnp.uint32 if plan.bits == 32 else jnp.uint64
    outs = []
    for kj in range(ks1):
        base = kj * lu * N
        o = s[:, base: base + N].astype(acc_t)
        if plan.limb_drop:
            o = o << acc_t(8 * plan.limb_drop)
        for j in range(1, lu):
            c0 = base + j * N
            sm = s[:, c0:c0 + N].astype(acc_t)
            o = o + (sm << acc_t(8 * (plan.limb_drop + j)))  # wrapping mod 2^bits
        outs.append(o)
    out = jnp.stack(outs, axis=0)                           # [k+1, B, N]
    return jax.lax.bitcast_convert_type(out, out_t)




def _toeplitz_matmul(plan: MxuPlan, d8, rhs):
    """d8 [B, R*N] i8  x  rhs [R*N, (k+1)*n_limbs*N] i8 -> [k+1, B, N]
    u32/u64: the exact external-product sum mod 2^bits (one MXU dot over
    K = R*N, wrapping limb recombination)."""
    s = jax.lax.dot_general(
        d8, rhs, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )                                                       # [B, (kj, m, c)]
    return recombine_limb_planes(plan, s)


def external_product_mxu(cfg: ServerConfig, rings, glwe):
    """Toeplitz-matmul external product; glwe [..., k+1, N] u32;
    rings [R, k+1, 2N] u32 from bsk_to_mxu (one iteration's slice)."""
    plan = MxuPlan.from_config(cfg)
    lead = glwe.shape[:-2]
    flat = glwe.reshape((-1,) + glwe.shape[-2:])
    pbn = jnp.moveaxis(flat, 1, 0)                 # [k+1, B, N] poly-major
    d8 = _digit_matrix(plan, pbn)
    rhs = build_tables(rings, plan.polynomial_size, plan.n_words, plan.limb_drop)
    out = _toeplitz_matmul(plan, d8, rhs)          # [k+1, B, N]
    return jnp.moveaxis(out, 0, 1).reshape(lead + glwe.shape[-2:])


def cmux_mxu(cfg: ServerConfig, rings, ct0, ct1):
    """ct0 + extprod(ggsw, ct1 - ct0) (fourier/mod.rs:648-664)."""
    return ct0 + external_product_mxu(cfg, rings, ct1 - ct0)


# ---------------------------------------------------------------------------
# blind rotation / bootstrap
# ---------------------------------------------------------------------------


def blind_rotate_mxu(cfg: ServerConfig, bsk_rings, lut, lwe, *,
                     ms_offset: int = 0, lut_count_log: int = 0):
    """Blind rotation with the toeplitz-matmul CMux chain.

    bsk_rings: [n, R, k+1, 2N] u32 (bsk_to_mxu); lut [..., k+1, N] u32;
    lwe [..., n+1] u32. Returns the rotated accumulator [..., k+1, N].
    Bit-identical to bootstrap.blind_rotate (both are exact mod 2^32).
    """
    from . import checks

    checks.check_bsk_mxu(bsk_rings, cfg)
    checks.check_lwe(lwe, cfg.lwe_dimension)
    checks.check_glwe(lut, cfg.glwe_size, cfg.polynomial_size, "accumulator")
    plan = MxuPlan.from_config(cfg)
    N, ks1 = plan.polynomial_size, plan.glwe_size
    lead = lwe.shape[:-1]
    lwe_flat = lwe.reshape((-1, lwe.shape[-1]))
    b = lwe_flat.shape[0]
    b_hat = pbs_modulus_switch(
        lwe_flat[..., -1], N, ms_offset, lut_count_log)      # [B]
    a_hats = pbs_modulus_switch(
        lwe_flat[..., :-1], N, ms_offset, lut_count_log)     # [B, n]
    a_hats = jnp.moveaxis(a_hats, -1, 0)                     # [n, B]

    lut_b = jnp.broadcast_to(
        lut.reshape((-1, ks1, N)) if lut.ndim > 2 else lut[None],
        (b, ks1, N),
    )
    # poly-major [k+1, B, N]: rank-3 arrays tile on the (B, N) trailing dims,
    # so the small k+1 axis costs no sublane padding.
    acc = jnp.moveaxis(lut_b, 1, 0)
    acc = polynomial.negacyclic_monomial_div(acc, b_hat[None, :])

    import os

    # opt-in while the fused kernel trails the XLA path (see
    # docs/performance.md "fused kernel" notes; Mosaic dot rate is the gap)
    use_fused = (
        os.environ.get("CONCRETE_TPU_FUSED", "0") == "1"
        and plan.bits == 32
        and _on_tpu()
    )
    if use_fused:
        from ..ops import fused_cmux as _fc

        use_fused = _fc.fused_cmux_available(plan, b)

    unroll = int(os.environ.get("CONCRETE_TPU_SCAN_UNROLL", "1"))

    # Deferred recombine. Three scan compositions exist; the round-3/4
    # compile hang was isolated to the dot-output S crossing the scan
    # carry into the kernel (DEFER=1 multi-output and DEFER=2 single-
    # output both hang the remote toolchain). The round-5 DEFER=3 form
    # consumes S inside the SAME iteration (carry = (acc, d8), rings xs
    # shifted by one) — no S across the scan boundary — and compiles
    # clean at every production shape. "auto" (the default) picks 3 or 0
    # by the measured S-traffic crossover above.
    defer_mode = os.environ.get("CONCRETE_TPU_DEFER", "auto")
    if defer_mode == "auto":
        defer_mode = "3" if auto_defer(plan, b) else "0"
    # the kernel emits n_sub <= 2 digit rows (DEFAULT's bl=8 included);
    # modes "1"/"2" (S-carry compositions) were REMOVED in round 5 — they
    # hang the remote toolchain (see the comment block above) and the
    # dot-first form supersedes them on the same kernel
    use_defer = (defer_mode == "3" and plan.n_sub <= 2
                 and plan.bits == 32 and _on_tpu() and not use_fused
                 and os.environ.get("CONCRETE_TPU_ROTDIG", "1") == "1")
    if use_defer:
        # Dot-first pairing: iteration i's dot output S feeds iteration i's
        # OWN kernel call, so S never crosses the scan boundary — the carry
        # is (acc, d8), both kernel outputs and 8x smaller than S. Round-4
        # probing narrowed the compile hang to the S-carry-into-kernel scan
        # composition specifically; this form removes that edge while
        # keeping the win (the XLA recombine+accumulate HLO disappears; the
        # S read rides the kernel's DMA pipeline under the barrel-rotation
        # compute). Step j consumes rings_j (for the pending dot) and
        # a_hat_{j+1}: a pre-scan kernel call applies a_hat_0 with a zero
        # pending S, the a_hats xs shifts by one (tiny [n, B] copy — NOT a
        # BSK-sized rings copy), and the last step's dummy a_hat=0 rotates
        # by X^0 (its digits of a zero diff are zero and are discarded).
        with jax.enable_x64(False):
            kern = _rotdig_recombine_pallas(
                ks1, N, b, plan.base_log, plan.level,
                plan.limbs_used, plan.limb_drop, plan.n_sub)

        s0 = jnp.zeros((b, ks1 * plan.limbs_used * N), jnp.int32)
        with jax.enable_x64(False):
            acc, d8 = kern(s0, acc, a_hats[0].astype(jnp.int32)[:, None])
        a_next = jnp.concatenate(
            [a_hats[1:], jnp.zeros_like(a_hats[:1])], axis=0)

        def step_deferred3(carry, xs):
            acc_c, d8_prev = carry
            rings_j, a_hat = xs
            rhs = build_tables(rings_j, N, plan.n_words, plan.limb_drop)
            s_j = jax.lax.dot_general(
                d8_prev, rhs, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            with jax.enable_x64(False):
                acc_new, d8_new = kern(
                    s_j, acc_c, a_hat.astype(jnp.int32)[:, None])
            return (acc_new, d8_new), None

        (acc, _), _ = jax.lax.scan(
            step_deferred3, (acc, d8), (bsk_rings, a_next), unroll=unroll)
        return jnp.moveaxis(acc, 0, 1).reshape(lead + (ks1, N))
    if _rotdig64_kernel_active(plan) and not use_fused:
        return _blind_rotate_u64_planes(
            plan, bsk_rings, acc, a_hats, unroll, lead)

    def step(acc, xs):
        rings_i, a_hat = xs                                  # [R,k+1,2N], [B]
        d8 = rotdig(plan, acc, a_hat)
        if use_fused:
            from ..ops import fused_cmux as _fc

            with jax.enable_x64(False):
                return _fc.fused_external_product_acc(
                    cfg, plan, acc, d8, rings_i), None
        rhs = build_tables(rings_i, N, plan.n_words, plan.limb_drop)
        return acc + _toeplitz_matmul(plan, d8, rhs), None

    acc, _ = jax.lax.scan(step, acc, (bsk_rings, a_hats), unroll=unroll)
    return jnp.moveaxis(acc, 0, 1).reshape(lead + (ks1, N))


def _rotdig64_kernel_active(plan: MxuPlan) -> bool:
    import os

    # DEFAULT ON for n_sub == 1 (opt-out CONCRETE_TPU_ROTDIG64=0): validated
    # on v5e 2026-08-19 — bit-identical at N=256/k=4 and N=1024/k=1,
    # +1..5% steady-state, 10-26x faster Mosaic compile (11-18 s vs
    # 158-286 s). base_log*level <= 32 is the kernel's u32-state
    # precondition (_rotdig_pallas64). n_sub == 2 was validated at ONE
    # shape (2026-08-20, the documented bl=10/l=3 ladder at N=1024/k=1:
    # bit-identical, 1,066 vs 966 PBS/s = +10%, compile 17.7 s vs 86.9 s
    # — benchmarks/probe_rotdig64.py pbs 1024 1 10 3) but stays OPT-IN
    # with n_sub >= 3, matching the 32-bit gate's precedent
    # (_rotdig_kernel_active): a hung Mosaic compile at an unswept shape
    # on the default path would wedge the single-tenant chip for every
    # caller. Set CONCRETE_TPU_ROTDIG64=1 to enable it explicitly.
    if not (plan.bits == 64 and _on_tpu()
            and plan.base_log * plan.level <= 32):
        return False
    flag = os.environ.get("CONCRETE_TPU_ROTDIG64")
    if flag == "0":
        return False
    if plan.n_sub == 1:
        return True
    return flag == "1"


def _blind_rotate_u64_planes(plan: MxuPlan, bsk_rings, acc, a_hats,
                             unroll: int, lead, interpret: bool = False):
    """The u64 CMux scan with NO i64 lane ops: the accumulator rides as
    [2, k+1, B, N] u32 word planes, the rotation+digit stage runs in the
    pair-plane Pallas kernel (_rotdig_pallas64) and the limb recombination
    accumulates with explicit u32 carries (_accumulate_u64_planes). On v5e
    both i64 and f64 lanes are emulated, so the XLA u64 form pays ~2x lane
    ops on every VPU stage; this path converts to planes once, scans, and
    converts back once. Bit-identical to the default path
    (tests/test_bootstrap_mxu.py, interpreter mode)."""
    N, ks1 = plan.polynomial_size, plan.glwe_size
    b = acc.shape[1]
    with jax.enable_x64(False):
        kern = _rotdig_pallas64(ks1, N, b, plan.base_log, plan.level,
                                plan.n_sub, interpret=interpret)

    def step(planes, xs):
        rings_i, a_hat = xs
        with jax.enable_x64(False):
            d8 = kern(planes, a_hat.astype(jnp.int32)[:, None])
        rhs = build_tables(rings_i, N, plan.n_words, plan.limb_drop)
        s = jax.lax.dot_general(
            d8, rhs, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        return _accumulate_u64_planes(plan, planes, s), None

    planes, _ = jax.lax.scan(
        step, _acc_u64_to_planes(acc), (bsk_rings, a_hats), unroll=unroll)
    out = _planes_to_acc_u64(planes)
    return jnp.moveaxis(out, 0, 1).reshape(lead + (ks1, N))


def bootstrap_mxu(cfg: ServerConfig, bsk_rings, lut, lwe):
    """Full PBS on the MXU path (fourier/mod.rs:878-911)."""
    return sample_extract(blind_rotate_mxu(cfg, bsk_rings, lut, lwe))


def bootstrap_many_lut_mxu(cfg: ServerConfig, bsk_rings, lut, lwe,
                           lut_count_log: int, *, ms_offset: int = 0):
    """Multi-LUT PBS on the MXU path (see bootstrap.bootstrap_many_lut)."""
    acc = blind_rotate_mxu(cfg, bsk_rings, lut, lwe, ms_offset=ms_offset,
                           lut_count_log=lut_count_log)
    return jnp.stack(
        [sample_extract_nth(acc, t) for t in range(1 << lut_count_log)], axis=0
    )


def bootstrap_keyswitch_mxu(cfg: ServerConfig, bsk_rings, ksk, lut, lwe):
    """PBS + keyswitch: the per-gate pipeline (server_key/mod.rs:133-166).

    ``ksk`` is either the u32/u64 keyswitch key tensor (i32 contraction) or
    an int8 limb-prepared key from lwe.ksk_to_limbs — the int8 MXU
    contraction is bit-identical and ~4x faster (0.19 vs 0.76 ms at the
    TPU128 shape, B=2048); ServerKey prepares it when ks_base_log <= 7."""
    big = bootstrap_mxu(cfg, bsk_rings, lut, lwe)
    if ksk.dtype == jnp.int8:
        return lwe_ops.keyswitch_limbs(
            ksk, big, base_log=cfg.ks_base_log, level_count=cfg.ks_level)
    return lwe_ops.keyswitch(
        ksk, big, base_log=cfg.ks_base_log, level_count=cfg.ks_level
    )


@functools.lru_cache(maxsize=None)
def jit_bootstrap_keyswitch_mxu(cfg: ServerConfig):
    return jax.jit(functools.partial(bootstrap_keyswitch_mxu, cfg))
