"""Fused CMux accumulation kernel: toeplitz table build + int8 MXU dot +
limb recombine in ONE Pallas kernel, tables VMEM-resident.

Motivation (docs/performance.md): on the XLA path the per-iteration table
build (~104 us) and the S-materialization + recombine (~80 us at B=2048) are
separate HLOs — the TPU runs HLOs serially, so they sit on the critical path
next to the ~523 us dot. Inside one Mosaic kernel the table build for output
group kj+1 is *independent* of the dots of group kj, and the recombine of
dot-tile t is independent of dot-tile t+1 — the VLIW scheduler can overlap
VPU work with MXU work, and the 50 MB int8 table never round-trips HBM.

Structure (u32 torus; u64 keeps the XLA path):
  grid = (ks1 * n_btiles,) steps s = (kj, bt)
  - step (kj, 0) with kj == 0: build T[0] into scratch buffer 0 (prologue)
  - every step of group kj: dot d8_tile [Bt, K] x T[kj] [K, L*N] -> s_i32,
    recombine limbs (shift-add), add acc tile, write out[kj] tile
  - steps of group kj also build a slice of T[kj+1] into the other scratch
    buffer (double buffering): R_blocks spread over the group's n_btiles
    steps, so the build runs concurrently with the dots

The algebra is identical to bootstrap_mxu.{build_tables + _toeplitz_matmul +
recombine_limb_planes} (external_product, fourier/mod.rs:463-645), and the
kernel is pinned bit-identical to that path in tests (interpret mode on CPU).

Example:
    >>> from concrete_tpu.ops.fused_cmux import make_fused_cmux
    >>> fn = make_fused_cmux(2, 2, 64, 8, interpret=True)
    >>> callable(fn)
    True
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _build_group_block(e_ref, t_ref, blk: int, kj: int, N: int,
                       n_words: int, kept, tile_rows: int):
    """Build toeplitz rows [blk*N, (blk+1)*N) of group kj's table into t_ref.

    e_ref: [R, planes, 2N] u32 rings; t_ref: [K, n_kept*N] i8 scratch.
    Row r of block blk holds (X^r * ring)[c] for c in [0, N): the negacyclic
    toeplitz T[r, c] = ring[(c - r) mod 2N]. Built by log-doubling rolls,
    row-tiled by tile_rows to bound the [rows, 2N] u32 scratch."""
    from jax.experimental.pallas import tpu as pltpu

    mask = np.uint32(0xFF)
    n_kept = len(kept)
    n_tiles = N // tile_rows
    for w in range(n_words):
        ms = [m for (ww, m) in kept if ww == w]
        if not ms:
            continue
        base = e_ref[blk, kj * n_words + w][None, :]      # [1, 2N]
        for t in range(n_tiles):
            x = base
            if t:
                x = pltpu.roll(x, np.int32(t * tile_rows), axis=1)
            rows = 1
            while rows < tile_rows:
                x = jnp.concatenate(
                    [x, pltpu.roll(x, np.int32(rows), axis=1)], axis=0)
                rows *= 2
            cols = x[:, :N]
            r0 = blk * N + t * tile_rows
            for m in ms:
                limb = ((cols >> np.uint32(8 * m)) & mask).astype(jnp.int8)
                c0 = kept.index((w, m)) * N
                t_ref[r0:r0 + tile_rows, c0:c0 + N] = limb


@functools.lru_cache(maxsize=None)
def make_fused_cmux(r_blocks: int, ks1: int, N: int, batch: int,
                    n_words: int = 1, limb_drop: int = 0,
                    tile_b: int = 512, interpret: bool = False):
    """Build the fused accumulate-external-product pallas_call.

    Returns fn(acc [ks1, B, N] u32, d8 [B, K] i8, rings [R, planes, 2N] u32)
    -> [ks1, B, N] u32 computing acc + extprod contribution, where
    K = r_blocks * N. u32 torus only (n_words == 1)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert n_words == 1, "fused kernel: u32 torus only (u64 uses the XLA path)"
    kept = [(w, m) for w in range(n_words) for m in range(4)
            if 4 * w + m >= limb_drop]
    n_kept = len(kept)
    K = r_blocks * N
    tile_b = min(tile_b, batch)
    n_bt = batch // tile_b
    assert batch % tile_b == 0
    # row-tile for the doubling scratch: [tile_rows, 2N] u32 within ~4 MB
    tile_rows = min(N, max(8, (1 << 19) // N))
    # table-build blocks per step so T[kj+1] finishes during group kj
    blocks_per_step = -(-r_blocks // n_bt)  # ceil

    def kernel(acc_ref, d8_ref, e_ref, o_ref, t_ref):
        s = pl.program_id(0)
        kj = s // n_bt
        bt = s % n_bt

        # prologue: group 0's table, built serially before its first dot
        @pl.when(s == 0)
        def _():
            for blk in range(r_blocks):
                _build_group_block(e_ref, t_ref.at[0], blk, 0, N,
                                   n_words, kept, tile_rows)

        # overlapped build: during group kj, assemble T[kj+1] in the other
        # buffer; block blk is built at step bt == blk // blocks_per_step
        # (static block index — only the step predicate is traced)
        if ks1 > 1:
            for nkj in range(1, ks1):
                for blk in range(r_blocks):
                    @pl.when((kj == nkj - 1) & (bt == blk // blocks_per_step))
                    def _(nkj=nkj, blk=blk):
                        _build_group_block(
                            e_ref, t_ref.at[nkj % 2], blk, nkj, N,
                            n_words, kept, tile_rows)

        # dot + recombine + accumulate for (kj, bt)
        for cur in range(ks1):
            @pl.when(kj == cur)
            def _(cur=cur):
                sdot = jax.lax.dot_general(
                    d8_ref[...], t_ref[cur % 2],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)       # [Bt, n_kept*N]
                acc = sdot[:, :N]
                if limb_drop:
                    acc = acc << jnp.int32(8 * limb_drop)
                for j in range(1, n_kept):
                    acc = acc + (sdot[:, j * N:(j + 1) * N]
                                 << jnp.int32(8 * (limb_drop + j)))
                o_ref[0] = acc_ref[0] + pltpu.bitcast(acc, jnp.uint32)

    grid = (ks1 * n_bt,)
    fn = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_b, N),
                         lambda s: (s // n_bt, s % n_bt, 0),
                         memory_space=pltpu.VMEM),          # acc tile
            pl.BlockSpec((tile_b, K),
                         lambda s: (s % n_bt, 0),
                         memory_space=pltpu.VMEM),          # d8 tile
            pl.BlockSpec((r_blocks, ks1 * n_words, 2 * N),
                         lambda s: (0, 0, 0),
                         memory_space=pltpu.VMEM),          # rings (full)
        ],
        out_specs=pl.BlockSpec((1, tile_b, N),
                               lambda s: (s // n_bt, s % n_bt, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ks1, batch, N), jnp.uint32),
        scratch_shapes=[
            pltpu.VMEM((2 if ks1 > 1 else 1, K, n_kept * N), jnp.int8),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )
    return fn


def fused_cmux_available(plan, batch: int) -> bool:
    """Whether the fused kernel covers this configuration."""
    if plan.bits != 32:
        return False
    N, K = plan.polynomial_size, plan.row_blocks * plan.polynomial_size
    n_kept = plan.limbs_used
    # scratch tables must fit VMEM alongside the working tiles
    t_bytes = (2 if plan.glwe_size > 1 else 1) * K * n_kept * N
    tile_b = min(512, batch)
    work = tile_b * K + tile_b * n_kept * N * 4 + 2 * tile_b * N * 4
    return (batch % tile_b == 0) and (t_bytes + 2 * work) < 110 * 1024 * 1024


def fused_external_product_acc(cfg, plan, acc, d8, rings, *,
                               interpret: bool = False):
    """acc + recombine(d8 @ T(rings)) via the fused kernel.

    acc [ks1, B, N] u32; d8 [B, K] i8; rings [R, planes, 2N] u32."""
    ks1, batch, N = acc.shape
    fn = make_fused_cmux(
        plan.row_blocks, ks1, N, batch,
        n_words=plan.n_words, limb_drop=plan.limb_drop,
        interpret=interpret)
    return fn(acc, d8, rings)
