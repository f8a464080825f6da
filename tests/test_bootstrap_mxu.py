"""MXU toeplitz-matmul bootstrap path: bit-exact equivalence with the NTT
path (both are exact arithmetic mod 2^32) and end-to-end gate correctness."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from concrete_tpu.core import bootstrap as bs
from concrete_tpu.core import bootstrap_mxu as bsx
from concrete_tpu.core import glwe as glwe_mod
from concrete_tpu.core import lwe as lwe_mod
from concrete_tpu.core.ggsw import StandardBootstrapKey, bsk_to_ntt
from concrete_tpu.csprng import EncryptionRandomGenerator, SecretRandomGenerator

from common import TINY, TINY_K2


def _setup(params, seed=7):
    sgen = SecretRandomGenerator(seed)
    lwe_sk = lwe_mod.LweSecretKey.generate_binary(params.lwe_dimension, sgen)
    glwe_sk = glwe_mod.GlweSecretKey.generate_binary(
        params.glwe_dimension, params.polynomial_size, sgen
    )
    gen = EncryptionRandomGenerator(seed + 1, seed + 2)
    bsk = StandardBootstrapKey.generate(
        lwe_sk, glwe_sk, params.pbs_base_log, params.pbs_level,
        params.glwe_modular_std_dev.std_dev, gen,
    )
    cfg = bs.ServerConfig.from_boolean_parameters(params)
    return lwe_sk, glwe_sk, bsk, cfg, gen


@pytest.mark.parametrize("params", [TINY, TINY_K2], ids=["tiny", "tiny_k2"])
def test_external_product_mxu_matches_ntt(params):
    """Both paths compute the exact integer external product mod 2^32 —
    outputs must be bit-identical (incl. the digit-split path at
    pbs_base_log=8)."""
    lwe_sk, glwe_sk, bsk, cfg, gen = _setup(params)
    rng = np.random.default_rng(3)
    batch = 5
    glwe = jnp.asarray(
        rng.integers(0, 1 << 32,
                     size=(batch, cfg.glwe_size, cfg.polynomial_size),
                     dtype=np.uint32)
    )
    from concrete_tpu.core.ggsw import ggsw_to_ntt

    ggsw_raw = np.asarray(bsk.data[0])          # first key bit's GGSW
    ggsw_ntt = ggsw_to_ntt(ggsw_raw, cfg.primes, cfg.bits)
    want = np.asarray(bs.external_product(cfg, ggsw_ntt, glwe))

    rings = bsx.bsk_to_mxu(bsk.data, cfg)[0]
    got = np.asarray(bsx.external_product_mxu(cfg, jnp.asarray(rings), glwe))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("params", [TINY, TINY_K2], ids=["tiny", "tiny_k2"])
def test_blind_rotate_mxu_matches_ntt(params):
    lwe_sk, glwe_sk, bsk, cfg, gen = _setup(params)
    rng = np.random.default_rng(5)
    batch = 4
    lwe = jnp.asarray(
        rng.integers(0, 1 << 32, size=(batch, cfg.lwe_dimension + 1),
                     dtype=np.uint32)
    )
    lut = bs.trivial_lut_constant(cfg, np.uint32(1 << 29))
    bsk_ntt = bsk_to_ntt(bsk.data, cfg.primes, cfg.bits)
    want = np.asarray(bs.blind_rotate(cfg, bsk_ntt, lut, lwe))
    rings = jnp.asarray(bsx.bsk_to_mxu(bsk.data, cfg))
    got = np.asarray(bsx.blind_rotate_mxu(cfg, rings, lut, lwe))
    np.testing.assert_array_equal(got, want)


def test_full_pbs_mxu_decrypts():
    """End-to-end PBS on the MXU path refreshes +-1/8 encodings."""
    params = TINY
    lwe_sk, glwe_sk, bsk, cfg, gen = _setup(params)
    eighth = np.uint32(1 << 29)
    rng = np.random.default_rng(11)
    bits = rng.integers(0, 2, size=32)
    pts = np.where(bits == 1, eighth, np.uint32(0) - eighth).astype(np.uint32)
    cts = lwe_sk.encrypt(pts, params.lwe_modular_std_dev.std_dev, gen)

    rings = jnp.asarray(bsx.bsk_to_mxu(bsk.data, cfg))
    lut = bs.trivial_lut_constant(cfg, eighth)
    out = np.asarray(bsx.bootstrap_mxu(cfg, rings, lut, jnp.asarray(cts)))
    big_key = glwe_sk.into_lwe_key()
    dec = big_key.decrypt(out)
    # sign test: decrypted value close to +-1/8
    signed = dec.astype(np.int32)
    want = np.where(bits == 1, 1, -1)
    got = np.where(signed > 0, 1, -1)
    np.testing.assert_array_equal(got, want)


def test_blind_rotate_mxu_matches_ntt_u64():
    """The u64-torus MXU path (2 word-planes, 8 limbs) is bit-identical to
    the exact-NTT path — the highlevel (concrete-crate analog) regime."""
    from concrete_tpu.csprng import SecretRandomGenerator

    cfg = bs.ServerConfig(
        lwe_dimension=10, glwe_dimension=1, polynomial_size=64,
        pbs_base_log=10, pbs_level=3, ks_base_log=4, ks_level=3, bits=64)
    sgen = SecretRandomGenerator(3)
    lwe_sk = lwe_mod.LweSecretKey.generate_binary(cfg.lwe_dimension, sgen, bits=64)
    glwe_sk = glwe_mod.GlweSecretKey.generate_binary(
        cfg.glwe_dimension, cfg.polynomial_size, sgen, bits=64)
    gen = EncryptionRandomGenerator(4, 5)
    bsk = StandardBootstrapKey.generate(
        lwe_sk, glwe_sk, cfg.pbs_base_log, cfg.pbs_level, 2.0 ** -40, gen)
    rng = np.random.default_rng(0)
    lwe = jnp.asarray(rng.integers(
        0, 1 << 62, size=(4, cfg.lwe_dimension + 1), dtype=np.uint64))
    lut = bs.trivial_lut_constant(cfg, np.uint64(1 << 60))
    want = np.asarray(bs.blind_rotate(
        cfg, bsk_to_ntt(bsk.data, cfg.primes, 64), lut, lwe))
    rings = jnp.asarray(bsx.bsk_to_mxu(bsk.data, cfg))
    got = np.asarray(bsx.blind_rotate_mxu(cfg, rings, lut, lwe))
    np.testing.assert_array_equal(got, want)


def test_external_product_mxu_three_way_split():
    """base_log=16 digits need a 3-way int8 chunking (u64 torus)."""
    from concrete_tpu.csprng import SecretRandomGenerator

    cfg = bs.ServerConfig(
        lwe_dimension=4, glwe_dimension=1, polynomial_size=64,
        pbs_base_log=16, pbs_level=2, ks_base_log=4, ks_level=3, bits=64)
    assert bsx.MxuPlan.from_config(cfg).n_sub == 3
    sgen = SecretRandomGenerator(3)
    glwe_sk = glwe_mod.GlweSecretKey.generate_binary(
        cfg.glwe_dimension, cfg.polynomial_size, sgen, bits=64)
    gen = EncryptionRandomGenerator(4, 5)
    from concrete_tpu.core.ggsw import encrypt_constant_ggsw, ggsw_to_ntt

    ggsw = encrypt_constant_ggsw(
        glwe_sk, 1, cfg.pbs_base_log, cfg.pbs_level, 2.0 ** -45, gen)
    rng = np.random.default_rng(0)
    glwe = jnp.asarray(rng.integers(
        0, 1 << 62, size=(3, cfg.glwe_size, cfg.polynomial_size), dtype=np.uint64))
    want = np.asarray(bs.external_product(
        cfg, ggsw_to_ntt(ggsw, cfg.primes, 64), glwe))
    rings = jnp.asarray(bsx.bsk_to_mxu(ggsw[None], cfg)[0])
    got = np.asarray(bsx.external_product_mxu(cfg, rings, glwe))
    np.testing.assert_array_equal(got, want)


def test_build_tables_pallas_interpret_matches_jnp():
    """The production TPU table-build kernel (Pallas) must be bit-identical
    to the jnp fallback every CPU test exercises. Run the kernel through the
    Pallas interpreter so the hot path is covered in CPU CI (untiled and
    row-tiled variants)."""
    rng = np.random.default_rng(7)
    for r_blocks, ks1, N, tile in [(6, 2, 128, None), (2, 3, 128, 32)]:
        rings = jnp.asarray(rng.integers(
            0, 1 << 32, size=(r_blocks, ks1, 2 * N), dtype=np.uint32))
        with jax.enable_x64(False):
            got = bsx._build_tables_pallas(
                r_blocks, ks1, N, interpret=True, tile=tile)(rings)
        want = bsx._build_tables_jnp(rings, N)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("drop", [1, 2])
def test_external_product_mxu_limb_drop_rounds_rings(drop):
    """limb_drop=d must equal the exact external product against rings whose
    d lowest packed bytes are zeroed — i.e. every toeplitz entry rounded to
    the nearest multiple of 2^{8d} (balanced limbs round to nearest)."""
    import dataclasses as dc

    from concrete_tpu.core.ggsw import encrypt_constant_ggsw

    cfg = bs.ServerConfig(
        lwe_dimension=4, glwe_dimension=1, polynomial_size=64,
        pbs_base_log=7, pbs_level=2, ks_base_log=4, ks_level=3)
    sgen = SecretRandomGenerator(3)
    glwe_sk = glwe_mod.GlweSecretKey.generate_binary(
        cfg.glwe_dimension, cfg.polynomial_size, sgen)
    gen = EncryptionRandomGenerator(4, 5)
    ggsw = encrypt_constant_ggsw(
        glwe_sk, 1, cfg.pbs_base_log, cfg.pbs_level, 2.0 ** -25, gen)
    rng = np.random.default_rng(0)
    glwe = jnp.asarray(rng.integers(
        0, 1 << 32, size=(3, cfg.glwe_size, cfg.polynomial_size),
        dtype=np.uint32))

    rings = bsx.bsk_to_mxu(ggsw[None], cfg)[0]
    cfg_fast = dc.replace(cfg, mxu_limb_drop=drop)
    got = np.asarray(
        bsx.external_product_mxu(cfg_fast, jnp.asarray(rings), glwe))

    # the packed-word bytes ARE the balanced limbs (carries folded), so
    # zeroing the low d bytes is exactly the rounding the fast RHS applies
    masked = rings & np.uint32(0xFFFFFFFF << (8 * drop) & 0xFFFFFFFF)
    want = np.asarray(
        bsx.external_product_mxu(cfg, jnp.asarray(masked), glwe))
    np.testing.assert_array_equal(got, want)


def test_fast_mode_gates_tiny():
    """Boolean gates stay correct under the reduced-precision fast mode
    (level slice + limb drop) on the CPU/jnp path."""
    from concrete_tpu import boolean

    cks = boolean.ClientKey.new(TINY_K2, secret_seed=11)
    sks = boolean.ServerKey.new(cks, mask_seed=12, noise_seed=13)
    fast = sks.with_fast_mode(limb_drop=1, levels=2)
    assert fast.cfg.pbs_level == 2 and fast.cfg.mxu_limb_drop == 1
    a = cks.encrypt([True, True, False, False], mask_seed=14, noise_seed=15)
    b = cks.encrypt([True, False, True, False], mask_seed=16, noise_seed=17)
    # ntt backend (CPU default): levels reduction only
    np.testing.assert_array_equal(
        cks.decrypt(np.array(fast.and_(a, b))), [True, False, False, False])
    # force the mxu (jnp fallback) path so limb_drop is exercised end-to-end
    import dataclasses as dc

    fast_mxu = dc.replace(fast, backend="mxu", _bsk_ntt=None, _bsk_mxu=None)
    np.testing.assert_array_equal(
        cks.decrypt(np.array(fast_mxu.or_(a, b))), [True, True, True, False])


def test_pallas_cmux_kernel_interpret_matches_xla_step():
    """The dormant fused Pallas CMux kernel (ops/pallas_cmux, env-gated via
    CONCRETE_TPU_PALLAS_CMUX) must stay bit-identical to the XLA scan step —
    run through the interpreter so the kernel cannot rot in CPU CI
    (VERDICT round-1 item #8)."""
    from concrete_tpu.math import ntt as ntt_mod
    from concrete_tpu.math import polynomial
    from concrete_tpu.core.bootstrap import _external_product_stacked
    from concrete_tpu.ops import pallas_cmux

    cfg = bs.ServerConfig(
        lwe_dimension=4, glwe_dimension=1, polynomial_size=64,
        pbs_base_log=6, pbs_level=2, ks_base_log=4, ks_level=3)
    if len(cfg.primes) != 2:
        pytest.skip("kernel specialized to 2 CRT primes")
    rng = np.random.default_rng(11)
    B = 8
    ks1, N, l, P = cfg.glwe_size, cfg.polynomial_size, cfg.pbs_level, 2
    acc = jnp.asarray(rng.integers(0, 1 << 32, size=(ks1, B, N), dtype=np.uint32))
    a_hat = jnp.asarray(rng.integers(0, 2 * N, size=(B,), dtype=np.int32))
    ggsw = jnp.asarray(np.stack(
        [rng.integers(0, p, size=(l, ks1, ks1, N), dtype=np.uint32)
         for p in cfg.primes], axis=0))

    sp = ntt_mod.make_stacked_plans(N, cfg.primes)
    rotated = polynomial.negacyclic_monomial_mul(acc, a_hat[None, :])
    want = np.asarray(acc + _external_product_stacked(cfg, sp, ggsw, rotated - acc))

    with jax.enable_x64(False):
        kern = pallas_cmux.make_cmux_kernel(cfg, tile_b=B, interpret=True)
        got = np.asarray(kern(acc, a_hat, ggsw))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("k,l,bl,drop", [(1, 3, 7, 0), (2, 2, 8, 0), (1, 2, 7, 1)])
def test_fused_cmux_kernel_interpret_matches_xla(k, l, bl, drop):
    """The fused table-build+dot+recombine kernel (ops/fused_cmux, env-gated
    via CONCRETE_TPU_FUSED) must be bit-identical to the XLA external-product
    accumulation across glwe dims, digit splits, and limb drops."""
    import dataclasses as dc

    from concrete_tpu.ops import fused_cmux as fc

    cfg = bs.ServerConfig(
        lwe_dimension=4, glwe_dimension=k, polynomial_size=64,
        pbs_base_log=bl, pbs_level=l, ks_base_log=4, ks_level=3,
        mxu_limb_drop=drop)
    plan = bsx.MxuPlan.from_config(cfg)
    rng = np.random.default_rng(k * 10 + l)
    R, ks1, N = plan.row_blocks, plan.glwe_size, cfg.polynomial_size
    B = 8
    rings = jnp.asarray(rng.integers(0, 1 << 32, size=(R, ks1, 2 * N), dtype=np.uint32))
    glwe = jnp.asarray(rng.integers(0, 1 << 32, size=(B, ks1, N), dtype=np.uint32))
    acc = jnp.asarray(rng.integers(0, 1 << 32, size=(ks1, B, N), dtype=np.uint32))
    pbn = jnp.moveaxis(glwe, 1, 0)
    d8 = bsx._digit_matrix(plan, pbn)
    rhs = bsx._build_tables_jnp(rings, N, plan.n_words, plan.limb_drop)
    want = np.asarray(acc + bsx._toeplitz_matmul(plan, d8, rhs))
    with jax.enable_x64(False):
        got = np.asarray(fc.fused_external_product_acc(
            cfg, plan, acc, d8, rings, interpret=True))
    np.testing.assert_array_equal(got, want)


def test_external_product_mxu_limb_drop_u64():
    """u64 torus limb_drop: dropping d global byte limbs equals the exact
    external product against rings whose low-word packed bytes are zeroed
    (the u64 reduced-precision regime has d up to 6)."""
    import dataclasses as dc

    from concrete_tpu.core.ggsw import encrypt_constant_ggsw

    drop = 2
    cfg = bs.ServerConfig(
        lwe_dimension=4, glwe_dimension=1, polynomial_size=64,
        pbs_base_log=7, pbs_level=2, ks_base_log=4, ks_level=3, bits=64)
    sgen = SecretRandomGenerator(3)
    glwe_sk = glwe_mod.GlweSecretKey.generate_binary(
        cfg.glwe_dimension, cfg.polynomial_size, sgen, bits=64)
    gen = EncryptionRandomGenerator(4, 5)
    ggsw = encrypt_constant_ggsw(
        glwe_sk, 1, cfg.pbs_base_log, cfg.pbs_level, 2.0 ** -45, gen)
    rng = np.random.default_rng(0)
    glwe = jnp.asarray(rng.integers(
        0, 1 << 64, size=(3, cfg.glwe_size, cfg.polynomial_size),
        dtype=np.uint64))

    rings = bsx.bsk_to_mxu(ggsw[None], cfg)[0]   # [R, ks1*2, 2N] u32 words
    cfg_fast = dc.replace(cfg, mxu_limb_drop=drop)
    got = np.asarray(
        bsx.external_product_mxu(cfg_fast, jnp.asarray(rings), glwe))

    # zero the low `drop` packed bytes of every LOW word plane (w == 0)
    masked = rings.copy()
    lowmask = np.uint32(0xFFFFFFFF << (8 * drop) & 0xFFFFFFFF)
    masked = masked.reshape(rings.shape[0], -1, 2, rings.shape[-1])
    masked[:, :, 0, :] &= lowmask
    masked = masked.reshape(rings.shape)
    want = np.asarray(
        bsx.external_product_mxu(cfg, jnp.asarray(masked), glwe))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("ks1,n,bl,l", [(5, 256, 7, 2), (2, 128, 7, 3),
                                        (3, 64, 4, 2)])
def test_rotdig_pallas_interpret_matches_xla(ks1, n, bl, l):
    """The fused rotation+digit-extraction kernel (the production TPU path
    for u32/n_sub==1) must be bit-identical to negacyclic_monomial_mul +
    _digit_matrix across glwe sizes, ring sizes, and decompositions —
    including degrees in [N, 2N) (the negated wrap half)."""
    from concrete_tpu.math import polynomial

    plan = bsx.MxuPlan(
        lwe_dimension=4, glwe_size=ks1, polynomial_size=n, base_log=bl,
        level=l, n_sub=1, ks_base_log=2, ks_level=3)
    rng = np.random.default_rng(9)
    B = 16
    acc = jnp.asarray(rng.integers(0, 1 << 32, size=(ks1, B, n),
                                   dtype=np.uint32))
    a_hat = jnp.asarray(
        np.concatenate([rng.integers(0, 2 * n, size=B - 3),
                        [0, n, 2 * n - 1]]).astype(np.uint32))
    rot = polynomial.negacyclic_monomial_mul(acc, a_hat[None, :])
    want = np.asarray(bsx._digit_matrix(plan, rot - acc))
    with jax.enable_x64(False):
        kern = bsx._rotdig_pallas(ks1, n, B, bl, l, interpret=True)
        got = np.asarray(kern(acc, a_hat.astype(jnp.int32)[:, None]))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("ks1,n,bl,l,drop", [(5, 256, 7, 2, 0),
                                             (2, 128, 7, 3, 0),
                                             (3, 64, 7, 2, 1)])
def test_rotdig_recombine_pallas_interpret_matches_xla(ks1, n, bl, l, drop):
    """The deferred-recombine kernel (recombine(s_prev) + acc update folded
    into the next rotation+digit step) must be bit-identical to the XLA
    composition acc + recombine_limb_planes followed by rotate+decompose."""
    from concrete_tpu.math import polynomial

    plan = bsx.MxuPlan(
        lwe_dimension=4, glwe_size=ks1, polynomial_size=n, base_log=bl,
        level=l, n_sub=1, ks_base_log=2, ks_level=3, limb_drop=drop)
    rng = np.random.default_rng(13)
    B = 16
    acc = jnp.asarray(rng.integers(0, 1 << 32, size=(ks1, B, n),
                                   dtype=np.uint32))
    s_prev = jnp.asarray(rng.integers(
        -(1 << 30), 1 << 30, size=(B, ks1 * plan.limbs_used * n),
        dtype=np.int32))
    a_hat = jnp.asarray(
        np.concatenate([rng.integers(0, 2 * n, size=B - 3),
                        [0, n, 2 * n - 1]]).astype(np.int32))
    acc_new_want = np.asarray(acc + bsx.recombine_limb_planes(plan, s_prev))
    rot = polynomial.negacyclic_monomial_mul(
        jnp.asarray(acc_new_want), a_hat.astype(jnp.uint32)[None, :])
    d8_want = np.asarray(bsx._digit_matrix(plan, rot - acc_new_want))
    with jax.enable_x64(False):
        kern = bsx._rotdig_recombine_pallas(
            ks1, n, B, bl, l, plan.limbs_used, plan.limb_drop,
            interpret=True)
        acc_new, d8 = kern(s_prev, acc, a_hat[:, None])
    np.testing.assert_array_equal(np.asarray(acc_new), acc_new_want)
    np.testing.assert_array_equal(np.asarray(d8), d8_want)


@pytest.mark.parametrize("ks1,n,bl,l,n_sub", [(3, 128, 8, 2, 2),
                                              (2, 64, 12, 2, 2)])
def test_rotdig_recombine_pallas_nsub_interpret_matches_xla(ks1, n, bl, l,
                                                            n_sub):
    """The deferred-recombine kernel with sub-digit splitting (DEFAULT's
    bl=8 regime rides DEFER=3 through this) must match the XLA composition
    exactly like the n_sub=1 form does."""
    from concrete_tpu.math import polynomial

    plan = bsx.MxuPlan(
        lwe_dimension=4, glwe_size=ks1, polynomial_size=n, base_log=bl,
        level=l, n_sub=n_sub, ks_base_log=2, ks_level=3)
    rng = np.random.default_rng(41)
    B = 16
    acc = jnp.asarray(rng.integers(0, 1 << 32, size=(ks1, B, n),
                                   dtype=np.uint32))
    s_prev = jnp.asarray(rng.integers(
        -(1 << 30), 1 << 30, size=(B, ks1 * plan.limbs_used * n),
        dtype=np.int32))
    a_hat = jnp.asarray(
        np.concatenate([rng.integers(0, 2 * n, size=B - 3),
                        [0, n, 2 * n - 1]]).astype(np.int32))
    acc_new_want = np.asarray(acc + bsx.recombine_limb_planes(plan, s_prev))
    rot = polynomial.negacyclic_monomial_mul(
        jnp.asarray(acc_new_want), a_hat.astype(jnp.uint32)[None, :])
    d8_want = np.asarray(bsx._digit_matrix(plan, rot - acc_new_want))
    with jax.enable_x64(False):
        kern = bsx._rotdig_recombine_pallas(
            ks1, n, B, bl, l, plan.limbs_used, plan.limb_drop, n_sub,
            interpret=True)
        acc_new, d8 = kern(s_prev, acc, a_hat[:, None])
    np.testing.assert_array_equal(np.asarray(acc_new), acc_new_want)
    np.testing.assert_array_equal(np.asarray(d8), d8_want)


@pytest.mark.parametrize("ks1,n,bl,l,n_sub", [(3, 128, 8, 2, 2),
                                              (2, 64, 12, 2, 2),
                                              (2, 64, 15, 2, 3)])
def test_rotdig_pallas_nsub2_interpret_matches_xla(ks1, n, bl, l, n_sub):
    """The rotation+digit kernel with sub-digit splitting (n_sub=2 — the
    DEFAULT_PARAMETERS base_log=8 regime — and the general n_sub=3 chunk
    loop) must be bit-identical to negacyclic_monomial_mul + _digit_matrix,
    including the balanced 7-bit chunk order (lev, sub MSB-first, ki)."""
    from concrete_tpu.math import polynomial

    plan = bsx.MxuPlan(
        lwe_dimension=4, glwe_size=ks1, polynomial_size=n, base_log=bl,
        level=l, n_sub=n_sub, ks_base_log=2, ks_level=3)
    rng = np.random.default_rng(23)
    B = 16
    acc = jnp.asarray(rng.integers(0, 1 << 32, size=(ks1, B, n),
                                   dtype=np.uint32))
    a_hat = jnp.asarray(
        np.concatenate([rng.integers(0, 2 * n, size=B - 3),
                        [0, n, 2 * n - 1]]).astype(np.uint32))
    rot = polynomial.negacyclic_monomial_mul(acc, a_hat[None, :])
    want = np.asarray(bsx._digit_matrix(plan, rot - acc))
    with jax.enable_x64(False):
        kern = bsx._rotdig_pallas(ks1, n, B, bl, l, n_sub, interpret=True)
        got = np.asarray(kern(acc, a_hat.astype(jnp.int32)[:, None]))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("drop", [0, 2])
def test_recombine_u64_pair_matches_i64(drop):
    """The u32-pair carry recombine (CONCRETE_TPU_RECOMB64=pair) must be
    bit-identical to the emulated-i64 form over the full i32 dot-output
    range, including sign-extension of every limb and carry chains across
    the 32-bit word boundary."""
    plan = bsx.MxuPlan(
        lwe_dimension=4, glwe_size=3, polynomial_size=64, base_log=7,
        level=2, n_sub=1, ks_base_log=2, ks_level=3, bits=64,
        limb_drop=drop)
    rng = np.random.default_rng(29)
    s = rng.integers(-(1 << 31), 1 << 31,
                     size=(16, 3 * plan.limbs_used * 64)).astype(np.int32)
    # adversarial rows: all-max, all-min, alternating-sign extremes
    s[0, :] = np.int32(2**31 - 1)
    s[1, :] = np.int32(-(2**31))
    s[2, ::2], s[2, 1::2] = np.int32(2**31 - 1), np.int32(-(2**31))
    s = jnp.asarray(s)
    want = np.asarray(bsx.recombine_limb_planes(plan, s))
    assert want.dtype == np.uint64
    got = np.asarray(bsx._recombine_u64_pair(plan, s))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("ks1,n,bl,l,n_sub", [(3, 64, 7, 3, 1),
                                              (2, 128, 10, 3, 2),
                                              (2, 64, 16, 2, 3)])
def test_rotdig_pallas64_interpret_matches_xla(ks1, n, bl, l, n_sub):
    """The u64 pair-plane rotation+digit kernel must be bit-identical to
    the XLA u64 form (negacyclic_monomial_mul + _digit_matrix), including
    the borrow-coupled negacyclic negation, the high-word rounding prologue
    (bl*l < 32) and the nr == 32 edge (bl=16, l=2) where the rounding bit
    comes from the LOW word."""
    from concrete_tpu.math import polynomial

    plan = bsx.MxuPlan(
        lwe_dimension=4, glwe_size=ks1, polynomial_size=n, base_log=bl,
        level=l, n_sub=n_sub, ks_base_log=2, ks_level=3, bits=64)
    rng = np.random.default_rng(31)
    B = 16
    acc64 = rng.integers(0, 1 << 64, size=(ks1, B, n), dtype=np.uint64)
    # adversarial coefficients: carry/borrow extremes at the word boundary
    acc64[0, 0, :4] = [0, 1, 0xFFFF_FFFF, 0x1_0000_0000]
    acc64[0, 1, :4] = [0xFFFF_FFFF_FFFF_FFFF, 0x8000_0000,
                      0x7FFF_FFFF_FFFF_FFFF, 0x8000_0000_0000_0000]
    acc = jnp.asarray(acc64)
    a_hat = jnp.asarray(
        np.concatenate([rng.integers(0, 2 * n, size=B - 3),
                        [0, n, 2 * n - 1]]).astype(np.uint64))
    rot = polynomial.negacyclic_monomial_mul(acc, a_hat[None, :])
    want = np.asarray(bsx._digit_matrix(plan, rot - acc))
    planes = bsx._acc_u64_to_planes(acc)
    with jax.enable_x64(False):
        kern = bsx._rotdig_pallas64(ks1, n, B, bl, l, n_sub, interpret=True)
        got = np.asarray(kern(planes, a_hat.astype(jnp.int32)[:, None]))
    np.testing.assert_array_equal(got, want)


def test_rotdig_pallas64_rejects_wide_prefix():
    with pytest.raises(NotImplementedError):
        bsx._rotdig_pallas64(2, 64, 16, 12, 3, 2)  # 36 prefix bits


def test_blind_rotate_u64_planes_interpret_matches_default():
    """The i64-free u64 blind rotation (pair-plane kernel in the scan +
    carry-explicit accumulate) must match blind_rotate_mxu's default path
    bit for bit on real bootstrap-key-shaped data."""
    cfg = bs.ServerConfig(
        lwe_dimension=6, glwe_dimension=1, polynomial_size=64,
        pbs_base_log=10, pbs_level=3, ks_base_log=4, ks_level=3, bits=64)
    plan = bsx.MxuPlan.from_config(cfg)
    rng = np.random.default_rng(37)
    B = 8
    bsk_raw = rng.integers(0, 1 << 64,
                           size=(cfg.lwe_dimension, cfg.pbs_level,
                                 cfg.glwe_size, cfg.glwe_size,
                                 cfg.polynomial_size), dtype=np.uint64)
    bsk = jnp.asarray(bsx.bsk_to_mxu(bsk_raw, cfg))
    lut = jnp.asarray(rng.integers(0, 1 << 64,
                                   size=(cfg.glwe_size, cfg.polynomial_size),
                                   dtype=np.uint64))
    lwe = jnp.asarray(rng.integers(0, 1 << 64, size=(B, cfg.lwe_dimension + 1),
                                   dtype=np.uint64))
    want = np.asarray(bsx.blind_rotate_mxu(cfg, bsk, lut, lwe))

    b_hat = bsx.pbs_modulus_switch(lwe[..., -1], cfg.polynomial_size, 0, 0)
    a_hats = jnp.moveaxis(
        bsx.pbs_modulus_switch(lwe[..., :-1], cfg.polynomial_size, 0, 0),
        -1, 0)
    from concrete_tpu.math import polynomial
    acc = jnp.moveaxis(
        jnp.broadcast_to(lut[None], (B, cfg.glwe_size, cfg.polynomial_size)),
        1, 0)
    acc = polynomial.negacyclic_monomial_div(acc, b_hat[None, :])
    got = np.asarray(bsx._blind_rotate_u64_planes(
        plan, bsk, acc, a_hats, 1, (B,), interpret=True))
    np.testing.assert_array_equal(got, want)
