"""Server key and homomorphic gates, batched and jitted.

Reference: concrete-boolean/src/server_key/mod.rs. ServerKey::new (:55-111):
generate the standard-domain BSK under the GLWE key, transform it (here: to
the exact NTT domain), flatten the GLWE key to the "big" LWE key, and build
the keyswitch key back to the small LWE key.

Gate linear combinations (:133-614):
  AND:  l + r - 1/8        NAND: -l - r + 1/8
  OR:   l + r + 1/8        NOR:  -l - r - 1/8
  XOR:  2(l + r) + 1/4     XNOR: 2(-l - r) - 1/4
  NOT:  -l (no bootstrap)  MUX:  pbs(c+t-1/8) + pbs(-c+e-1/8) + 1/8, keyswitch
Each bootstrapped gate = linear combination -> PBS with constant +1/8 test
polynomial -> keyswitch. All gates broadcast over leading batch axes.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core import bootstrap as bs
from ..core.ggsw import StandardBootstrapKey, bsk_to_ntt
from ..core.lwe import LweKeyswitchKey
from ..csprng import EncryptionRandomGenerator
from .client_key import ClientKey, PLAINTEXT_LOG_SCALING_FACTOR, PLAINTEXT_TRUE

_EIGHTH = np.uint32(1 << (32 - PLAINTEXT_LOG_SCALING_FACTOR))
_QUARTER = np.uint32(1 << (32 - PLAINTEXT_LOG_SCALING_FACTOR + 1))
_NEG_EIGHTH = np.uint32((-(1 << (32 - PLAINTEXT_LOG_SCALING_FACTOR))) % (1 << 32))
_NEG_QUARTER = np.uint32((-(1 << (32 - PLAINTEXT_LOG_SCALING_FACTOR + 1))) % (1 << 32))


@dataclasses.dataclass
class ServerKey:
    """NTT-domain bootstrap key + keyswitch key + static config."""

    bsk_ntt: jax.Array  # [n, P, l, k+1, k+1, N] uint32 Montgomery spectra
    ksk: jax.Array      # [kN, l_ks, n+1] uint32
    cfg: bs.ServerConfig
    bsk_standard: np.ndarray | None = None  # kept for serialization/tests

    @classmethod
    def new(
        cls,
        cks: ClientKey,
        *,
        mask_seed: int | None = None,
        noise_seed: int | None = None,
        keep_standard_bsk: bool = False,
    ) -> "ServerKey":
        p = cks.parameters
        cfg = bs.ServerConfig.from_boolean_parameters(p)
        gen = EncryptionRandomGenerator(mask_seed, noise_seed)
        std_bsk = StandardBootstrapKey.generate(
            cks.lwe_secret_key,
            cks.glwe_secret_key,
            p.pbs_base_log,
            p.pbs_level,
            p.glwe_modular_std_dev.std_dev,
            gen,
        )
        bsk_ntt = bsk_to_ntt(std_bsk.data, cfg.primes, cfg.bits)
        big_key = cks.glwe_secret_key.into_lwe_key()
        ksk = LweKeyswitchKey.generate(
            big_key,
            cks.lwe_secret_key,
            p.ks_base_log,
            p.ks_level,
            p.lwe_modular_std_dev.std_dev,
            gen,
        )
        return cls(
            bsk_ntt=bsk_ntt,
            ksk=jnp.asarray(ksk.data),
            cfg=cfg,
            bsk_standard=std_bsk.data if keep_standard_bsk else None,
        )

    def save(self, path: str):
        """Serialize from the coefficient-domain BSK (requires
        keep_standard_bsk=True at construction)."""
        assert self.bsk_standard is not None, "constructed without standard BSK"
        np.savez_compressed(
            path,
            bsk=self.bsk_standard,
            ksk=np.asarray(self.ksk),
            lwe_dimension=self.cfg.lwe_dimension,
            glwe_dimension=self.cfg.glwe_dimension,
            polynomial_size=self.cfg.polynomial_size,
            pbs_base_log=self.cfg.pbs_base_log,
            pbs_level=self.cfg.pbs_level,
            ks_base_log=self.cfg.ks_base_log,
            ks_level=self.cfg.ks_level,
        )

    @classmethod
    def load(cls, path: str) -> "ServerKey":
        from ..core.ggsw import bsk_to_ntt

        d = np.load(path, allow_pickle=False)
        cfg = bs.ServerConfig(
            lwe_dimension=int(d["lwe_dimension"]),
            glwe_dimension=int(d["glwe_dimension"]),
            polynomial_size=int(d["polynomial_size"]),
            pbs_base_log=int(d["pbs_base_log"]),
            pbs_level=int(d["pbs_level"]),
            ks_base_log=int(d["ks_base_log"]),
            ks_level=int(d["ks_level"]),
        )
        return cls(
            bsk_ntt=bsk_to_ntt(d["bsk"], cfg.primes, cfg.bits),
            ksk=jnp.asarray(d["ksk"]),
            cfg=cfg,
            bsk_standard=d["bsk"],
        )

    # -- gates -------------------------------------------------------------

    def _pipeline(self):
        return _gate_pipeline(self.cfg)

    def and_(self, ct_left, ct_right):
        lin = jnp.asarray(ct_left) + jnp.asarray(ct_right)
        lin = lin.at[..., -1].add(_NEG_EIGHTH)
        return self._pipeline()(self.bsk_ntt, self.ksk, lin)

    def nand(self, ct_left, ct_right):
        lin = jnp.zeros_like(jnp.asarray(ct_left)) - ct_left - ct_right
        lin = lin.at[..., -1].add(_EIGHTH)
        return self._pipeline()(self.bsk_ntt, self.ksk, lin)

    def or_(self, ct_left, ct_right):
        lin = jnp.asarray(ct_left) + jnp.asarray(ct_right)
        lin = lin.at[..., -1].add(_EIGHTH)
        return self._pipeline()(self.bsk_ntt, self.ksk, lin)

    def nor(self, ct_left, ct_right):
        lin = jnp.zeros_like(jnp.asarray(ct_left)) - ct_left - ct_right
        lin = lin.at[..., -1].add(_NEG_EIGHTH)
        return self._pipeline()(self.bsk_ntt, self.ksk, lin)

    def xor(self, ct_left, ct_right):
        lin = (jnp.asarray(ct_left) + jnp.asarray(ct_right)) * np.uint32(2)
        lin = lin.at[..., -1].add(_QUARTER)
        return self._pipeline()(self.bsk_ntt, self.ksk, lin)

    def xnor(self, ct_left, ct_right):
        lin = (jnp.zeros_like(jnp.asarray(ct_left)) - ct_left - ct_right) * np.uint32(2)
        lin = lin.at[..., -1].add(_NEG_QUARTER)
        return self._pipeline()(self.bsk_ntt, self.ksk, lin)

    def not_(self, ct):
        """Free negation, no bootstrap (server_key/mod.rs:422-429)."""
        return jnp.zeros_like(jnp.asarray(ct)) - ct

    def mux(self, ct_condition, ct_then, ct_else):
        """(c ? t : e) via two PBS + one keyswitch (server_key/mod.rs:197-279)."""
        return _mux_pipeline(self.cfg)(
            self.bsk_ntt, self.ksk, jnp.asarray(ct_condition),
            jnp.asarray(ct_then), jnp.asarray(ct_else),
        )


@functools.lru_cache(maxsize=None)
def _gate_pipeline(cfg: bs.ServerConfig):
    """jit(PBS with constant 1/8 accumulator + keyswitch)."""

    def run(bsk_ntt, ksk, lin):
        lut = bs.trivial_lut_constant(cfg, PLAINTEXT_TRUE)
        return bs.bootstrap_keyswitch(cfg, bsk_ntt, ksk, lut, lin)

    return jax.jit(run)


@functools.lru_cache(maxsize=None)
def _mux_pipeline(cfg: bs.ServerConfig):
    def run(bsk_ntt, ksk, c, t, e):
        lut = bs.trivial_lut_constant(cfg, PLAINTEXT_TRUE)
        lin1 = (c + t).at[..., -1].add(_NEG_EIGHTH)
        lin2 = (jnp.zeros_like(c) - c + e).at[..., -1].add(_NEG_EIGHTH)
        # both bootstraps share the CMux chain by stacking on a batch axis
        both = jnp.stack([lin1, lin2], axis=0)
        pbs = bs.bootstrap(cfg, bsk_ntt, lut, both)
        summed = (pbs[0] + pbs[1]).at[..., -1].add(_EIGHTH)
        from ..core import lwe as lwe_ops

        return lwe_ops.keyswitch(
            ksk, summed, base_log=cfg.ks_base_log, level_count=cfg.ks_level
        )

    return jax.jit(run)
