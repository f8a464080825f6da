"""VectorLWE: a vector of LWE ciphertexts with per-slot encoders.

Mirrors concrete/src/vector_lwe/mod.rs (2,548 LoC): the same operation set as
LWE, batched over `nb_ciphertexts` slots each carrying its own Encoder and
variance, plus vector-only operations (sum_with_padding, sum_with_new_min,
per-slot bootstrap). On TPU the slot axis is just another batch axis.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from .. import npe
from ..csprng import EncryptionRandomGenerator
from ..dispersion import Variance
from . import errors
from .encoder import BITS, DTYPE, Encoder
from .keys import LWEBSK, LWEKSK, LWESecretKey
from .lwe import LWE, generate_functional_lut


@dataclasses.dataclass
class VectorLWE:
    """data: [m, n+1] u64; encoders: list of m Encoder; variances: [m]."""

    data: np.ndarray
    encoders: list
    variances: np.ndarray

    # -- constructors ---------------------------------------------------------

    @classmethod
    def encode_encrypt(
        cls,
        sk: LWESecretKey,
        messages,
        encoder: Encoder,
        *,
        mask_seed: int | None = None,
        noise_seed: int | None = None,
    ) -> "VectorLWE":
        """Encrypt a vector of reals under one (copied) encoder
        (vector_lwe/mod.rs encode_encrypt)."""
        msgs = np.asarray(messages, dtype=np.float64).ravel()
        pts = encoder.encode_core(msgs)
        gen = EncryptionRandomGenerator(mask_seed, noise_seed)
        data = sk.inner.encrypt(pts, sk.std_dev, gen)
        encs = [encoder.copy() for _ in msgs]
        for e in encs:
            e.update_precision_from_variance(sk.variance)
        return cls(data=data, encoders=encs, variances=np.full(len(msgs), sk.variance))

    @classmethod
    def from_lwes(cls, lwes: list) -> "VectorLWE":
        return cls(
            data=np.stack([l.data for l in lwes]),
            encoders=[l.encoder.copy() for l in lwes],
            variances=np.array([l.variance for l in lwes]),
        )

    @property
    def nb_ciphertexts(self) -> int:
        return self.data.shape[0]

    @property
    def dimension(self) -> int:
        return self.data.shape[-1] - 1

    def copy(self) -> "VectorLWE":
        return VectorLWE(
            self.data.copy(), [e.copy() for e in self.encoders], self.variances.copy()
        )

    def extract_nth(self, n: int) -> LWE:
        """Copy out one slot as a standalone LWE (vector_lwe extract_nth)."""
        return LWE(self.data[n].copy(), self.encoders[n].copy(), float(self.variances[n]))

    # -- decryption -------------------------------------------------------------

    def decrypt_decode(self, sk: LWESecretKey) -> np.ndarray:
        phase = sk.inner.decrypt(self.data)
        return np.array(
            [self.encoders[i].decode_core(phase[i]) for i in range(self.nb_ciphertexts)]
        )

    # -- elementwise ops (delegate to LWE semantics per slot, vectorized) ---------

    def _zip_op(self, other: "VectorLWE", op_name: str) -> "VectorLWE":
        assert self.nb_ciphertexts == other.nb_ciphertexts
        outs = [
            getattr(self.extract_nth(i), op_name)(other.extract_nth(i))
            for i in range(self.nb_ciphertexts)
        ]
        return VectorLWE.from_lwes(outs)

    def add_with_padding(self, other: "VectorLWE") -> "VectorLWE":
        return self._zip_op(other, "add_with_padding")

    def sub_with_padding(self, other: "VectorLWE") -> "VectorLWE":
        return self._zip_op(other, "sub_with_padding")

    def add_centered(self, other: "VectorLWE") -> "VectorLWE":
        return self._zip_op(other, "add_centered")

    def add_constant_static_encoder(self, constants) -> "VectorLWE":
        c = np.broadcast_to(np.asarray(constants, dtype=np.float64), (self.nb_ciphertexts,))
        outs = [
            self.extract_nth(i).add_constant_static_encoder(c[i])
            for i in range(self.nb_ciphertexts)
        ]
        return VectorLWE.from_lwes(outs)

    def add_constant_dynamic_encoder(self, constants) -> "VectorLWE":
        c = np.broadcast_to(np.asarray(constants, dtype=np.float64), (self.nb_ciphertexts,))
        out = self.copy()
        for i in range(self.nb_ciphertexts):
            out.encoders[i].o += float(c[i])
        return out

    def mul_constant_static_encoder(self, constants) -> "VectorLWE":
        c = np.broadcast_to(np.asarray(constants, dtype=np.int64), (self.nb_ciphertexts,))
        outs = [
            self.extract_nth(i).mul_constant_static_encoder(int(c[i]))
            for i in range(self.nb_ciphertexts)
        ]
        return VectorLWE.from_lwes(outs)

    def mul_constant_with_padding(
        self, constants, max_constant: float, nb_bit_padding: int
    ) -> "VectorLWE":
        c = np.broadcast_to(np.asarray(constants, dtype=np.float64), (self.nb_ciphertexts,))
        outs = [
            self.extract_nth(i).mul_constant_with_padding(
                float(c[i]), max_constant, nb_bit_padding
            )
            for i in range(self.nb_ciphertexts)
        ]
        return VectorLWE.from_lwes(outs)

    def opposite_nth(self, n: int) -> "VectorLWE":
        out = self.copy()
        neg = self.extract_nth(n).opposite()
        out.data[n] = neg.data
        out.encoders[n] = neg.encoder
        return out

    # -- reductions (vector_lwe/mod.rs:2370-2521) ----------------------------------

    def sum_with_padding(self) -> LWE:
        """Sum all slots, consuming ceil(log2(m)) padding bits."""
        m = self.nb_ciphertexts
        need = int(np.ceil(np.log2(m))) if m > 1 else 0
        for e in self.encoders:
            if e.nb_bit_padding < need:
                raise errors.NotEnoughPaddingError(e.nb_bit_padding, need)
            if not _deltas_close(e.delta, self.encoders[0].delta):
                raise errors.DeltaError(e.delta, self.encoders[0].delta)
        data = self.data.sum(axis=0, dtype=DTYPE)
        enc = self.encoders[0].copy()
        enc.o = float(sum(e.o for e in self.encoders))
        enc.delta *= 2.0 ** need
        enc.nb_bit_padding -= need
        enc.nb_bit_precision = min(e.nb_bit_precision for e in self.encoders)
        var = float(self.variances.sum())
        enc.update_precision_from_variance(var)
        return LWE(data, enc, var)

    def sum_with_new_min(self, new_min: float) -> LWE:
        """Sum all slots with a chosen output minimum (vector_lwe:2457)."""
        for e in self.encoders:
            if not _deltas_close(e.delta, self.encoders[0].delta):
                raise errors.DeltaError(e.delta, self.encoders[0].delta)
        data = self.data.sum(axis=0, dtype=DTYPE)
        enc = self.encoders[0].copy()
        tmp = enc.copy()
        tmp.o = 0.0
        correction = tmp.encode_core(
            np.float64(sum(e.o for e in self.encoders) - new_min)
        )
        data[..., -1] -= correction
        enc.o = new_min
        enc.nb_bit_precision = min(e.nb_bit_precision for e in self.encoders)
        var = float(self.variances.sum())
        enc.update_precision_from_variance(var)
        return LWE(data, enc, var)

    # -- keyswitch / bootstrap -------------------------------------------------------

    def keyswitch(self, ksk: LWEKSK) -> "VectorLWE":
        out_data = np.array(ksk.run_keyswitch(jnp.asarray(self.data)))
        out = self.copy()
        out.data = out_data
        for i in range(self.nb_ciphertexts):
            v = npe.estimate_keyswitch_noise_with_constant_terms(
                self.dimension,
                Variance(float(self.variances[i])),
                Variance(ksk.variance),
                ksk.base_log,
                ksk.level,
                BITS,
            ).get_variance()
            out.variances[i] = v
            out.encoders[i].update_precision_from_variance(v)
        return out

    def bootstrap_nth(self, bsk: LWEBSK, n: int) -> "VectorLWE":
        """Bootstrap slot n with the identity (vector_lwe:1969)."""
        return self.bootstrap_nth_with_function(bsk, lambda x: x, self.encoders[n], n)

    def bootstrap_nth_with_function(
        self, bsk: LWEBSK, f, encoder_output: Encoder, n: int
    ) -> "VectorLWE":
        """Bootstrap slot n through f (vector_lwe:2028)."""
        if not 0 <= n < self.nb_ciphertexts:
            raise errors.IndexError_(f"slot {n} out of range")
        out_lwe = self.extract_nth(n).bootstrap_with_function(bsk, f, encoder_output)
        return VectorLWE.from_lwes([out_lwe])

    def bootstrap_all_with_function(self, bsk: LWEBSK, f, encoder_output: Encoder) -> "VectorLWE":
        """TPU-native extension: bootstrap ALL slots in one batched PBS.

        Requires identical input encoders across slots (the common case);
        the whole vector rides one CMux chain as a batch.
        """
        enc0 = self.encoders[0]
        for e in self.encoders:
            if (not _deltas_close(e.delta, enc0.delta)
                    or e.nb_bit_padding != enc0.nb_bit_padding
                    or e.o != enc0.o):
                raise errors.DeltaError(e.delta, enc0.delta)
        lut = generate_functional_lut(bsk, enc0, encoder_output, f)
        cfg = bsk.cfg
        accumulator = jnp.zeros(
            (cfg.glwe_size, cfg.polynomial_size), dtype=jnp.uint64
        ).at[-1, :].set(jnp.asarray(lut))
        data = self.data
        if enc0.nb_bit_padding > 1:
            data = (data << DTYPE(enc0.nb_bit_padding - 1)).astype(DTYPE)
        out_data = np.array(bsk.run_bootstrap(accumulator, jnp.asarray(data)))
        new_var = npe.estimate_pbs_noise(
            self.dimension, bsk.polynomial_size, bsk.dimension,
            bsk.base_log, bsk.level, Variance(bsk.variance), BITS,
        ).get_variance()
        encs = []
        for _ in range(self.nb_ciphertexts):
            e = encoder_output.copy()
            e.update_precision_from_variance(new_var)
            encs.append(e)
        return VectorLWE(out_data, encs, np.full(self.nb_ciphertexts, new_var))

    # -- serialization ------------------------------------------------------------

    def save(self, path: str):
        import json

        np.savez_compressed(
            path,
            data=self.data,
            variances=self.variances,
            encoders=json.dumps([e.to_json() for e in self.encoders]),
        )

    @classmethod
    def load(cls, path: str) -> "VectorLWE":
        import json

        d = np.load(path, allow_pickle=False)
        encs = [Encoder.from_json(s) for s in json.loads(str(d["encoders"]))]
        return cls(data=d["data"], encoders=encs, variances=d["variances"])


def _deltas_close(d1: float, d2: float) -> bool:
    return abs(d1 - d2) <= max(abs(d1), abs(d2)) * 2.0 ** -45
