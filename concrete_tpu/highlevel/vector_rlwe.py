"""VectorRLWE: packed RLWE ciphertexts (many messages per polynomial).

Mirrors concrete/src/vector_rlwe/mod.rs (1,573 LoC): encrypt whole message
polynomials (N messages per RLWE), extract individual coefficients as LWE
ciphertexts of dimension k*N, and constant add/mul families.

Deviation from the reference: encoders/variances are tracked per *ciphertext*
rather than per coefficient (packed slots share an encoder in every supported
construction); per-coefficient tracking lands with the packing keyswitch.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from .. import npe
from ..csprng import EncryptionRandomGenerator
from ..dispersion import Variance
from . import errors
from .encoder import BITS, DTYPE, Encoder
from .keys import RLWESecretKey
from .vector_lwe import VectorLWE


@dataclasses.dataclass
class VectorRLWE:
    """data: [m, k+1, N] u64; one encoder + variance per ciphertext."""

    data: np.ndarray
    encoders: list
    variances: np.ndarray

    @property
    def nb_ciphertexts(self) -> int:
        return self.data.shape[0]

    @property
    def dimension(self) -> int:
        return self.data.shape[1] - 1

    @property
    def polynomial_size(self) -> int:
        return self.data.shape[-1]

    def copy(self) -> "VectorRLWE":
        return VectorRLWE(
            self.data.copy(), [e.copy() for e in self.encoders], self.variances.copy()
        )

    # -- construction (vector_rlwe/mod.rs:130-260) -------------------------------

    @classmethod
    def encode_encrypt_packed(
        cls,
        sk: RLWESecretKey,
        messages,
        encoder: Encoder,
        *,
        mask_seed: int | None = None,
        noise_seed: int | None = None,
    ) -> "VectorRLWE":
        """Pack reals N-per-ciphertext and encrypt (:208)."""
        msgs = np.asarray(messages, dtype=np.float64).ravel()
        n = sk.polynomial_size
        m = int(np.ceil(len(msgs) / n))
        padded = np.zeros(m * n, dtype=np.float64)
        padded[: len(msgs)] = msgs
        padded[len(msgs):] = encoder.o  # encode interval minimum for padding
        pts = encoder.encode_core(padded).reshape(m, n)
        gen = EncryptionRandomGenerator(mask_seed, noise_seed)
        data = sk.inner.encrypt(pts, sk.std_dev, gen)
        encs = [encoder.copy() for _ in range(m)]
        for e in encs:
            e.update_precision_from_variance(sk.variance)
        return cls(data=data, encoders=encs, variances=np.full(m, sk.variance))

    @classmethod
    def encrypt_packed(
        cls,
        sk: RLWESecretKey,
        plaintexts: np.ndarray,
        *,
        mask_seed: int | None = None,
        noise_seed: int | None = None,
    ) -> "VectorRLWE":
        """Encrypt raw torus plaintexts without encoding (:130)."""
        pts = np.asarray(plaintexts, dtype=DTYPE)
        n = sk.polynomial_size
        m = int(np.ceil(pts.size / n))
        padded = np.zeros(m * n, dtype=DTYPE)
        padded.ravel()[: pts.size] = pts.ravel()
        gen = EncryptionRandomGenerator(mask_seed, noise_seed)
        data = sk.inner.encrypt(padded.reshape(m, n), sk.std_dev, gen)
        encs = [Encoder(0.0, 1.0, 32, 0) for _ in range(m)]
        return cls(data=data, encoders=encs, variances=np.full(m, sk.variance))

    # -- decryption ---------------------------------------------------------------

    def decrypt_decode(self, sk: RLWESecretKey) -> np.ndarray:
        phase = sk.inner.decrypt(self.data)  # [m, N]
        return np.stack(
            [self.encoders[i].decode_core(phase[i]) for i in range(self.nb_ciphertexts)]
        )

    # -- coefficient extraction (vector_rlwe:671) -----------------------------------

    def extract_1_lwe(self, n_coeff: int, n_ciphertext: int) -> VectorLWE:
        """LWE(dim k*N) of coefficient `n_coeff` of ciphertext `n_ciphertext`."""
        if n_ciphertext >= self.nb_ciphertexts:
            raise errors.IndexError_(f"ciphertext {n_ciphertext} out of range")
        if n_coeff >= self.polynomial_size:
            raise errors.IndexError_(f"coefficient {n_coeff} out of range")
        k, n = self.dimension, self.polynomial_size
        ct = self.data[n_ciphertext]
        rot = n - n_coeff - 1
        mask = ct[:k][:, ::-1].copy()  # reverse each mask polynomial
        mask[:, :rot] = (np.zeros_like(mask[:, :rot]) - mask[:, :rot])  # negate first rot
        mask = np.roll(mask, -rot, axis=-1)  # rotate left by rot
        body = ct[k, n_coeff]
        out = np.concatenate([mask.reshape(-1), np.array([body], dtype=DTYPE)])
        return VectorLWE(
            data=out[None, :],
            encoders=[self.encoders[n_ciphertext].copy()],
            variances=np.array([self.variances[n_ciphertext]]),
        )

    def extract_bunch_of_lwes(self, coeffs, n_ciphertext: int) -> VectorLWE:
        outs = [self.extract_1_lwe(c, n_ciphertext) for c in coeffs]
        return VectorLWE(
            data=np.concatenate([o.data for o in outs]),
            encoders=[o.encoders[0] for o in outs],
            variances=np.concatenate([o.variances for o in outs]),
        )

    # -- constant families (vector_rlwe:763-1310) --------------------------------------

    def add_constant_static_encoder(self, messages) -> "VectorRLWE":
        """Add constants coefficient-wise within each slot's encoder."""
        out = self.copy()
        msgs = np.asarray(messages, dtype=np.float64).reshape(
            self.nb_ciphertexts, self.polynomial_size
        )
        from ..torus import from_torus_f64

        for i, enc in enumerate(self.encoders):
            corr = from_torus_f64(msgs[i] / enc.delta, BITS)
            if enc.nb_bit_padding > 0:
                corr = corr >> DTYPE(enc.nb_bit_padding)
            out.data[i, -1, :] += corr
        return out

    def add_constant_dynamic_encoder(self, messages) -> "VectorRLWE":
        out = self.copy()
        msgs = np.broadcast_to(
            np.asarray(messages, dtype=np.float64), (self.nb_ciphertexts,)
        )
        for i in range(self.nb_ciphertexts):
            out.encoders[i].o += float(msgs[i])
        return out

    def mul_constant_static_encoder(self, messages) -> "VectorRLWE":
        """Multiply each ciphertext by a small integer (:1143)."""
        out = self.copy()
        c = np.broadcast_to(np.asarray(messages, dtype=np.int64), (self.nb_ciphertexts,))
        for i, enc in enumerate(self.encoders):
            zero_pt = enc.encode_outside_interval(np.float64(0.0))
            out.data[i] = (self.data[i] * DTYPE(int(c[i]) % (1 << BITS))).astype(DTYPE)
            out.data[i, -1, :] -= DTYPE((int(c[i]) - 1) % (1 << BITS)) * np.full(
                self.polynomial_size, zero_pt, dtype=DTYPE
            )
            v = npe.estimate_integer_plaintext_multiplication_noise(
                Variance(float(self.variances[i])), int(abs(c[i]))
            ).get_variance()
            out.variances[i] = v
            out.encoders[i].update_precision_from_variance(v)
        return out

    # -- serialization -------------------------------------------------------------

    def save(self, path: str):
        import json

        np.savez_compressed(
            path,
            data=self.data,
            variances=self.variances,
            encoders=json.dumps([e.to_json() for e in self.encoders]),
        )

    @classmethod
    def load(cls, path: str) -> "VectorRLWE":
        import json

        d = np.load(path, allow_pickle=False)
        encs = [Encoder.from_json(s) for s in json.loads(str(d["encoders"]))]
        return cls(data=d["data"], encoders=encs, variances=d["variances"])
