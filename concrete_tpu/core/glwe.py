"""GLWE (RLWE) layer: secret keys, encryption, decryption, packing keyswitch.

Ciphertext layout matches the reference (crypto/glwe/ciphertext.rs:17): a
GLWE ciphertext is [(k+1), N] with the body polynomial LAST; batches stack on
leading axes. Client-side ops are numpy+NTT (bit-exact under fixed seeds,
reference: crypto/secret/glwe.rs).

Example (trivial encryption is exact):
    >>> import numpy as np
    >>> from concrete_tpu.core import glwe
    >>> poly = np.arange(8, dtype=np.uint32)
    >>> ct = glwe.trivial_encrypt(poly, 2)
    >>> np.array_equal(glwe.trivial_decrypt(np.asarray(ct)), poly)
    True
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp

from ..csprng import EncryptionRandomGenerator, SecretRandomGenerator
from ..math import polynomial
from ..torus import UNSIGNED

import functools
import jax


@functools.partial(jax.jit, static_argnums=(2, 3))
def _jit_multisum(masks, key, bits, small_max=1):
    return polynomial.multisum_negacyclic(masks, key, bits, small_max=small_max)


@dataclasses.dataclass
class GlweSecretKey:
    """A GLWE secret key: [k, N] array of key polynomials (secret/glwe.rs:31)."""

    key: np.ndarray  # [k, N]
    kind: str
    bits: int

    @property
    def dimension(self) -> int:
        return self.key.shape[0]

    @property
    def polynomial_size(self) -> int:
        return self.key.shape[1]

    @classmethod
    def generate_binary(cls, dim: int, poly_size: int, gen: SecretRandomGenerator, bits: int = 32):
        return cls(
            gen.generate_binary_array(dim * poly_size, bits).reshape(dim, poly_size),
            "binary",
            bits,
        )

    @classmethod
    def generate_ternary(cls, dim: int, poly_size: int, gen: SecretRandomGenerator, bits: int = 32):
        return cls(
            gen.generate_ternary_array(dim * poly_size, bits).reshape(dim, poly_size),
            "ternary",
            bits,
        )

    @classmethod
    def generate_gaussian(cls, dim: int, poly_size: int, gen: SecretRandomGenerator, bits: int = 32):
        return cls(
            gen.generate_gaussian_array(dim * poly_size, bits).reshape(dim, poly_size),
            "gaussian",
            bits,
        )

    @classmethod
    def generate_uniform(cls, dim: int, poly_size: int, gen: SecretRandomGenerator, bits: int = 32):
        return cls(
            gen.generate_uniform_array(dim * poly_size, bits).reshape(dim, poly_size),
            "uniform",
            bits,
        )

    def into_lwe_key(self):
        """Flatten to the "big" LWE key of dimension k*N (secret/glwe.rs:332);
        used after sample extraction."""
        from .lwe import LweSecretKey

        return LweSecretKey(self.key.reshape(-1).copy(), self.kind, self.bits)

    # -- encryption ----------------------------------------------------------

    def _key_magnitude(self) -> int:
        """Centered magnitude bound of key coefficients (drives the exact
        multisum's CRT prime budget)."""
        return 1 if self.kind in ("binary", "ternary") else 1 << (self.bits - 1)

    def _multisum(self, masks: np.ndarray) -> np.ndarray:
        """sum_j mask_j * s_j mod (X^N+1, 2^bits) — exact via NTT+CRT,
        batched over all leading axes in one jitted call."""
        return np.array(
            _jit_multisum(jnp.asarray(masks), jnp.asarray(self.key), self.bits,
                          small_max=self._key_magnitude())
        )

    def encrypt_from_randomness(
        self, masks: np.ndarray, noises: np.ndarray, msgs: np.ndarray
    ) -> np.ndarray:
        """Assemble ciphertexts from pre-drawn randomness.

        masks: [..., k, N]; noises, msgs: [..., N]. body = noise +
        sum_j a_j*s_j + msg (secret/glwe.rs:488-516). Separating randomness
        from assembly lets key generation draw per-fork randomness
        sequentially (bit-exact) but run every polynomial product in one
        batched NTT.
        """
        bodies = noises + self._multisum(masks) + msgs
        return np.concatenate([masks, bodies[..., None, :]], axis=-2)

    def draw_randomness(self, count: int, std: float, gen: EncryptionRandomGenerator):
        """Per-ciphertext stream order (secret/glwe.rs:488-516): gaussian
        noise for the body FIRST (noise stream), then k mask polynomials
        (mask stream). N is even, so batched pair consumption matches the
        per-ciphertext loop."""
        k, n = self.dimension, self.polynomial_size
        assert n % 2 == 0
        noises = gen.fill_noise(count * n, std, self.bits).reshape(count, n)
        masks = gen.fill_mask(count * k * n, self.bits).reshape(count, k, n)
        return masks, noises

    def encrypt(
        self,
        messages: np.ndarray,  # [..., N]
        std: float,
        gen: EncryptionRandomGenerator,
    ) -> np.ndarray:
        """Encrypt message polynomials -> [..., k+1, N]."""
        dt = UNSIGNED[self.bits]
        k, n = self.dimension, self.polynomial_size
        msgs = np.asarray(messages, dtype=dt)
        lead = msgs.shape[:-1]
        count = int(np.prod(lead, dtype=np.int64)) if lead else 1
        masks, noises = self.draw_randomness(count, std, gen)
        out = self.encrypt_from_randomness(masks, noises, msgs.reshape(count, n))
        return out.reshape(lead + (k + 1, n))

    def encrypt_zero(self, count_shape, std: float, gen: EncryptionRandomGenerator):
        """Fresh encryptions of zero (secret/glwe.rs:547)."""
        n = self.polynomial_size
        zeros = np.zeros(tuple(count_shape) + (n,), dtype=UNSIGNED[self.bits])
        return self.encrypt(zeros, std, gen)

    def decrypt(self, ct: np.ndarray) -> np.ndarray:
        """body - sum_j a_j*s_j (secret/glwe.rs:694)."""
        masks = ct[..., :-1, :]
        body = ct[..., -1, :]
        return (body - self._multisum(masks)).astype(UNSIGNED[self.bits])


# ---------------------------------------------------------------------------
# NTT-domain GLWE (FourierGlweCiphertext analog, crypto/glwe/fourier.rs:18)
# ---------------------------------------------------------------------------


def trivial_encrypt(poly, glwe_dimension: int):
    """Trivial GLWE: zero mask polynomials, body = plaintext polynomial
    (glwe_ciphertext_trivial_encryption engine). poly: [..., N] ->
    [..., k+1, N]."""
    import jax.numpy as jnp

    poly = jnp.asarray(poly)
    out = jnp.zeros(poly.shape[:-1] + (glwe_dimension + 1, poly.shape[-1]),
                    dtype=poly.dtype)
    return out.at[..., -1, :].set(poly)


def trivial_decrypt(ct):
    """Body polynomial of a trivial GLWE."""
    return ct[..., -1, :]


def glwe_to_ntt(glwe, primes: tuple, bits: int):
    """Forward-transform a GLWE tensor -> [P, ..., N] Montgomery spectra.

    Torus coefficients are centered (signed) before residue reduction. The
    analog of the reference's standard->Fourier GLWE conversion.
    """
    import jax

    from ..math import crt as _crt
    from ..math import ntt as _ntt

    n = glwe.shape[-1]
    cc = _crt.CrtContext.new(tuple(primes), bits)
    sp = _ntt.make_stacked_plans(n, tuple(primes))

    residues = cc.residues_from_torus(jnp.asarray(glwe))
    return _ntt.forward_stacked(sp, jnp.stack(residues, axis=0))


def glwe_from_ntt(spectra, primes: tuple, bits: int):
    """Inverse of glwe_to_ntt: [P, ..., N] spectra -> torus [..., N]."""
    from ..math import crt as _crt
    from ..math import ntt as _ntt

    n = spectra.shape[-1]
    cc = _crt.CrtContext.new(tuple(primes), bits)
    sp = _ntt.make_stacked_plans(n, tuple(primes))
    residues = _ntt.inverse_stacked(sp, spectra)
    return cc.combine_to_torus([residues[i] for i in range(len(primes))])
