"""Client key: secret keys + encrypt/decrypt of booleans.

Reference: concrete-boolean/src/client_key/mod.rs. Encoding (lib.rs:53-59):
true = +1/8 (1 << 29 on the u32 torus), false = -1/8 (7 << 29); decryption is
a sign test around 0 (decrypt: phase < 2^31 means true).

Example:
    >>> from concrete_tpu import boolean
    >>> from concrete_tpu.params import BooleanParameters
    >>> from concrete_tpu.dispersion import StandardDev
    >>> tiny = BooleanParameters(4, 1, 16, StandardDev(0.0), StandardDev(0.0), 7, 2, 2, 2)
    >>> cks = boolean.ClientKey.new(tiny, secret_seed=1)
    >>> [bool(x) for x in cks.decrypt(cks.encrypt([True, False], mask_seed=2, noise_seed=3))]
    [True, False]
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..core.glwe import GlweSecretKey
from ..core.lwe import LweSecretKey
from ..csprng import EncryptionRandomGenerator, SecretRandomGenerator
from ..params import BooleanParameters

PLAINTEXT_LOG_SCALING_FACTOR = 3
PLAINTEXT_TRUE = np.uint32(1 << (32 - PLAINTEXT_LOG_SCALING_FACTOR))  # +1/8
PLAINTEXT_FALSE = np.uint32((7 << (32 - PLAINTEXT_LOG_SCALING_FACTOR)) & 0xFFFFFFFF)  # -1/8


@dataclasses.dataclass
class ClientKey:
    """LWE + GLWE binary secret keys (client_key/mod.rs:113)."""

    lwe_secret_key: LweSecretKey
    glwe_secret_key: GlweSecretKey
    parameters: BooleanParameters

    @classmethod
    def new(cls, parameters: BooleanParameters, *, secret_seed: int | None = None):
        gen = SecretRandomGenerator(secret_seed)
        lwe_sk = LweSecretKey.generate_binary(parameters.lwe_dimension, gen, bits=32)
        glwe_sk = GlweSecretKey.generate_binary(
            parameters.glwe_dimension, parameters.polynomial_size, gen, bits=32
        )
        return cls(lwe_secret_key=lwe_sk, glwe_secret_key=glwe_sk, parameters=parameters)

    def encrypt(
        self,
        messages,
        *,
        mask_seed: int | None = None,
        noise_seed: int | None = None,
    ) -> np.ndarray:
        """Encrypt a (batch of) boolean(s) -> [..., n+1] uint32
        (client_key/mod.rs:49-72)."""
        msgs = np.asarray(messages, dtype=bool)
        plain = np.where(msgs, PLAINTEXT_TRUE, PLAINTEXT_FALSE).astype(np.uint32)
        gen = EncryptionRandomGenerator(mask_seed, noise_seed)
        return self.lwe_secret_key.encrypt(
            plain, self.parameters.lwe_modular_std_dev.std_dev, gen
        )

    def decrypt(self, ciphertexts) -> np.ndarray:
        """Decrypt -> bool array; sign test (client_key/mod.rs:91-100)."""
        phase = self.lwe_secret_key.decrypt(np.asarray(ciphertexts, dtype=np.uint32))
        return phase < np.uint32(1 << 31)

    def save(self, path: str):
        """Serialize (serde analog; keys are Serialize in the reference,
        client_key/mod.rs derives)."""
        np.savez_compressed(
            path,
            lwe_key=self.lwe_secret_key.key,
            glwe_key=self.glwe_secret_key.key,
            params=np.array(
                [
                    self.parameters.lwe_dimension,
                    self.parameters.glwe_dimension,
                    self.parameters.polynomial_size,
                    self.parameters.pbs_base_log,
                    self.parameters.pbs_level,
                    self.parameters.ks_base_log,
                    self.parameters.ks_level,
                ]
            ),
            stds=np.array(
                [
                    self.parameters.lwe_modular_std_dev.std_dev,
                    self.parameters.glwe_modular_std_dev.std_dev,
                ]
            ),
        )

    @classmethod
    def load(cls, path: str) -> "ClientKey":
        from ..dispersion import StandardDev
        from ..core.lwe import LweSecretKey
        from ..core.glwe import GlweSecretKey

        d = np.load(path, allow_pickle=False)
        p = d["params"]
        params = BooleanParameters(
            lwe_dimension=int(p[0]),
            glwe_dimension=int(p[1]),
            polynomial_size=int(p[2]),
            lwe_modular_std_dev=StandardDev(float(d["stds"][0])),
            glwe_modular_std_dev=StandardDev(float(d["stds"][1])),
            pbs_base_log=int(p[3]),
            pbs_level=int(p[4]),
            ks_base_log=int(p[5]),
            ks_level=int(p[6]),
        )
        return cls(
            lwe_secret_key=LweSecretKey(d["lwe_key"], "binary", 32),
            glwe_secret_key=GlweSecretKey(d["glwe_key"], "binary", 32),
            parameters=params,
        )

    def decrypt_big_key(self, ciphertexts) -> np.ndarray:
        """Decrypt ciphertexts under the flattened GLWE ("big") key —
        useful for inspecting pre-keyswitch PBS outputs."""
        big = self.glwe_secret_key.into_lwe_key()
        return big.decrypt(np.asarray(ciphertexts, dtype=np.uint32)) < np.uint32(1 << 31)
