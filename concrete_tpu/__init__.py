"""concrete-tpu: a TPU-native TFHE (fully homomorphic encryption over the torus) framework.

Built from scratch in JAX/XLA/Pallas with the capabilities of the Zama `concrete`
ecosystem (reference: /root/reference, kc1212/concrete):

- LWE / GLWE / GGSW encryption over the discretized torus (u32 / u64)
- forkable AES-128-CTR CSPRNG with deterministic fork-tree semantics
- signed gadget decomposition, keyswitching, modulus switching, sample extraction
- programmable bootstrapping (blind rotation as a CMux chain of external products)
- an analytic noise-propagation estimator (`concrete_tpu.npe`)
- boolean-gate and encoder-based user APIs
- batch-first design: every server-side op is a jitted pure function over
  ciphertext batches, sharded across a TPU mesh with `shard_map`.

Design stance (vs the reference's Rust/FFTW):
- client-side ops (keygen / encrypt / decrypt) run host-side in numpy and are
  bit-reproducible under fixed seeds, mirroring the reference's CSPRNG fork
  discipline byte for byte;
- server-side ops (PBS, keyswitch, gate evaluation) run on TPU, with the
  negacyclic polynomial product implemented as an exact prime-modulus NTT
  (u32 Montgomery arithmetic + CRT), so homomorphic arithmetic is exact where
  the reference's f64 FFT is approximate.
"""

import jax as _jax

# u64 torus support (the reference's `concrete` crate fixes Torus = u64,
# concrete/src/lib.rs:22). Enable 64-bit types before any array is created.
_jax.config.update("jax_enable_x64", True)

from . import dispersion, params  # noqa: E402,F401

__version__ = "0.1.0"
