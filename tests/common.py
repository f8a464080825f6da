"""Shared test parameter sets (insecure, sized for fast CPU CI)."""

from concrete_tpu.dispersion import StandardDev
from concrete_tpu.params import BooleanParameters

# Insecure but algorithmically faithful parameters for functional tests.
TINY = BooleanParameters(
    lwe_dimension=16,
    glwe_dimension=1,
    polynomial_size=128,
    lwe_modular_std_dev=StandardDev(2.0 ** -20),
    glwe_modular_std_dev=StandardDev(2.0 ** -25),
    pbs_base_log=8,
    pbs_level=2,
    ks_base_log=4,
    ks_level=3,
)

# A k=2 variant exercising multi-mask GLWE paths (like DEFAULT_PARAMETERS).
TINY_K2 = BooleanParameters(
    lwe_dimension=12,
    glwe_dimension=2,
    polynomial_size=64,
    lwe_modular_std_dev=StandardDev(2.0 ** -20),
    glwe_modular_std_dev=StandardDev(2.0 ** -25),
    pbs_base_log=6,
    pbs_level=3,
    ks_base_log=2,
    ks_level=5,
)
